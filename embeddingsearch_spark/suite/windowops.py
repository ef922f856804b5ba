"""Window-function queries (SURVEY.md §2.5): the rank/position idioms the
reference maintains imperatively (cached-ranking binary insert,
Searchdomain.cs:298-326; LRU position reindex, CacheHelper.cs:223-240)
re-expressed as window functions, plus gap-based sessionization.

Plan notes (100 TB): every query here is one exchange on its partition
key; sessionize reuses that exchange for its final aggregation (window
partitioning ≡ groupBy key prefix).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.constants import ROUND_DIGITS as RD
from embeddingsearch_spark.operators import asof, rangejoin, sessions

GAP_S = 6 * 3600


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessions (6 h) per user with per-session rollups."""
    ev = tables.load(spark, sf_dir, "events")
    return sessions.session_stats(ev, gap_seconds=GAP_S)


EVENTS_SESSIONIZE_SQL = f"""WITH tagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST({GAP_S} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         -- DuckDB sums integers into HUGEINT, which pandas can't hash
         -- consistently — cast every integer sum back to BIGINT
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM tagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), {RD}) AS total_value
FROM sess GROUP BY user_id, session_seq"""


def q_orders_running_total(spark, sf_dir):
    """Per-customer order sequence + running spend (cumulative window)."""
    orders = tables.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            RD,
        ).alias("cum_spend"),
    )


ORDERS_RUNNING_TOTAL_SQL = f"""
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS INT) AS order_seq,
       round(sum(o_totalprice) OVER (w ROWS UNBOUNDED PRECEDING), {RD})
         AS cum_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""


def q_events_lru_rank(spark, sf_dir):
    """Most-recent-3 events per user — the LRU position map
    (row_number() OVER (ORDER BY last_access DESC), CacheHelper.cs shape)."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.select(
            "user_id", "event_id", F.row_number().over(w).alias("lru_pos")
        )
        .filter(F.col("lru_pos") <= 3)
    )


EVENTS_LRU_RANK_SQL = """
SELECT user_id, event_id, CAST(lru_pos AS INT) AS lru_pos FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS lru_pos
  FROM events
) WHERE lru_pos <= 3"""


def q_asof_attribution(spark, sf_dir):
    """Purchase→click attribution: each purchase matched to the same
    user's most recent click at-or-before it (as-of join; single shuffle
    on user_id, no pair explosion — `operators/asof.py`)."""
    ev = tables.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return asof.asof_join(
        purchases, clicks, on="user_id", ts="ts", suffix="_click"
    )


ASOF_ATTRIBUTION_SQL = """
SELECT l.event_id, l.user_id, l.ts, l.value,
       r.ts AS ts_click, r.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""


def q_purchase_view_window(spark, sf_dir):
    """Views in the 24 h before each purchase by the same user — interval
    join via time-bucket binning (`operators/rangejoin.py`: equi-join on
    (user_id, bucket) + exact filter, never a nested loop)."""
    ev = tables.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    pairs = rangejoin.interval_join(
        purchases,
        views,
        on="user_id",
        left_start=F.col("ts") - F.expr("INTERVAL 24 HOURS"),
        left_end=F.col("ts"),
        bucket_seconds=86400,
    )
    return pairs.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_views_24h")
    )


PURCHASE_VIEW_WINDOW_SQL = """
SELECT p.event_id, p.user_id, count(*) AS n_views_24h
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 24 HOUR AND v.ts < p.ts
GROUP BY p.event_id, p.user_id"""


def q_events_zscore(spark, sf_dir):
    """Rolling anomaly detection: per event_type, each value's z-score
    against the trailing 1-hour RANGE frame (frame bounds in epoch MICROS
    so both engines cut the window at identical instants — casting ts to
    seconds would misalign events with fractional-second timestamps).

    Scale note: event_type is low-cardinality, so this window partitioning
    caps parallelism at the type count — the same hot-key shape measured on
    the as-of join (BASELINE.md: chunked variant wins 2.3× at 20M rows).
    At 100 TB apply the same time-chunk + carry-in decomposition
    (operators/asof.asof_join_chunked pattern) with per-chunk
    (count, sum, sum-of-squares) partials."""
    ev = tables.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    mean = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = F.when(sd > 0, (F.col("value") - mean) / sd).otherwise(F.lit(0.0))
    return ev.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.round(mean, RD).alias("trailing_mean"),
        F.round(z, RD).alias("zscore"),
        (F.abs(z) > 2).alias("is_anomaly"),
    )


EVENTS_ZSCORE_SQL = f"""SELECT event_id, event_type,
       CAST(count(*) OVER w AS BIGINT) AS n_window,
       round(avg(value) OVER w, {RD}) AS trailing_mean,
       round(CASE WHEN stddev_samp(value) OVER w > 0
                  THEN (value - avg(value) OVER w) / (stddev_samp(value) OVER w)
                  ELSE 0.0 END, {RD}) AS zscore,
       CASE WHEN stddev_samp(value) OVER w > 0
            THEN abs((value - avg(value) OVER w)
                     / (stddev_samp(value) OVER w)) > 2
            ELSE FALSE END AS is_anomaly
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""


QUERIES = {
    "events_sessionize": (q_events_sessionize, EVENTS_SESSIONIZE_SQL),
    "events_zscore": (q_events_zscore, EVENTS_ZSCORE_SQL),
    "orders_running_total": (q_orders_running_total, ORDERS_RUNNING_TOTAL_SQL),
    "events_lru_rank": (q_events_lru_rank, EVENTS_LRU_RANK_SQL),
    "asof_attribution": (q_asof_attribution, ASOF_ATTRIBUTION_SQL),
    "purchase_view_window": (q_purchase_view_window, PURCHASE_VIEW_WINDOW_SQL),
}
