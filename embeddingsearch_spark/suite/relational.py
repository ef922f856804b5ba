"""Relational queries on the TPC-H-ish testdata: the join/aggregation/top-k
primitives the scoring pipeline decomposes into (SURVEY.md §2.3 J1-J3,
§2.4 A14, §2.6 O1-O2), exercised at bench scale.

Plan notes (100 TB): region/nation (and customer at sane scales) broadcast;
the lineitem-side aggregations are partial+final hash aggs; top-k compiles
to TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import sketches
from embeddingsearch_spark.constants import ROUND_DIGITS as RD


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: lineitem scan-side filter + grouped aggregates."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), RD).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), RD).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), RD
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                RD,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), RD).alias("avg_qty"),
            F.round(F.avg("l_discount"), RD).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), {RD}) AS sum_qty,
       round(sum(l_extendedprice), {RD}) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), {RD}) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {RD}) AS sum_charge,
       round(avg(l_quantity), {RD}) AS avg_qty,
       round(avg(l_discount), {RD}) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + grouped revenue + deterministic top-10
    (orderBy+limit → TakeOrderedAndProject distributed top-k)."""
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), RD
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "revenue",
        )
    )


TOP_REVENUE_ORDERS_SQL = f"""
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), {RD}) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10"""


def q_nation_volume(spark, sf_dir):
    """5-way star join (broadcast dims) + per-nation revenue."""
    region = tables.load(spark, sf_dir, "region")
    nation = tables.load(spark, sf_dir, "nation")
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), RD
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


NATION_VOLUME_SQL = f"""
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), {RD}) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name"""


def q_events_daily(spark, sf_dir):
    """Event-stream rollup: per (event_type, day) counts + value sums —
    the batch shape of the streaming aggregations (SURVEY.md §2.9)."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), RD).alias("total_value"),
        )
    )


EVENTS_DAILY_SQL = f"""
SELECT event_type, CAST(ts AS DATE) AS day,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), {RD}) AS total_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)"""


def q_idle_customers(spark, sf_dir):
    """Anti-join: customers with no orders since 1998, with their nation —
    the left_anti + broadcast-dim shape (J6's relational cousin); the
    order-date filter pushes to the orders scan."""
    cust = tables.load(spark, sf_dir, "customer")
    recent = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-01-01"
    )
    nation = tables.load(spark, sf_dir, "nation")
    return (
        cust.join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
    )


IDLE_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1998-01-01')"""


def q_events_rollup(spark, sf_dir):
    """ROLLUP (event_type, day): per-day, per-type subtotals and the
    grand total in one pass — partial aggregation replicates rows per
    grouping set map-side, one shuffle total.

    Subtotal rows carry NULL grouping keys, which the comparison harness
    materializes differently per engine (None vs NaT) — render the keys as
    strings with an explicit 'ALL' sentinel on both sides."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.to_date("ts"))
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), RD).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
            "n_events",
            "total_value",
        )
    )


EVENTS_ROLLUP_SQL = f"""
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
       count(*) AS n_events,
       round(sum(value), {RD}) AS total_value
FROM events
GROUP BY ROLLUP (event_type, CAST(ts AS DATE))"""


def q_events_cube(spark, sf_dir):
    """CUBE (event_type, weekday): all four grouping sets in one pass —
    the remaining grouping-set shape next to rollup (same single-shuffle
    plan, rows replicated per set map-side)."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.withColumn("weekday", F.dayofweek("ts"))
        .cube("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), RD).alias("avg_value"),
        )
    )


EVENTS_CUBE_SQL = f"""
SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS weekday,
       count(*) AS n_events,
       round(avg(value), {RD}) AS avg_value
FROM events
GROUP BY CUBE (event_type, CAST(dayofweek(ts) + 1 AS INT))"""


def q_converted_users(spark, sf_dir):
    """Set operations (§2.7): users who clicked AND purchased but never
    errored — INTERSECT/EXCEPT compile to aggregate+join (distinct-ized
    semi/anti joins), no extra machinery."""
    day = "2024-01-05"
    ev = tables.load(spark, sf_dir, "events").filter(F.to_date("ts") == day)

    def users(t):
        return ev.filter(F.col("event_type") == t).select("user_id").distinct()

    return users("click").intersect(users("purchase")).subtract(users("error"))


CONVERTED_USERS_SQL = """
(SELECT DISTINCT user_id FROM events
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-05'
 INTERSECT
 SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-05')
EXCEPT
SELECT DISTINCT user_id FROM events
 WHERE event_type = 'error' AND CAST(ts AS DATE) = DATE '2024-01-05'"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """Day × event-type count matrix — pivot with the value set declared
    up front (without the list Spark needs an extra distinct pass to
    discover columns). Plans as two exchanges, but the second carries the
    already-aggregated (day, type) counts — negligible at any scale."""
    ev = tables.load(spark, sf_dir, "events")
    p = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return p.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


EVENTS_PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY CAST(ts AS DATE)"""


def q_events_type_profile(spark, sf_dir):
    """Per-type corpus profile (count, distinct users, median/p95/sum) —
    exact twin of the sketch path (`operators/sketches.group_profile`);
    the approx variant is bound-tested in tests/test_sketches.py."""
    ev = tables.load(spark, sf_dir, "events")
    return sketches.group_profile(
        ev, "event_type", value_col="value", distinct_col="user_id"
    )


EVENTS_TYPE_PROFILE_SQL = f"""
SELECT event_type, count(*) AS n_rows,
       count(DISTINCT user_id) AS n_distinct,
       round(median(value), {RD}) AS median_value,
       round(quantile_cont(value, 0.95), {RD}) AS p95_value,
       round(sum(value), {RD}) AS sum_value
FROM events GROUP BY event_type"""


QUERIES = {
    "pricing_summary": (q_pricing_summary, PRICING_SUMMARY_SQL),
    "top_revenue_orders": (q_top_revenue_orders, TOP_REVENUE_ORDERS_SQL),
    "nation_volume": (q_nation_volume, NATION_VOLUME_SQL),
    "events_daily": (q_events_daily, EVENTS_DAILY_SQL),
    "events_rollup": (q_events_rollup, EVENTS_ROLLUP_SQL),
    "idle_customers": (q_idle_customers, IDLE_CUSTOMERS_SQL),
    "events_type_profile": (q_events_type_profile, EVENTS_TYPE_PROFILE_SQL),
    "events_pivot": (q_events_pivot, EVENTS_PIVOT_SQL),
    "converted_users": (q_converted_users, CONVERTED_USERS_SQL),
    "events_cube": (q_events_cube, EVENTS_CUBE_SQL),
}
