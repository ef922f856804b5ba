"""Grouped data-profiling with exact and sketched variants. The exact
variant is the correctness oracle; the sketched variant is the 100 TB
path — HyperLogLog++ (`approx_count_distinct`) and the KLL-style quantile
sketch (`percentile_approx`) are single-pass, fixed-memory, and
map-side-mergeable, so the shuffle carries one small sketch per
(group, partition) instead of the full value set. Exact distinct-count
at 100 TB shuffles every (group, user) pair; the sketch shuffles kilobytes.

Beyond-reference: the reference computes no dataset statistics (its only
aggregate surface is the scoring cascade, SURVEY.md §2.4); profiling is
table stakes for a training-data pipeline (corpus composition reports,
outlier thresholds, per-source quality cuts).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


def group_profile(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    distinct_col: str,
    exact: bool = True,
    rsd: float = 0.02,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group profile: row count, distinct count of ``distinct_col``,
    median / p95 / sum of ``value_col``.

    ``exact=True`` uses countDistinct + exact interpolated percentiles
    (ANSI-SQL-expressible, the oracle twin). ``exact=False`` swaps in
    HLL++ (relative sd ``rsd``) and the quantile sketch (``accuracy``) —
    same schema, bounded error, fixed memory per group.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value_col)
    if exact:
        n_distinct = F.countDistinct(F.col(distinct_col))
        med = F.median(v)
        p95 = F.percentile(v, F.lit(0.95))
    else:
        n_distinct = F.approx_count_distinct(F.col(distinct_col), rsd=rsd)
        med = F.percentile_approx(v, F.lit(0.5), F.lit(accuracy))
        p95 = F.percentile_approx(v, F.lit(0.95), F.lit(accuracy))
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        n_distinct.alias("n_distinct"),
        F.round(med, ROUND_DIGITS).alias("median_value"),
        F.round(p95, ROUND_DIGITS).alias("p95_value"),
        F.round(F.sum(v), ROUND_DIGITS).alias("sum_value"),
    )


def _cms_bucket(col, seed: int, width: int, hash_fn: str):
    """Bucket for one CMS row. hash_fn="xxhash64" (default, fast);
    "sha256" derives the bucket from a 60-bit sha2 window so independent
    engines reproduce counters bit-for-bit (the MinHash precedent —
    the DuckDB oracle does ('0x' || substr(sha256(...), 1, 15))::BIGINT)."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(width))
    if hash_fn != "sha256":
        raise ValueError("hash_fn must be 'xxhash64' or 'sha256'")
    h = F.sha2(F.concat(F.lit(f"{seed}:"), col.cast("string")), 256)
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"), F.lit(width)
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1 << 16,
    weight_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch over an item column: ``(seed, bucket, c)`` with
    depth x width counters — the fixed-memory frequency structure for
    domains too large to count exactly (token vocabularies, URLs, user
    ids at 100 TB). One scan-side explode into `depth` rows per item and
    ONE map-side-combinable groupBy whose result is at most
    depth * width rows (~1 MB at 4 x 65536) regardless of corpus size —
    broadcastable, mergeable across corpora by simple addition, and
    deterministic (no RNG; see _cms_bucket for the hash choice)."""
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cms_bucket(
                            F.col(item_col), s, width, hash_fn
                        ).alias("bucket"),
                        (
                            F.col(weight_col).cast("long")
                            if weight_col
                            else F.lit(1).cast("long")
                        ).alias("wt"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("e")
    ).select("e.seed", "e.bucket", "e.wt")
    return rows.groupBy("seed", "bucket").agg(F.sum("wt").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1 << 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point estimates for candidate items: est = min over seeds of the
    counter at (seed, hash_seed(item)) — an upper bound on the true
    count (CMS never underestimates; collisions only inflate). The
    sketch joins BROADCAST (it is bounded by depth x width), so the
    candidate side never shuffles."""
    probes = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cms_bucket(
                            F.col(item_col), s, width, hash_fn
                        ).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p"),
    ).select(item_col, "p.seed", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count"))
    )
