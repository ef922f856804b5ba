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
