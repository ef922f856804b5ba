"""Exact quantiles without a single-partition sort.

Corpus profiling (p10/p50/p90 of token counts, doc lengths, quality
ratios) needs EXACT quantiles when the numbers gate downstream policy —
`approx_percentile`'s error bound is engine-specific and not
oracle-reproducible. The exact path reuses the two-pass range-partition
rank (`ids.assign_global_ids` — no global-sort bottleneck): rank every
value once, then read the ≤len(qs) rows sitting at the target ranks.

Declared semantics: nearest-rank-low — the quantile q of n values is
the value at 0-based index floor(q·(n−1)) of the ascending sorted
multiset (deterministic; ties inside the sort are broken by the id
column but the value at a given index is tie-invariant). NULL values
are excluded per metric, as every SQL quantile does. The index is
computed as floor(q·(n−1) + 1e-9): IEEE doubles render e.g. 0.7·10 as
6.999999999999999, and a bare floor would land one rank below the
declared index; the epsilon restores exact-boundary products (the
oracle applies the identical guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_cols: list[str],
    qs: list[float],
    id_col: str,
) -> DataFrame:
    """``(metric, q, value)`` — one row per (value column, quantile).
    One range-partitioned rank pass per metric; per metric only
    ``len(qs)`` rows come back to the driver."""
    from embeddingsearch_spark.operators.ids import assign_global_ids

    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    out_rows = []
    for c in value_cols:
        vals = df.select(
            F.col(c).alias("_v"), F.col(id_col).alias("_id")
        ).filter(F.col("_v").isNotNull())
        ranked, total = assign_global_ids(
            vals, ["_v", "_id"], out_col="_rk", return_total=True
        )
        if total == 0:
            out_rows.extend((c, float(q), None) for q in qs)
            continue
        targets = {int(q * (total - 1) + 1e-9) for q in qs}
        at = {
            r["_rk"]: r["_v"]
            for r in ranked.filter(
                F.col("_rk").isin(list(targets))
            ).collect()
        }
        out_rows.extend(
            (c, float(q), float(at[int(q * (total - 1) + 1e-9)])) for q in qs
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        out_rows, "metric string, q double, value double"
    )
