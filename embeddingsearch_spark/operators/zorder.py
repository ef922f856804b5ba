"""Z-order (Morton-curve) layout for multi-column data skipping.

Partitioning prunes on ONE hierarchy and bucketing co-locates ONE join
key; a corpus queried by several independent predicates (time AND user,
domain AND model) needs file-level min/max stats that are tight on ALL
of them at once. Interleaving the bits of per-column bucket ids into one
z-value and range-partitioning the write by it gives every file a small
hyper-rectangle of the key space — parquet footer stats then skip most
files for a selective filter on ANY of the z-ordered columns (the Delta
Lake / Databricks OPTIMIZE ZORDER approach, built here from plain
DataFrame ops).

Everything is JVM-side arithmetic: bucket ids via uniform width_bucket
binning (bounds are either caller-supplied or one tiny min/max
aggregate), interleave via shift/or folds — no UDFs, no shuffle beyond
the final repartitionByRange (which any layout rewrite needs anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # per-column resolution: 256 buckets


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Uniform bucket id in [0, 2^bits): width_bucket clamped to range.
    Uniform (not quantile) binning keeps the key reproducible by any
    engine from (lo, hi) alone; skew tolerance comes from the final
    range partitioner, which splits hot z-ranges across files."""
    n = F.lit(2**bits)
    wb = F.width_bucket(col.cast("double"), lo, hi, n)  # 1..n+1, null-safe
    return F.least(F.greatest(wb - 1, F.lit(0)), n - 1).cast("bigint")


def z_value(buckets: list[Column], bits: int = BITS) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * n_cols + j. Builds a (bits x n_cols)-term shift/or expression —
    whole-stage-codegen folds it into straight-line long arithmetic."""
    n_cols = len(buckets)
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(
                F.shiftleft(bit, i * n_cols + j).cast("bigint")
            )
    return out


def with_z_value(
    df: DataFrame,
    cols: list[str],
    bits: int = BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "z",
) -> DataFrame:
    """df + a ``z`` column over ``cols``. ``bounds`` maps col ->
    (min, max); omitted columns get bounds from ONE tiny min/max
    aggregate (2 x n_cols scalars to the driver)."""
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        aggs = []
        for c in missing:
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            ]
        row = df.agg(*aggs).first()
        for c in missing:
            bounds[c] = (row[f"_lo_{c}"], row[f"_hi_{c}"])
    bks = [
        _bucket(
            F.col(c), F.lit(float(bounds[c][0])), F.lit(float(bounds[c][1])), bits
        )
        for c in cols
    ]
    return df.withColumn(out_col, z_value(bks, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Rewrite ``df`` at ``path`` z-ordered by ``cols``: range-partition
    on the z-value (one global-sort shuffle — the cost of ANY clustering
    rewrite) so each of the ``n_files`` output files covers a compact
    z-range, i.e. a tight min/max box on every z-ordered column."""
    (
        with_z_value(df, cols, bits, bounds)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
