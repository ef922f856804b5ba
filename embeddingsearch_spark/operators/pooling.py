"""Embedding pooling: collapse chunk-level embeddings to document-level
vectors (mean / weighted mean). The standard bridge between a chunked
embedding pass (`functions/text.chunk_spans` → embedder) and doc-level
similarity search or near-dup.

Plan shape: ONE hash-partitioned groupBy on the document key. Each
group's state is its own chunk vectors (bounded by chunks-per-doc ×
dim, never corpus-sized), and the elementwise sum runs as a Catalyst
`aggregate` HOF over the collected list — no per-(doc, dimension) row
explosion (which would shuffle rows × dim) and no Python in the hot
path.

The reference embeds whole datapoints only (`AIProvider.cs:39-133` —
one vector per text) — pooling is part of the training-data-pipeline
layer (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _elementwise_mean(vlist: Column) -> Column:
    """Mean over a non-empty array of equal-length double arrays."""
    zero = F.transform(F.element_at(vlist, 1), lambda _: F.lit(0.0))
    total = F.aggregate(
        vlist, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)
    )
    n = F.size(vlist).cast("double")
    return F.transform(total, lambda x: x / n)


def mean_pool(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Pool ``vec_col`` (array<float|double>) per ``key_col`` →
    ``(key, n_chunks, pooled)``. With ``weight_col`` (e.g. chunk token
    counts) the mean is weighted: Σ wᵢvᵢ / Σ wᵢ."""
    v = F.col(vec_col).cast("array<double>")
    if weight_col is None:
        grouped = df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.collect_list(v).alias("_vs"),
        )
        pooled = _elementwise_mean(F.col("_vs"))
    else:
        w = F.col(weight_col).cast("double")
        grouped = df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.collect_list(F.transform(v, lambda x: x * w)).alias("_vs"),
            F.sum(w).alias("_wsum"),
        )
        total = F.aggregate(
            F.col("_vs"),
            F.transform(F.element_at("_vs", 1), lambda _: F.lit(0.0)),
            lambda acc, vv: F.zip_with(acc, vv, lambda a, b: a + b),
        )
        pooled = F.transform(total, lambda x: x / F.col("_wsum"))
    return grouped.select(key_col, "n_chunks", pooled.alias("pooled"))
