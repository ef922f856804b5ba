"""SQ8 scalar quantization — the memory-bound compression rung between
raw vectors and PQ.

Per-dimension 8-bit linear quantization: codes = floor((x - min_d) /
span_d * 255 + 0.5) per dimension, trained per collection (each
tenant's value range is its own). Serving is ASYMMETRIC: the query
stays full-precision, candidates are dequantized on the fly
(min_d + c·span_d/255) and scored with the engine's exact cosine —
the standard SQ trade (Faiss's ScalarQuantizer, Lucene/HNSW int8):
~4-8× less candidate I/O at near-exact recall (8 bits per dimension
keeps cosine ranks almost everywhere; BASELINE.md round-9 records the
measured recall@10 on the test corpus), with none of PQ's codebook
training or its recall cliff. At 100 TB this is the tier for corpora
that must stay scan-able: the codes column feeds the same brute-force
/ IVF-candidate paths as raw vectors at a quarter of the bytes.

Everything is JVM-side (`posexplode` for training, nested `zip_with`
for encode/dequantize, the shared `dot`/`norm2` for scoring) — no UDF.
Codes are `array<int>` in [0, 255]; parquet dictionary/bit-packing
stores them at ~1 byte per dimension (cast to tinyint with a -128
shift if a strict 1-byte logical type is wanted).

All arithmetic is pinned to double in a fixed association order —
((x-min)/span)·255+0.5 to encode, min+(c·span)/255 to dequantize — so
an independent re-derivation (the DuckDB gate oracle) reproduces the
codes bit-for-bit.

No reference parity: the reference engine has no compression tier;
beyond-reference like the PQ/IVF/graph families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from embeddingsearch_spark.constants import ROUND_DIGITS
from embeddingsearch_spark.functions.vectors import dot, norm2


def _dbl(col):
    return F.col(col).cast("array<double>")


def sq8_stats(
    emb: DataFrame,
    partition_col: str | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-dimension quantization ranges — one distributed
    aggregate (posexplode → per-(collection, dim) min/max → arrays
    re-assembled in dim order), no driver state. With
    ``partition_col`` each collection gets its own range rows (a
    tenant's outlier never squashes another tenant's resolution);
    without, one global row. Returns (``partition_col``?, mins
    array<double>, spans array<double>)."""
    group = [partition_col] if partition_col else []
    ex = emb.select(
        *group, F.posexplode(_dbl(vec_col)).alias("_pos", "_val")
    )
    per_dim = ex.groupBy(*group, "_pos").agg(
        F.min("_val").alias("_mn"), F.max("_val").alias("_mx")
    )
    if not group:
        per_dim = per_dim.withColumn("_g", F.lit(1))
        group = ["_g"]
    out = (
        per_dim.groupBy(*group)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_mn"))),
                lambda s: s["_mn"],
            ).alias("mins"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_mx"))),
                lambda s: s["_mx"],
            ).alias("_maxs"),
        )
        .withColumn(
            "spans", F.zip_with("_maxs", "mins", lambda a, b: a - b)
        )
        .drop("_maxs")
    )
    return out.drop("_g") if group == ["_g"] else out


def _join_stats(df: DataFrame, stats: DataFrame, partition_col):
    if partition_col:
        return df.join(F.broadcast(stats), partition_col)
    return df.crossJoin(F.broadcast(stats))  # bounded: 1 stats row


def sq8_encode(
    emb: DataFrame,
    stats: DataFrame,
    partition_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Quantize each vector against its collection's ranges:
    c_d = clamp(floor((x_d - min_d)/span_d · 255 + 0.5), 0, 255); a
    zero-span (constant) dimension codes to 0 and dequantizes back to
    its constant. Pure nested `zip_with` — one JVM-side projection,
    no shuffle. Returns (id, ``partition_col``?, codes)."""
    keep = [id_col] + ([partition_col] if partition_col else [])
    j = _join_stats(emb, stats, partition_col)
    diffs = F.zip_with(_dbl(vec_col), F.col("mins"), lambda x, mn: x - mn)
    codes = F.zip_with(
        diffs,
        F.col("spans"),
        lambda d, s: F.when(s == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(255),
                F.greatest(F.lit(0), F.floor(d / s * 255 + 0.5)),
            )
        )
        .cast("int"),
    )
    return j.select(*keep, codes.alias(codes_col))


def sq8_dequantize(
    codes: DataFrame,
    stats: DataFrame,
    partition_col: str | None = None,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reconstruct x̂_d = min_d + c_d·span_d/255 — the serve-side
    inverse, exposed for round-trip tests and for feeding the codes
    into any raw-vector operator. Max per-dim error is span_d/510 by
    construction (tested)."""
    keep = [id_col] + ([partition_col] if partition_col else [])
    j = _join_stats(codes, stats, partition_col)
    scaled = F.zip_with(
        F.col(codes_col).cast("array<double>"),
        F.col("spans"),
        lambda c, s: c * s / 255,
    )
    deq = F.zip_with(scaled, F.col("mins"), lambda t, mn: t + mn)
    return j.select(*keep, deq.alias(vec_col))


def sq8_topk(
    codes: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    route: DataFrame | None = None,
    k: int = 10,
    partition_col: str | None = None,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric top-k over the COMPRESSED column: full-precision
    queries against on-the-fly dequantized candidates, the engine's
    remapped cosine, deterministic id tie-break — the brute-force
    serve shape (`brute_force_topk`) at a quarter of the candidate
    bytes. With ``partition_col`` + ``route`` each query scans ONLY
    its own collection's codes (the federated contract). Columns
    (query_id, id, cosine, rank)."""
    from embeddingsearch_spark.operators.ann import _cosine_from_parts

    deq = sq8_dequantize(
        codes, stats, partition_col, id_col, codes_col, vec_col
    )
    qv = queries.select(
        query_id_col,
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    ).withColumn("_qn", norm2(F.col("_qvec")))
    if partition_col and route is not None:
        qv = qv.join(
            F.broadcast(route.select(query_id_col, partition_col)),
            query_id_col,
        )
        cand = deq.join(F.broadcast(qv), partition_col)
    else:
        cand = deq.crossJoin(F.broadcast(qv))  # documented brute path
    sim = _cosine_from_parts(
        dot(F.col(vec_col), F.col("_qvec")),
        norm2(F.col(vec_col)),
        F.col("_qn"),
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(sim, ROUND_DIGITS).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= int(k)
    )
