"""Content-defined chunking (the LBFS/Venti/restic technique, public):
chunk boundaries are placed where a rolling window's hash satisfies a
content predicate (h % divisor == 0), so an insertion near the start of
a document shifts only the chunk it lands in — every later chunk keeps
its content and therefore its hash, which is what makes CHUNK-level
dedup across document revisions work. Fixed-window chunking
(``functions.text.chunk_spans``) re-cuts everything after an insertion;
CDC is its shift-robust sibling.

Plan shape (what survives 100 TB): boundaries are INDEPENDENT
per-position predicates (no sequential state), so the whole chunking is
scan-side array expressions over the materialized token column —
zero shuffle, whole-stage codegen, document = unit of work. Min/max
chunk-size enforcement is deliberately NOT fused in (it is sequential
by nature); compose it downstream by splitting oversized chunks with
``chunk_spans_of`` or merging undersized neighbors — the boundary
predicate itself stays embarrassingly parallel.

Expected chunk length ≈ ``divisor`` tokens (geometric); the boundary
window ``g`` sets shift sensitivity (a change affects at most g - 1
boundary decisions around it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import tokens
from embeddingsearch_spark.operators.winnow import _gram_hash


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """One row per content-defined chunk: ``(id, chunk_id, start_tok,
    n_tokens, chunk_hash)`` — chunk_id is the 1-based ordinal, start_tok
    the 1-based token position, chunk_hash a 16-hex-char sha256 prefix
    of the space-joined chunk text.

    A position ``p`` (p >= g) ends a chunk when the 40-bit hash of
    tokens[p-g+1..p] ≡ 0 (mod divisor); the document end always closes
    the last chunk. Documents shorter than ``g`` tokens yield one chunk;
    empty documents yield none.
    """
    if g < 1 or divisor < 1:
        raise ValueError("g and divisor must be >= 1")
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    n = F.col("_n")
    # candidate boundary positions: hash the g-gram ENDING at p — the
    # lambda reads the materialized _toks attribute (per-element O(g)),
    # never an inlined expression (the HOF re-evaluation hazard)
    cand = F.when(n < g, F.array().cast("array<int>")).otherwise(
        F.filter(
            F.sequence(F.lit(g), F.greatest(n, F.lit(g))),
            lambda p: _gram_hash(
                F.concat_ws(" ", F.slice(F.col("_toks"), p - (g - 1), g))
            )
            % divisor
            == 0,
        )
    )
    # boundaries = content-defined cuts + the forced document end
    bounds = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.array_distinct(F.concat(cand, F.array(n.cast("int"))))
    )
    staged = staged.withColumn("_bounds", bounds)
    spans = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("_bounds"), F.lit(1))
        ),
        lambda j: F.struct(
            j.cast("int").alias("chunk_id"),
            F.when(j == 1, F.lit(1))
            .otherwise(F.element_at("_bounds", (j - 1).cast("int")) + 1)
            .cast("int")
            .alias("start_tok"),
            F.element_at("_bounds", j.cast("int"))
            .cast("int")
            .alias("end_tok"),
        ),
    )
    spans = F.when(
        F.size("_bounds") == 0,
        F.array().cast(
            "array<struct<chunk_id:int,start_tok:int,end_tok:int>>"
        ),
    ).otherwise(spans)
    out = staged.select(
        F.col(id_col), F.col("_toks"), F.explode(spans).alias("c")
    )
    chunk_text = F.concat_ws(
        " ",
        F.slice(
            F.col("_toks"),
            F.col("c.start_tok"),
            F.col("c.end_tok") - F.col("c.start_tok") + 1,
        ),
    )
    return out.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.start_tok").alias("start_tok"),
        (F.col("c.end_tok") - F.col("c.start_tok") + 1).alias("n_tokens"),
        F.substring(F.sha2(chunk_text, 256), 1, 16).alias("chunk_hash"),
    )


def cdc_dedup_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Chunk-level dedup profile over content-defined chunks:
    ``(id, n_chunks, n_shared_chunks, shared_fraction)`` where a chunk
    is *shared* when its hash appears in >= 2 distinct documents —
    catches revision-level duplication (same content, shifted) that
    whole-doc fingerprints miss, at chunk (not gram) shuffle volume:
    ~n/divisor keys per doc.

    Same single-aggregate reuse shape as ``winnow_profile``: every
    branch consumes the one (id, hash) aggregate.
    """
    ch = cdc_chunks(df, id_col, text_col, g=g, divisor=divisor)
    occ = ch.groupBy(id_col, "chunk_hash").agg(
        F.count(F.lit(1)).alias("occ")
    )
    shared = (
        occ.groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("chunk_hash")
    )
    dup = (
        occ.join(shared, "chunk_hash")
        .groupBy(id_col)
        .agg(F.sum("occ").alias("n_shared_chunks"))
    )
    totals = occ.groupBy(id_col).agg(F.sum("occ").alias("n_chunks"))
    return totals.join(dup, id_col, "left_outer").select(
        id_col,
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.coalesce("n_shared_chunks", F.lit(0))
        .cast("bigint")
        .alias("n_shared_chunks"),
        (F.coalesce("n_shared_chunks", F.lit(0)) / F.col("n_chunks")).alias(
            "shared_fraction"
        ),
    )
