"""Train/eval decontamination: flag training documents that share word
n-grams with a held-out benchmark/eval set, and drop them.

This is the standard contamination check for LLM training corpora
(n-gram collision against eval prompts). The reference engine has no
equivalent — it is part of the training-data-pipeline surface this repo
adds beyond reference parity (BASELINE.json north star).

Scale shape (100 TB corpus, MB-scale benchmark):
  - benchmark n-grams are tiny by construction (eval sets are thousands
    of rows) → broadcast; the corpus side never shuffles for the join —
    gram explode + broadcast-hash join stay in the scan stage;
  - the only shuffle is the (doc, bench) pair aggregation, map-side
    partial-agg'd, bounded by the number of COLLIDING grams, not corpus
    size;
  - ``hash_grams=True`` replaces gram strings with xxhash64 before the
    join, shrinking both the broadcast and the pair shuffle to 8 bytes a
    key (the engine-side default at scale; the oracled suite query keeps
    raw strings so DuckDB reproduces it verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import tokens, word_shingles_of


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
    hash_grams: bool = False,
) -> DataFrame:
    """(doc, benchmark-doc) pairs sharing at least one word ``n``-gram,
    with the count of distinct shared grams. ``word_shingles`` emits
    distinct grams per document, so a plain count(*) after the join is
    already a distinct-gram count — no countDistinct shuffle."""
    # tokens pre-projected so the gram transform doesn't re-tokenize per
    # index (word_shingles_of) — 2.4x on the explode at 100k docs
    c = corpus.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(word_shingles_of(F.col("_toks"), n)).alias("gram"),
    )
    b = benchmark.select(
        F.col(bench_id_col), tokens(F.col(bench_text_col)).alias("_toks")
    ).select(
        F.col(bench_id_col),
        F.explode(word_shingles_of(F.col("_toks"), n)).alias("gram"),
    )
    if hash_grams:
        c = c.withColumn("gram", F.xxhash64("gram"))
        b = b.withColumn("gram", F.xxhash64("gram"))
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        c.join(b, "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Corpus minus documents overlapping the benchmark by at least
    ``min_shared`` n-grams: one broadcast gram join + one anti-join on the
    doc id — the corpus body columns are never shuffled."""
    hits = (
        ngram_overlap(
            corpus,
            benchmark,
            id_col=id_col,
            text_col=text_col,
            bench_id_col=bench_id_col,
            bench_text_col=bench_text_col,
            n=n,
            hash_grams=hash_grams,
        )
        .groupBy(id_col)
        .agg(F.sum("n_shared").alias("_tot"))
        .filter(F.col("_tot") >= min_shared)
        .select(id_col)
    )
    return corpus.join(F.broadcast(hits), id_col, "left_anti")
