"""TF-IDF weighting, per-document top terms, and vocabulary statistics.

Beyond-reference corpus analytics (the reference scores only embeddings —
Searchdomain.cs's cascade has no lexical weighting): keyword extraction and
df-based quality signals are standard steps in a training-data pipeline
(stopword discovery, boilerplate term mining, topic balance checks).

Plan shape at 100 TB:
  explode(tokens) → groupBy(doc, token)        [shuffle 1, keyed (doc, token)]
  tf → groupBy(token)                          [shuffle 2 — output is
                                                vocabulary-sized, ≪ corpus]
  tf ⋈ df on token                             [AQE broadcasts the df side
                                                when the vocabulary is small;
                                                otherwise a co-partitioned
                                                hash join on token]
  row_number() over doc window                 [shuffle 3, keyed doc]

The corpus size N enters as a broadcast single-row aggregate (crossJoin of
a 1-row DataFrame) — no driver-side count(), no second action.

Two deliberate non-choices: df is a groupBy + join, NOT a count() window
partitioned by token — a token window would put every row of a hot token
("the", present in every document) into a single partition, while the
groupBy form partial-aggregates hot tokens map-side and the join side is
vocabulary-sized (AQE broadcasts it when it fits). And tf, which feeds
both the df aggregate and the scoring join, is recomputed per consumer
rather than persisted — at corpus scale, re-running a scan-stage explode
is cheaper and safer than materializing a corpus-sized intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from embeddingsearch_spark.functions import text as T


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("token"),
    )


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token, tf) — lowercased whitespace tokens per document."""
    return _doc_tokens(docs, id_col, text_col).groupBy("doc_id", "token").agg(
        F.count("*").alias("tf")
    )


def vocabulary(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, df, cf): document frequency + corpus frequency per token.

    df counts rows of the per-doc tf table (one row per containing doc),
    so no DISTINCT pass over the raw token stream is needed.
    """
    tf = term_frequencies(docs, id_col, text_col)
    return tf.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    score = tf * ln((N + 1) / (df + 1)); ties broken by token ascending so
    the ranking is total and engine-reproducible.
    Returns (doc_id, term, rank, tf, df, tfidf).
    """
    tf = term_frequencies(docs, id_col, text_col)
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "rank",
            "tf",
            "df",
            F.col("score").alias("tfidf"),
        )
    )


def oov_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus's own top
    ``vocab_size`` tokens by corpus frequency (cf desc, token asc
    tiebreak) — the vocabulary-coverage quality gate training pipelines
    use to drop mis-encoded / wrong-domain documents before tokenizer
    or model training sees them.

    Plan shape (what survives 100 TB): the vocabulary is a model
    artifact — ``orderBy().limit(V)`` compiles to TakeOrdered (per-
    partition top-V, driver merge; never a full sort) and the resulting
    V-row table is hash-broadcast to the token stream, so the only
    corpus-sized shuffle is the per-doc aggregation of (doc_id, two
    counts) — map-side-combined to one row per doc per partition.

    Docs with zero tokens produce no row (no spurious 0/0 rate).
    Returns (doc_id, n_tokens, n_oov, oov_rate).
    """
    toks = _doc_tokens(docs, id_col, text_col)
    vocab = (
        vocabulary(docs, id_col, text_col)
        .orderBy(F.col("cf").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            (F.col("n_oov") / F.col("n_tokens")).alias("oov_rate"),
        )
    )
