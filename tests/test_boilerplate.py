"""Boilerplate line removal + unigram LM scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import boilerplate, lmscore


def _docs(spark):
    footer = "copyright footer"
    rows = [
        (1, f"unique one\n{footer}"),
        (2, f"unique two\n{footer}"),
        (3, f"unique three\n{footer}"),
        (4, footer),                      # only boilerplate → empty text
        (5, "unique five\n\nunique six"),  # blank line survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_boilerplate_lines(spark):
    out = {
        r["doc_id"]: r
        for r in boilerplate.remove_boilerplate_lines(
            _docs(spark), "doc_id", "text", max_df=2
        ).collect()
    }
    assert out[1]["text"] == "unique one"
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 2
    assert out[4]["text"] == "" and out[4]["n_removed"] == 1
    # blank separator line is exempt and order is preserved
    assert out[5]["text"] == "unique five\n\nunique six"
    assert out[5]["n_removed"] == 0


def test_line_document_frequency_counts_docs_not_instances(spark):
    df = spark.createDataFrame(
        [(1, "a\na"), (2, "a")], "doc_id long, text string"
    )
    freq = {
        r["line_fp"]: r["df"]
        for r in boilerplate.line_document_frequency(
            df, "doc_id", "text"
        ).collect()
    }
    assert set(freq.values()) == {2}  # 'a' appears in 2 docs (not 3 rows)


def test_unigram_scores_match_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    # counts: a=3, b=1, c=1; N=5; vocab keeps top-2 = a (3), b (1, ties → 'b' < 'c')
    out = {
        r["doc_id"]: r
        for r in lmscore.unigram_scores(
            df, "doc_id", "text", vocab_size=2, smoothing=1.0
        ).collect()
    }
    denom = 5 + 1.0 * (2 + 1)
    pa, pb, poov = 4 / denom, 2 / denom, 1 / denom
    exp_doc1 = -(2 * math.log(pa) + math.log(pb)) / 3
    assert abs(out[1]["avg_nll"] - exp_doc1) < 1e-12
    assert out[1]["n_oov"] == 0
    assert out[2]["n_oov"] == 1  # 'c' fell below the vocab cut
    exp_doc2 = -(math.log(pa) + math.log(poov)) / 2
    assert abs(out[2]["avg_nll"] - exp_doc2) < 1e-12
    assert abs(out[2]["perplexity"] - math.exp(exp_doc2)) < 1e-9


def test_lm_score_plan_broadcasts_vocab_two_shuffles(spark):
    """Vocab joins by broadcast (never shuffle the exploded corpus for
    it); total exchanges = vocab count + per-doc aggregate."""
    from embeddingsearch_spark.plans import inspect as pi

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 9).cast("string"),
                 F.lit(" common words here")).alias("text"),
    )
    out = lmscore.unigram_scores(df, "doc_id", "text", vocab_size=8)
    pi.assert_broadcast_join(out)
    assert pi.count_shuffles(out) <= 2


def test_unigram_reference_corpus(spark):
    ref = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    target = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    out = lmscore.unigram_scores(
        target, "doc_id", "text", vocab_size=10, smoothing=1.0, reference=ref
    ).collect()[0]
    assert out["n_tokens"] == 2 and out["n_oov"] == 1
