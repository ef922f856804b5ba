"""DSIR importance resampling (operators/dsir.py): weights favor docs
distributionally like the target, selection is deterministic, and the
featurizer survives degenerate docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import dsir


def _corpus(spark):
    sports = "the match the goal the team played a great game of football"
    code = "def main return value import module class method python code"
    rows = [(i, sports + f" s{i}") for i in range(10)]
    rows += [(100 + i, code + f" c{i}") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weights_favor_target_distribution(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 10)  # sports is the target
    lw = {
        r["doc_id"]: r["log_w"]
        for r in dsir.importance_log_weights(raw, target).collect()
    }
    sports_w = [lw[i] for i in range(10)]
    code_w = [lw[100 + i] for i in range(10)]
    assert min(sports_w) > max(code_w)


def test_select_is_deterministic_and_ranked(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 10)
    a = dsir.dsir_select(raw, target, n=8).collect()
    b = dsir.dsir_select(raw, target, n=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == list(
        range(1, 9)
    )
    # with 10 on-target docs and heavy weight separation, the top picks
    # are sports docs
    top = {r["doc_id"] for r in a}
    assert sum(1 for d in top if d < 10) >= 6


def test_seed_changes_gumbel_selection_input(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 10)
    a = dsir.dsir_select(raw, target, n=8, seed=1).collect()
    b = dsir.dsir_select(raw, target, n=8, seed=2).collect()
    # same weight model, different noise — ranks must not be identical
    assert [tuple(r) for r in a] != [tuple(r) for r in b]


def test_degenerate_docs_survive_featurizer(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "   "), (4, "two tokens")],
        "doc_id long, text string",
    )
    feats = dsir.hashed_ngram_buckets(df).collect()
    by_doc: dict[int, int] = {}
    for r in feats:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["c"]
    assert by_doc.get(1) == 1  # one unigram, no bogus bigram
    assert 2 not in by_doc and 3 not in by_doc  # empty docs: no grams
    assert by_doc.get(4) == 3  # two unigrams + one bigram
