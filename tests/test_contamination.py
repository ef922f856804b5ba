"""Decontamination operator (operators/contamination.py): n-gram overlap
detection and the anti-join drop path."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import contamination as ct

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "totally unrelated words with no benchmark overlap at all here"),
]
BENCH = [
    (100, "gamma delta epsilon zeta eta theta"),  # inside doc 1
    (200, "seven eight nine ten"),                # tail of doc 2, < n grams at n=5
]


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    return docs, bench


def test_overlap_counts(spark):
    docs, bench = _frames(spark)
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in ct.ngram_overlap(docs, bench, n=5).collect()
    }
    # bench 100 has 6 tokens → two distinct 5-grams, both inside doc 1
    # bench 200 has 4 tokens → its single full-text shingle is not a
    # 5-gram of doc 2 (doc grams are exact 5-token windows)
    assert got == {(1, 100): 2}


def test_hash_grams_matches_string_join(spark):
    docs, bench = _frames(spark)
    plain = set(
        map(tuple, ct.ngram_overlap(docs, bench, n=5).collect())
    )
    hashed = set(
        map(
            tuple,
            ct.ngram_overlap(docs, bench, n=5, hash_grams=True).collect(),
        )
    )
    assert plain == hashed


def test_decontaminate_drops_only_hits(spark):
    docs, bench = _frames(spark)
    kept = sorted(
        r["doc_id"] for r in ct.decontaminate(docs, bench, n=5).collect()
    )
    assert kept == [2, 3]


def test_benchmark_side_broadcasts(spark):
    docs, bench = _frames(spark)
    plan = ct.ngram_overlap(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
