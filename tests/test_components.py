"""Connected components over dedup pair graphs (operators/dedup.py).

The pair graph from LSH is a set of edges, not transitively closed —
clustering must propagate labels across chains (a~b, b~c but a,c never a
candidate pair), which pairwise keep-min can't do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import dedup as dd


def _components(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = dd.connected_components(pairs).collect()
    return {r["id"]: r["cluster_id"] for r in rows}


def test_chain_propagates_to_min(spark):
    # 1-2-3-4-5-6 chain: diameter 5 forces multiple propagation rounds
    edges = [(i, i + 1) for i in range(1, 6)]
    got = _components(spark, edges)
    assert got == {i: 1 for i in range(1, 7)}


def test_two_clusters_and_reversed_edges(spark):
    # labels must flow against edge direction too (b<a edges)
    edges = [(5, 2), (2, 9), (20, 30), (40, 30)]
    got = _components(spark, edges)
    assert got == {2: 2, 5: 2, 9: 2, 20: 20, 30: 20, 40: 20}


def test_empty_pairs(spark):
    got = _components(spark, [])
    assert got == {}


def test_neardup_clusters_singletons_and_representative(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different text about spark partitioning plans"),
        ],
        "doc_id long, text string",
    )
    out = dd.neardup_clusters(
        docs, "doc_id", "text", k=8, bands=4, shingle_n=3, threshold=0.5
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["cluster_id"] == 1 and rows[2]["cluster_id"] == 1
    assert rows[1]["cluster_size"] == 2
    assert rows[1]["is_representative"] and not rows[2]["is_representative"]
    # untouched doc is its own singleton cluster
    assert rows[3]["cluster_id"] == 3 and rows[3]["cluster_size"] == 1
    assert rows[3]["is_representative"]


def test_long_chain_converges_within_log_rounds(spark):
    """Pointer jumping: a 400-node chain (diameter 399) must fully merge
    well inside the default round cap — plain propagation would need 399
    rounds and silently return unmerged labels at the cap."""
    edges = [(i, i + 1) for i in range(400)]
    got = _components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 401


def test_select_representatives_keeps_longest(spark):
    docs = spark.createDataFrame(
        [
            (1, "short text"),
            (2, "a much longer version of the same duplicated text body"),
            (3, "unrelated singleton document"),
        ],
        "doc_id long, text string",
    )
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, cluster_id long"
    )
    out = {
        r.doc_id: r
        for r in dd.select_representatives(asg, docs, "doc_id").collect()
    }
    assert out[2].keep and out[2].rep_id == 2   # longest wins, not min id
    assert not out[1].keep and out[1].rep_id == 2
    assert out[3].keep and out[3].rep_id == 3
