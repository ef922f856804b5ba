"""Long-range (md5-ring) cross-block links: the clustered-corpus
recall ceiling and its fix, tenant purity of the federated ring, and
upsert schema alignment on a long-range generation."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import ann as ann_ops
from embeddingsearch_spark.operators import graphann


def _clustered(spark, tenants=("acme",), n_clusters=8, per_cluster=40,
               dim=8):
    rows = []
    for ti, t in enumerate(tenants):
        for c in range(n_clusters):
            for j in range(per_cluster):
                vid = ti + len(tenants) * (c * per_cluster + j)
                vec = [
                    3.0 * (1 if d == c % dim else 0)
                    + 0.1 * (((vid * 31 + d * 7) % 19) - 9) / 9.0
                    for d in range(dim)
                ]
                rows.append((vid, t, vec))
    return spark.createDataFrame(
        rows, "vec_id long, source string, embedding array<double>"
    ).localCheckpoint(eager=True)


def test_long_range_lifts_clustered_recall_ceiling(spark):
    """On the clustered twin the plain blocked graph SATURATES below
    0.7 at any beam (the round-9 honest negative); two md5-ring links
    per node lift recall@10 to >= 0.9 at beam 12 — and the build is
    deterministic (two runs, identical edge sets)."""
    emb = _clustered(spark)
    cents = emb.filter(F.col("vec_id") % 80 < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    qdf = emb.filter(F.col("vec_id") % 29 == 0)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann_ops.brute_force_topk(emb, queries, k=10).localCheckpoint(
        eager=True
    )

    def recall(edges, beam):
        served = graphann.graph_search(
            edges, emb, queries, k=10, beam=beam, hops=4, n_entry=8
        )
        return ann_ops.ann_recall(served, exact, k=10).agg(
            F.avg("recall")
        ).collect()[0][0]

    plain = graphann.knn_graph(emb, cents, m=8, n_assign=2)
    # the ceiling: even at nearly 3x the beam the blocked-only walk
    # stays under the 0.9 target (the scripted clustered-twin probe
    # measures 0.583 on its geometry; this corpus reads 0.83 — the
    # exact height depends on centroid luck, the SATURATION does not)
    r_plain = recall(plain, 32)
    assert r_plain < 0.9, r_plain
    lr = graphann.knn_graph(
        emb, cents, m=8, n_assign=2, long_range=2
    ).localCheckpoint(eager=True)
    r_lr = recall(lr, 12)
    assert r_lr >= 0.9 and r_lr > r_plain, (r_plain, r_lr)
    lr2 = graphann.knn_graph(emb, cents, m=8, n_assign=2, long_range=2)
    assert sorted(map(tuple, lr.collect())) == sorted(
        map(tuple, lr2.collect())
    )


def test_long_range_pairs_federated_tenant_pure(spark):
    """With partition_col the ring is PER COLLECTION: every long-range
    pair stays inside one tenant (the federated purity contract), and
    each node gets exactly `long_range` ring partners modulo
    self-collisions (none at this size)."""
    emb = _clustered(spark, tenants=("acme", "globex"), n_clusters=4,
                     per_cluster=10)
    pairs = graphann.long_range_pairs(
        emb, long_range=2, partition_col="source"
    ).localCheckpoint(eager=True)
    tenant_of = {
        r["vec_id"]: r["source"] for r in emb.collect()
    }
    for r in pairs.collect():
        assert tenant_of[r["_ida"]] == tenant_of[r["_idb"]] == r["source"]
    assert pairs.filter(F.col("_lr") == False).count() == 0  # noqa: E712


def test_upsert_into_long_range_generation_keeps_schema_and_links(
    spark,
):
    """An incremental batch into a long-range federated generation
    writes `_lr = FALSE` deltas (schema stays aligned), the surviving
    ring links still bypass the top-m cut at serve, and the new rows
    are reachable."""
    from embeddingsearch_spark.storage import drop_table

    emb = _clustered(spark, tenants=("acme", "globex"), n_clusters=4,
                     per_cluster=10)
    old = emb.filter(F.col("vec_id") < 60)
    cents = emb.filter(F.col("vec_id") < 8).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = graphann.assign_blocks_federated(old, cents, n_assign=2)
    pairs = graphann.block_pair_sims_federated(old, assigned).withColumn(
        "_lr", F.lit(False)
    ).unionByName(
        graphann.long_range_pairs(old, 2, partition_col="source")
    )
    pre = "es_test_glr"
    for t in ("_pairs", "_assigned"):
        drop_table(spark, pre + t)
    graphann.save_federated_graph_index(pairs, assigned, pre, n_buckets=2)
    graphann.upsert_federated_graph_index(
        spark, pre, emb, emb.filter(F.col("vec_id") >= 60), cents,
        n_buckets=2,
    )
    stored = spark.table(pre + "_pairs")
    assert "_lr" in stored.columns
    assert stored.filter(F.col("_lr")).count() > 0  # ring rows survive
    qdf = emb.filter(F.col("vec_id") % 29 == 0)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")
    served = graphann.graph_search_federated(
        spark, pre, emb, queries, route, k=5, beam=12, hops=3,
        n_entry=4, m=8,
    )
    assert served.count() > 0
    # ring links reach the serve's edge frame (they'd lose a pure
    # top-m cut): the federated inputs carry more edges than the
    # local-only derivation
    routed_pairs = spark.table(pre + "_pairs")
    with_lr = graphann.edges_from_pairs(
        routed_pairs.select("_ida", "_idb", "cosine", "_lr"), m=8
    ).count()
    without_lr = graphann.edges_from_pairs(
        routed_pairs.select("_ida", "_idb", "cosine"), m=8
    ).count()
    assert with_lr > without_lr


def test_retrain_refreshes_flagged_tenant_ring(spark):
    """On a long-range generation the retrain arm must REBUILD the
    flagged tenant's ring over its current corpus (raising if the
    caller omits long_range), and leave the other tenant's ring rows
    untouched."""
    import pytest

    from embeddingsearch_spark.storage import drop_table

    emb = _clustered(spark, tenants=("acme", "globex"), n_clusters=4,
                     per_cluster=10)
    cents = emb.filter(F.col("vec_id") < 8).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = graphann.assign_blocks_federated(emb, cents, n_assign=2)
    pairs = graphann.block_pair_sims_federated(emb, assigned).withColumn(
        "_lr", F.lit(False)
    ).unionByName(
        graphann.long_range_pairs(emb, 2, partition_col="source")
    )
    pre = "es_test_glr_rt"
    for t in ("_pairs", "_assigned"):
        drop_table(spark, pre + t)
    graphann.save_federated_graph_index(pairs, assigned, pre, n_buckets=2)
    acme_before = sorted(
        map(
            tuple,
            spark.table(pre + "_pairs")
            .filter(F.col("source") == "acme")
            .collect(),
        )
    )
    gx = emb.filter(F.col("source") == "globex")
    new_cents = gx.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    with pytest.raises(ValueError, match="long-range generation"):
        graphann.retrain_federated_graph_tenants(
            spark, pre, gx, new_cents, n_buckets=2
        )
    graphann.retrain_federated_graph_tenants(
        spark, pre, gx, new_cents, n_buckets=2, long_range=2
    )
    after = spark.table(pre + "_pairs")
    # globex's ring rebuilt (ring rows present), acme byte-identical
    assert after.filter(
        (F.col("source") == "globex") & F.col("_lr")
    ).count() > 0
    acme_after = sorted(
        map(
            tuple,
            after.filter(F.col("source") == "acme").collect(),
        )
    )
    assert acme_after == acme_before
