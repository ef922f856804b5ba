"""ANN paths: the numpy GEMM top-k must produce exactly the rows of the
JVM expression path (rounding to 6 digits absorbs summation-order
differences), and IVF probing returns a subset of brute-force results."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import ann as ann_ops

SF = "/root/testdata/sf0.001"


def _corpus_queries(spark):
    emb = tables.load(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, qs


def test_numpy_equals_hof_topk(spark):
    emb, qs = _corpus_queries(spark)
    a = sorted(map(tuple, ann_ops.brute_force_topk(emb, qs, k=7).collect()))
    b = sorted(
        map(tuple, ann_ops.brute_force_topk_numpy(emb, qs, k=7).collect())
    )
    assert a == b


def test_ivf_results_subset_of_brute_force(spark):
    emb, qs = _corpus_queries(spark)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids(emb, cents)
    ivf = ann_ops.ivf_topk(assigned, cents, qs, k=5, nprobe=8)
    # nprobe == n_centroids → searches everything → equals brute force
    bf = ann_ops.brute_force_topk(emb, qs, k=5)
    assert sorted(map(tuple, ivf.collect())) == sorted(
        map(tuple, bf.collect())
    )


def test_semantic_dedup_min_id_per_ball(spark):
    """Planted exact duplicates: the lowest id in each ε-ball is kept,
    every other member dropped; singletons all keep."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = [list(map(float, rng.normal(size=8))) for _ in range(12)]
    rows = [(i, base[i]) for i in range(12)]
    # ids 100/101 duplicate vector 3; id 102 duplicates vector 5
    rows += [(100, base[3]), (101, base[3]), (102, base[5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in ann_ops.semantic_dedup(
            emb, k=4, threshold=0.999
        ).collect()
    }
    assert len(out) == 15
    assert out[3] and not out[100] and not out[101]
    assert out[5] and not out[102]
    # non-planted rows are near-orthogonal at this threshold -> all keep
    assert all(out[i] for i in range(12))


def test_prototype_prune_keeps_least_prototypical(spark):
    """One tight cluster + distinct far points: within each cluster the
    rows NEAREST the centroid are pruned first, keep counts are
    ceil(keep_frac * n), and proto_sim orders the keep decision."""
    import math

    rows = []
    # cluster around e0: ids 0..7 at increasing distance from e0
    for i in range(8):
        v = [1.0, 0.1 * i] + [0.0] * 6
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_ops.prototype_prune(emb, k=1, keep_frac=0.5).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == 8
    n_keep = sum(r["keep"] for r in out)
    assert n_keep == math.ceil(0.5 * 8)
    # kept rows must be exactly the least-prototypical (lowest proto_sim)
    kept_sims = sorted(r["proto_sim"] for r in out if r["keep"])
    dropped_sims = sorted(r["proto_sim"] for r in out if not r["keep"])
    assert kept_sims[-1] <= dropped_sims[0]
    # centroid init is the lowest-id vector, so id 0 IS the prototype
    assert not by_id[0]["keep"]


def test_cluster_balanced_sample_caps_per_cluster(spark):
    """Each cluster contributes at most n rows, and the selection is
    deterministic across invocations."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, list(map(float, rng.normal(size=8)))) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out1 = sorted(
        map(tuple, ann_ops.cluster_balanced_sample(
            emb, k=4, n_per_cluster=5
        ).collect())
    )
    out2 = sorted(
        map(tuple, ann_ops.cluster_balanced_sample(
            emb, k=4, n_per_cluster=5
        ).collect())
    )
    assert out1 == out2
    per = {}
    for _, cid in out1:
        per[cid] = per.get(cid, 0) + 1
    assert all(v <= 5 for v in per.values())
    assert len(out1) <= 20 and len(out1) > 0


def test_chunk_max_topk_best_chunk_semantics(spark):
    """Doc score = max over its chunks; best_vec_id = smallest chunk id
    among the max scorers; rank deterministic."""
    from embeddingsearch_spark.operators import ann as ann_ops

    # doc 0: chunks 0 (orthogonal), 1 (exact match) -> doc scores 1.0
    # doc 1: chunks 10 (anti-parallel), 11 (orthogonal) -> 0.5 best
    rows = [
        (0, 0, [1.0, 0.0]),
        (0, 1, [0.0, 1.0]),
        (1, 10, [0.0, -1.0]),
        (1, 11, [1.0, 0.0]),
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(100, [0.0, 1.0])], "query_id long, embedding array<float>"
    )
    out = {
        r["doc_id"]: r
        for r in ann_ops.chunk_max_topk(chunks, queries, k=10).collect()
    }
    assert out[0]["cosine"] == 1.0 and out[0]["best_vec_id"] == 1
    assert out[0]["rank"] == 1
    assert out[1]["cosine"] == 0.5 and out[1]["best_vec_id"] == 11
    assert out[1]["rank"] == 2


def test_chunk_max_topk_tie_smallest_chunk(spark):
    from embeddingsearch_spark.operators import ann as ann_ops

    rows = [(0, 5, [0.0, 1.0]), (0, 3, [0.0, 2.0])]  # both cosine 1.0
    chunks = spark.createDataFrame(
        rows, "doc_id long, vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(1, [0.0, 1.0])], "query_id long, embedding array<float>"
    )
    r = ann_ops.chunk_max_topk(chunks, queries, k=1).collect()[0]
    assert r["cosine"] == 1.0 and r["best_vec_id"] == 3


def test_chunk_max_topk_string_chunk_ids(spark):
    """String/UUID chunk ids: tiebreak must stay deterministic (the old
    -id negation cast strings to NULL, silently randomizing it)."""
    from embeddingsearch_spark.operators import ann as ann_ops

    rows = [(0, "c-b", [0.0, 1.0]), (0, "c-a", [0.0, 2.0])]
    chunks = spark.createDataFrame(
        rows, "doc_id long, vec_id string, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(1, [0.0, 1.0])], "query_id long, embedding array<float>"
    )
    r = ann_ops.chunk_max_topk(chunks, queries, k=1).collect()[0]
    assert r["cosine"] == 1.0 and r["best_vec_id"] == "c-a"


def test_hard_negative_mine_excludes_self_and_dups(spark):
    from embeddingsearch_spark.operators import ann as ann_ops

    # query 0: vec 1 is a near-identical dup (excluded), vec 2 similar
    # (kept), vec 3 orthogonal (kept, lower rank)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.8, 0.6]),
        (3, [0.0, 1.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = [
        (r["vec_id"], r["rank"])
        for r in ann_ops.hard_negative_mine(
            corpus, queries, k=5, max_sim=0.95
        )
        .orderBy("rank")
        .collect()
    ]
    # self (0) and near-dup (1, remapped cosine ~0.9999) excluded
    assert out == [(2, 1), (3, 2)]


def test_ann_recall_at_k(spark):
    from embeddingsearch_spark.operators import ann as ann_ops

    exact = spark.createDataFrame(
        [(1, v, r) for r, v in enumerate([10, 11, 12], 1)]
        + [(2, v, r) for r, v in enumerate([20, 21], 1)],
        "query_id long, vec_id long, rank long",
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 77, 1), (2, 78, 2)],
        "query_id long, vec_id long, rank long",
    )
    out = {
        r["query_id"]: r
        for r in ann_ops.ann_recall(approx, exact, k=3).collect()
    }
    assert out[1]["n_hits"] == 2 and abs(out[1]["recall"] - 2 / 3) < 1e-6
    assert out[2]["n_hits"] == 0 and out[2]["recall"] == 0.0

    # self-recall is 1 by construction
    self_r = ann_ops.ann_recall(exact, exact, k=3).collect()
    assert all(r["recall"] == 1.0 for r in self_r)


def test_ann_recall_dedup_and_approx_only_queries(spark):
    """Duplicate (query, vec) pairs must not inflate n_hits past the
    denominator, and a query present only in the approx frame surfaces
    with recall NULL instead of vanishing."""
    from embeddingsearch_spark.operators import ann as ann_ops

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, vec_id long, rank long"
    )
    approx = spark.createDataFrame(
        # (1, 10) duplicated; query 5 has no exact baseline
        [(1, 10, 1), (1, 10, 2), (5, 50, 1)],
        "query_id long, vec_id long, rank long",
    )
    out = {
        r["query_id"]: r
        for r in ann_ops.ann_recall(approx, exact, k=3).collect()
    }
    assert out[1]["n_hits"] == 1 and abs(out[1]["recall"] - 0.5) < 1e-9
    assert 5 in out and out[5]["recall"] is None


def test_ann_recall_rejects_uncapped_rankless_frames(spark):
    import pytest

    from embeddingsearch_spark.operators import ann as ann_ops

    exact = spark.createDataFrame(
        [(1, v) for v in range(20)], "query_id long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(1, 5)], "query_id long, vec_id long"
    )
    with pytest.raises(ValueError, match="no 'rank' column"):
        ann_ops.ann_recall(approx, exact, k=10)


def test_ivf_index_persist_prune_and_parity(spark):
    """Persisted IVF: the partitioned index path returns exactly
    `ivf_topk`'s frame, and the scan statically prunes to the probed
    centroid partitions (PartitionFilters carries the isin cut)."""
    emb, qs = _corpus_queries(spark)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids(emb, cents)
    ann_ops.save_ivf_index(assigned, cents, "es_test_ivf", n_buckets=2)
    for nprobe in (2, 8):
        got = ann_ops.ivf_topk_from_index(
            spark, "es_test_ivf", qs, k=5, nprobe=nprobe
        )
        want = ann_ops.ivf_topk(assigned, cents, qs, k=5, nprobe=nprobe)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), nprobe
    # partition pruning: a literal isin on the partition column reaches
    # the scan as a PartitionFilter (no data read outside the probe)
    pruned = spark.table("es_test_ivf_assigned").filter(
        F.col("centroid_id").isin([0, 3])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan


def test_federated_assign_single_tenant_parity(spark):
    """A one-collection corpus assigns identically under the federated
    kernel and the plain one (same remap/round/argmax-tiebreak), and
    vectors of a collection with no quantizer are dropped, not
    cross-assigned."""
    emb, _ = _corpus_queries(spark)
    one = emb.withColumn("source", F.lit("acme"))
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    fcents = cents.withColumn("source", F.lit("acme"))
    plain = ann_ops.assign_centroids(emb, cents).select(
        "vec_id", "centroid_id"
    )
    fed = ann_ops.assign_centroids_federated(
        one, fcents, partition_col="source"
    ).select("vec_id", "centroid_id")
    assert sorted(map(tuple, fed.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # a second collection with no quantizer: its vectors vanish
    mixed = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("unknown"),
    )
    fed2 = ann_ops.assign_centroids_federated(
        mixed, fcents, partition_col="source"
    )
    srcs = {r["source"] for r in fed2.select("source").distinct().collect()}
    assert srcs == {"acme"}


def test_ivf_federated_tenant_isolation_and_parity(spark):
    """The federated IVF serve equals per-tenant `ivf_topk` run inside
    each collection, and a query never sees another tenant's vectors —
    even when the other tenant holds an IDENTICAL vector."""
    emb, _ = _corpus_queries(spark)
    two = emb.select("vec_id", "embedding").withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    # clone vec 0 (acme) into globex under a new id: the best possible
    # cross-tenant match for query 0, which must NOT appear
    clone = two.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        F.lit("globex").alias("source"),
    )
    two = two.unionByName(clone)
    cents = two.filter(F.col("vec_id") < 8).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        two, cents, partition_col="source"
    ).localCheckpoint(eager=True)
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_test_tivf", partition_col="source",
        n_buckets=2,
    )
    qdf = two.filter(F.col("vec_id") < 3)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")
    got = ann_ops.ivf_federated_from_index(
        spark, "es_test_tivf", queries, route, k=5, nprobe=4,
        partition_col="source",
    )
    want = None
    for tenant in ("acme", "globex"):
        t_assigned = assigned.filter(F.col("source") == tenant)
        t_cents = cents.filter(F.col("source") == tenant).select(
            "centroid_id", "embedding"
        )
        t_qids = [
            r["query_id"]
            for r in route.filter(F.col("source") == tenant)
            .select("query_id")
            .collect()
        ]
        part = ann_ops.ivf_topk(
            t_assigned, t_cents,
            queries.filter(F.col("query_id").isin(t_qids)),
            k=5, nprobe=4,
        )
        want = part if want is None else want.unionByName(part)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # isolation: query 0 (acme) never returns the globex clone
    hits0 = {
        r["vec_id"]
        for r in got.filter(F.col("query_id") == 0).collect()
    }
    assert 100000 not in hits0
    # ...even though the clone IS the perfect match inside globex
    q1 = queries.filter(F.col("query_id") == 1)
    r1 = route.filter(F.col("query_id") == 1)
    assert r1.collect()[0]["source"] == "globex"
