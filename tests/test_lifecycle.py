"""Family-generic tenant lifecycle: onboard/offboard across the PQ,
graph, and postings families (IVF delegates to the tested
onboard/offboard_tenant_ivf), byte-identity of untouched tenants,
refusal of double-onboarding, and the cache-purge offboard hook with
scoped evict/expire."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import lifecycle
from embeddingsearch_spark.storage import drop_table


def _listing(spark, table, tenant, partition_col="source"):
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    return sorted(
        (os.path.relpath(p, wh), os.path.getsize(p))
        for p in glob.glob(
            os.path.join(
                wh, table, f"{partition_col}={tenant}", "**", "*"
            ),
            recursive=True,
        )
        if os.path.isfile(p)
    )


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (
            i,
            [float(x) for x in rng.normal(size=16)],
            ("t0", "t1", "t2")[i % 3],
        )
        for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, source string"
    ).cache()


def test_pq_onboard_offboard_byte_identity(spark, vecs):
    from embeddingsearch_spark.operators import pq

    prefix = "es_test_lc_pq"
    for t in ("_codes", "_codebooks"):
        drop_table(spark, prefix + t)
    base = vecs.filter(F.col("source") != "t2")
    cbs = pq.initial_codebooks_federated(base, m_sub=4, k_codes=8)
    coded = pq.encode_pq_federated(base, cbs)
    pq.save_federated_pq_index(coded, cbs, prefix, n_buckets=2)
    before_t1 = _listing(spark, prefix + "_codes", "t1")
    assert before_t1

    t2 = vecs.filter(F.col("source") == "t2")
    cbs_t2 = pq.initial_codebooks_federated(t2, m_sub=4, k_codes=8)
    lifecycle.onboard_tenant(
        spark, prefix, "pq", t2, codebooks=cbs_t2, n_buckets=2
    )
    # onboarded tenant serves; untouched tenant's files identical
    assert _listing(spark, prefix + "_codes", "t1") == before_t1
    got = spark.table(prefix + "_codes").filter(
        F.col("source") == "t2"
    )
    want = pq.encode_pq_federated(t2, cbs_t2).select(
        "vec_id", "source", "codes"
    )
    assert sorted(
        (r["vec_id"], tuple(r["codes"])) for r in got.collect()
    ) == sorted(
        (r["vec_id"], tuple(r["codes"])) for r in want.collect()
    )
    # double-onboard refused
    with pytest.raises(ValueError, match="already onboarded"):
        lifecycle.onboard_tenant(
            spark, prefix, "pq", t2, codebooks=cbs_t2, n_buckets=2
        )
    # offboard t0: its partitions and codebook rows gone, t1/t2 intact
    before_t1 = _listing(spark, prefix + "_codes", "t1")
    stats = lifecycle.offboard_tenant(spark, prefix, "pq", "t0")
    assert stats["partitions_dropped"] >= 1
    assert stats["artifact_rows_dropped"] == 4 * 8
    assert _listing(spark, prefix + "_codes", "t1") == before_t1
    assert (
        spark.table(prefix + "_codes")
        .filter(F.col("source") == "t0")
        .count()
        == 0
    )
    assert (
        spark.table(prefix + "_codebooks")
        .filter(F.col("source") == "t0")
        .count()
        == 0
    )


def test_graph_onboard_offboard_byte_identity(spark, vecs):
    from embeddingsearch_spark.operators import graphann

    prefix = "es_test_lc_graph"
    for t in ("_pairs", "_assigned"):
        drop_table(spark, prefix + t)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("vec_id")
    cents = (
        vecs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 4)
        .select(
            "source", F.col("vec_id").alias("centroid_id"), "embedding"
        )
        .localCheckpoint(eager=True)
    )
    base = vecs.filter(F.col("source") != "t2")
    assigned = graphann.assign_blocks_federated(
        base, cents.filter(F.col("source") != "t2"), n_assign=2
    )
    pairs = graphann.block_pair_sims_federated(base, assigned)
    graphann.save_federated_graph_index(
        pairs, assigned, prefix, n_buckets=2
    )
    before_t1 = _listing(spark, prefix + "_pairs", "t1")
    assert before_t1

    t2 = vecs.filter(F.col("source") == "t2")
    lifecycle.onboard_tenant(
        spark, prefix, "graph", t2,
        quantizer=cents.filter(F.col("source") == "t2"),
        n_assign=2, n_buckets=2,
    )
    assert _listing(spark, prefix + "_pairs", "t1") == before_t1
    # onboarded pairs equal the one-shot per-tenant build
    want = sorted(
        (r["_ida"], r["_idb"])
        for r in graphann.block_pair_sims_federated(
            t2,
            graphann.assign_blocks_federated(
                t2, cents.filter(F.col("source") == "t2"), n_assign=2
            ),
        ).collect()
    )
    got = sorted(
        (r["_ida"], r["_idb"])
        for r in spark.table(prefix + "_pairs")
        .filter(F.col("source") == "t2")
        .collect()
    )
    assert got == want and got
    with pytest.raises(ValueError, match="already onboarded"):
        lifecycle.onboard_tenant(
            spark, prefix, "graph", t2,
            quantizer=cents.filter(F.col("source") == "t2"),
        )
    stats = lifecycle.offboard_tenant(spark, prefix, "graph", "t0")
    assert stats["partitions_dropped"] >= 2
    for t in ("_pairs", "_assigned"):
        assert (
            spark.table(prefix + t)
            .filter(F.col("source") == "t0")
            .count()
            == 0
        )


def test_postings_onboard_offboard_and_cache_purge(spark):
    from embeddingsearch_spark.operators import query_cache as qc
    from embeddingsearch_spark.operators import retrieval

    prefix = "es_test_lc_post"
    cache = "es_test_lc_cache"
    drop_table(spark, cache)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "t0"),
            (2, "alpha delta", "t0"),
            (3, "alpha beta", "t1"),
            (4, "epsilon zeta", "t1"),
            (5, "alpha omega", "t2"),
        ],
        "doc_id long, text string, source string",
    )
    retrieval.build_partitioned_postings_index(
        docs.filter(F.col("source") != "t2"), prefix,
        partition_col="source", n_buckets=2,
    )
    before_t1 = _listing(spark, prefix, "t1")
    lifecycle.onboard_tenant(
        spark, prefix, "postings",
        docs.filter(F.col("source") == "t2"), n_buckets=2,
    )
    assert _listing(spark, prefix, "t1") == before_t1
    with pytest.raises(ValueError, match="already onboarded"):
        lifecycle.onboard_tenant(
            spark, prefix, "postings",
            docs.filter(F.col("source") == "t2"),
        )

    # fill the tenant-keyed cache for all three collections
    qs = spark.createDataFrame(
        [(10, "alpha"), (11, "alpha"), (12, "alpha")],
        "query_id long, text string",
    )
    route = spark.createDataFrame(
        [(10, "t0"), (11, "t1"), (12, "t2")],
        "query_id long, source string",
    )
    versions = {"t0": "v1", "t1": "v1", "t2": "v1"}
    qc.serve_bm25_federated_cached(
        spark, cache, prefix, qs, route, versions, k=5,
        partition_col="source",
    ).collect()
    assert (
        spark.table(cache).select("_scope").distinct().count() == 3
    )

    # offboard t0 WITH the cache hook: its partition AND keys gone
    stats = lifecycle.offboard_tenant(
        spark, prefix, "postings", "t0", cache_table=cache
    )
    assert stats["partitions_dropped"] == 1
    assert stats["cache_keys_purged"] == 1
    assert (
        spark.table(cache).filter(F.col("_scope") == "t0").count() == 0
    )
    # survivors still fully hit: re-serve writes nothing
    n_rows = spark.table(cache).count()
    surv_q = qs.filter(F.col("query_id") != 10)
    surv_r = route.filter(F.col("query_id") != 10)
    res = qc.serve_bm25_federated_cached(
        spark, cache, prefix, surv_q, surv_r, versions, k=5,
        partition_col="source",
    )
    assert {r["query_id"] for r in res.collect()} == {11, 12}
    assert spark.table(cache).count() == n_rows


def test_scoped_evict_and_expire(spark):
    """Tenant-scoped hygiene: evict/expire with ``scope=`` bound one
    collection's key space; the other collection's rows are
    untouched even when older/over-capacity."""
    from embeddingsearch_spark.operators import query_cache as qc

    cache = "es_test_scoped_cache"
    drop_table(spark, cache)
    rows = [
        # _qh, _kmax, _gen, _ts, _scope, doc_id, score, rank
        ("a1", 5, 1, 10.0, "acme", 1, 1.0, 1),
        ("a2", 5, 2, 20.0, "acme", 2, 1.0, 1),
        ("a3", 5, 3, 30.0, "acme", 3, 1.0, 1),
        ("g1", 5, 1, 10.0, "globex", 4, 1.0, 1),
    ]
    spark.createDataFrame(
        rows,
        "_qh string, _kmax int, _gen int, _ts double, _scope string, "
        "doc_id long, score double, rank int",
    ).write.saveAsTable(cache)

    stats = qc.evict_query_cache(spark, cache, keep_keys=1, scope="acme")
    assert stats == {
        "keys_before": 3, "keys_after": 1, "rows_evicted": 2
    }
    left = {r["_qh"] for r in spark.table(cache).collect()}
    assert left == {"a3", "g1"}  # globex untouched despite gen 1

    stats = qc.expire_query_cache(
        spark, cache, now=100.0, ttl=50.0, scope="acme"
    )
    # a3 at ts=30 < 100-50 expires; g1 (same age) survives off-scope
    assert stats["rows_expired"] == 1
    left = {r["_qh"] for r in spark.table(cache).collect()}
    assert left == {"g1"}

    purged = qc.purge_query_cache_scope(spark, cache, "globex")
    assert purged == {"keys_purged": 1, "rows_purged": 1}
    assert spark.table(cache).count() == 0
    # no-op on a missing table (offboard before any cached serve)
    assert qc.purge_query_cache_scope(
        spark, "es_test_scoped_cache_missing", "x"
    ) == {"keys_purged": 0, "rows_purged": 0}


def test_unknown_family_refused(spark, vecs):
    with pytest.raises(ValueError, match="unknown family"):
        lifecycle.onboard_tenant(spark, "x", "bm42", vecs)
    with pytest.raises(ValueError, match="unknown family"):
        lifecycle.offboard_tenant(spark, "x", "bm42", "t0")


def test_positions_onboard_offboard(spark):
    from embeddingsearch_spark.operators import retrieval

    prefix = "es_test_lc_pos"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "t0"),
            (2, "alpha beta", "t1"),
            (3, "beta alpha beta", "t2"),
        ],
        "doc_id long, text string, source string",
    )
    retrieval.build_partitioned_positions_index(
        docs.filter(F.col("source") != "t2"), prefix,
        partition_col="source", n_buckets=2,
    )
    before_t1 = _listing(spark, prefix, "t1")
    lifecycle.onboard_tenant(
        spark, prefix, "positions",
        docs.filter(F.col("source") == "t2"), n_buckets=2,
    )
    assert _listing(spark, prefix, "t1") == before_t1
    # onboarded rows equal the direct positional explode
    got = sorted(
        (r["doc_id"], r["pos"], r["term"])
        for r in spark.table(prefix)
        .filter(F.col("source") == "t2")
        .collect()
    )
    assert got == [(3, 0, "beta"), (3, 1, "alpha"), (3, 2, "beta")]
    with pytest.raises(ValueError, match="already onboarded"):
        lifecycle.onboard_tenant(
            spark, prefix, "positions",
            docs.filter(F.col("source") == "t2"),
        )
    stats = lifecycle.offboard_tenant(
        spark, prefix, "positions", "t0"
    )
    assert stats["partitions_dropped"] == 1
    assert (
        spark.table(prefix).filter(F.col("source") == "t0").count()
        == 0
    )


def test_per_tenant_ttl_map(spark):
    """{scope: ttl} aging in one pass: each listed collection's keys
    age against ITS ttl; unlisted collections untouched."""
    from embeddingsearch_spark.operators import query_cache as qc

    cache = "es_test_ttlmap_cache"
    drop_table(spark, cache)
    rows = [
        ("a1", 5, 1, 10.0, "acme", 1, 1.0, 1),   # age 90 at now=100
        ("a2", 5, 2, 80.0, "acme", 2, 1.0, 1),   # age 20
        ("g1", 5, 1, 10.0, "globex", 3, 1.0, 1),  # age 90
        ("n1", 5, 1, 10.0, "newco", 4, 1.0, 1),   # unlisted
    ]
    spark.createDataFrame(
        rows,
        "_qh string, _kmax int, _gen int, _ts double, _scope string, "
        "doc_id long, score double, rank int",
    ).write.saveAsTable(cache)
    stats = qc.expire_query_cache(
        spark, cache, now=100.0,
        ttl={"acme": 50.0, "globex": 95.0},
    )
    # acme: a1 expires (90 > 50), a2 survives; globex: g1 survives
    # (90 <= 95); newco untouched (unlisted)
    assert stats == {
        "keys_before": 3, "keys_after": 2, "rows_expired": 1
    }
    left = {r["_qh"] for r in spark.table(cache).collect()}
    assert left == {"a2", "g1", "n1"}
