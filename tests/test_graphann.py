"""Graph ANN (NSW family): build invariants, beam-search monotonicity,
and recall vs the exact baseline at an IVF-comparable budget."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import ann, graphann


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return tables.load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def cents(corpus):
    return corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_knn_graph_invariants(corpus, cents):
    edges = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    rows = edges.collect()
    # no self-loops; degree capped at 2m (the HNSW prune); mostly
    # bidirectional (the cap may drop one direction at hub nodes)
    pairs = {(r["src"], r["dst"]) for r in rows}
    assert all(s != d for s, d in pairs)
    sym = sum(1 for s, d in pairs if (d, s) in pairs) / len(pairs)
    assert sym >= 0.8, sym
    deg = edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg <= 12
    # every node with a neighbor in its blocks appears as a source
    n_nodes = edges.select("src").distinct().count()
    assert n_nodes == corpus.count()


def test_graph_search_monotone_in_hops(corpus, cents, queries):
    """The frontier union keeps the previous beam, so recall can only
    improve with more hops."""
    edges = graphann.knn_graph(corpus, cents, m=8, n_assign=2)
    exact = ann.brute_force_topk(corpus, queries, k=10)

    def recall(hops):
        res = graphann.graph_search(
            edges, corpus, queries, k=10, beam=16, hops=hops, n_entry=8
        )
        return (
            ann.ann_recall(res, exact, k=10)
            .agg(F.avg("recall"))
            .collect()[0][0]
        )

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1
    assert r3 >= 0.8, r3


def test_graph_search_beats_or_matches_ivf_budget(
    corpus, cents, queries
):
    """At the gated config the graph path's recall must at least match
    IVF nprobe=4 on the same corpus (measured: 1.0 vs 0.9 at sf0.01 —
    the BASELINE.md probe row)."""
    assigned = ann.assign_centroids(corpus, cents)
    exact = ann.brute_force_topk(corpus, queries, k=10)
    ivf = ann.ivf_topk(assigned, cents, queries, k=10, nprobe=4)
    r_ivf = (
        ann.ann_recall(ivf, exact, k=10)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    edges = graphann.knn_graph(corpus, cents, m=8, n_assign=2)
    res = graphann.graph_search(
        edges, corpus, queries, k=10, beam=16, hops=3, n_entry=8
    )
    r_graph = (
        ann.ann_recall(res, exact, k=10)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    assert r_graph >= r_ivf - 1e-9, (r_graph, r_ivf)


def test_graph_search_deterministic(corpus, cents, queries):
    edges = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    a = graphann.graph_search(
        edges, corpus, queries, k=5, beam=8, hops=2, n_entry=4
    ).collect()
    b = graphann.graph_search(
        edges, corpus, queries, k=5, beam=8, hops=2, n_entry=4
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == queries.count() * 5


def test_merge_into_graph_equals_rebuild(corpus, cents):
    """Incremental maintenance contract: merging a batch into the
    persisted pair table yields EXACTLY the edges a full rebuild
    produces (old-old pairs can't change under a fixed quantizer)."""
    old = corpus.filter(F.col("vec_id") % 10 != 0)
    batch = corpus.filter(F.col("vec_id") % 10 == 0)
    assigned_old = graphann.assign_blocks(old, cents, n_assign=2)
    pairs_old = graphann.block_pair_sims(old, assigned_old)
    pairs, assigned, edges = graphann.merge_into_graph(
        pairs_old, assigned_old, corpus, batch, cents, m=6, n_assign=2
    )
    full = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    got = sorted(tuple(r) for r in edges.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want
    # assignment table covers the whole corpus exactly twice (n_assign)
    assert assigned.count() == corpus.count() * 2


def test_merge_into_graph_reingest_replaces(corpus, cents):
    """Re-ingesting existing ids replaces their rows instead of
    duplicating them — merge result still equals the rebuild."""
    batch = corpus.filter(F.col("vec_id") < 30)
    assigned_old = graphann.assign_blocks(corpus, cents, n_assign=2)
    pairs_old = graphann.block_pair_sims(corpus, assigned_old)
    pairs, assigned, edges = graphann.merge_into_graph(
        pairs_old, assigned_old, corpus, batch, cents, m=6, n_assign=2
    )
    full = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    assert sorted(tuple(r) for r in edges.collect()) == sorted(
        tuple(r) for r in full.collect()
    )
    assert assigned.count() == corpus.count() * 2


def test_graph_config_for_scaling():
    small = graphann.graph_config_for(500)
    big = graphann.graph_config_for(5000)
    huge = graphann.graph_config_for(5_000_000)
    assert small["n_blocks"] < big["n_blocks"] < huge["n_blocks"]
    assert big["beam"] >= 2 * big["m"] and big["beam"] >= 20
    assert huge["hops"] >= big["hops"] >= 3
    assert huge["n_blocks"] <= 4096  # cap


def test_graph_auto_config_recall(corpus, cents, queries, spark, sf_dir):
    """The auto-sized config reaches >= 0.9 recall on the fixture
    corpus (the constants were pinned by the BASELINE.md probes)."""
    n = corpus.count()
    cfg = graphann.graph_config_for(n)
    cents_n = corpus.filter(
        F.col("vec_id") < cfg["n_blocks"]
    ).select(F.col("vec_id").alias("centroid_id"), "embedding")
    edges = graphann.knn_graph(
        corpus, cents_n, m=cfg["m"], n_assign=cfg["n_assign"]
    )
    res = graphann.graph_search(
        edges, corpus, queries, k=10, beam=cfg["beam"],
        hops=cfg["hops"], n_entry=cfg["n_entry"],
    )
    exact = ann.brute_force_topk(corpus, queries, k=10)
    r = (
        ann.ann_recall(res, exact, k=10)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    assert r >= 0.9, r


def test_graph_search_filtered(corpus, cents, queries):
    """Filtered ANN: every answer satisfies the predicate; recall vs
    the exact filtered ground truth is at least the post-filter
    baseline (the answer pool keeps allowed nodes the final beam
    forgot)."""
    allowed = corpus.filter(F.col("label") < 3).select("vec_id")
    allowed_set = {r["vec_id"] for r in allowed.collect()}
    edges = graphann.knn_graph(corpus, cents, m=8, n_assign=2)
    res = graphann.graph_search(
        edges, corpus, queries, k=10, beam=16, hops=3, n_entry=8,
        allowed=allowed,
    )
    rows = res.collect()
    assert rows and all(r["vec_id"] in allowed_set for r in rows)

    exact_allowed = ann.brute_force_topk(
        corpus.join(allowed, "vec_id", "left_semi"), queries, k=10
    )

    def recall(approx):
        return (
            ann.ann_recall(approx, exact_allowed, k=10)
            .agg(F.avg("recall"))
            .collect()[0][0]
        )

    r_filtered = recall(res)
    # post-filter baseline: unfiltered search, then drop disallowed
    # (rank column removed so ann_recall treats it as an uncapped set
    # of <= k rows — re-rank after the filter)
    unf = graphann.graph_search(
        edges, corpus, queries, k=10, beam=16, hops=3, n_entry=8
    )
    post = unf.join(allowed, "vec_id", "left_semi").select(
        "query_id", "vec_id", "rank"
    )
    r_post = recall(post)
    assert r_filtered >= r_post - 1e-9, (r_filtered, r_post)
    assert r_filtered >= 0.5, r_filtered


def test_graph_search_rejects_beam_below_k(corpus, cents, queries):
    edges = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    with pytest.raises(ValueError, match="beam"):
        graphann.graph_search(
            edges, corpus, queries, k=10, beam=4, hops=2
        )


def test_graph_search_no_cartesian(spark, corpus, cents, queries):
    from embeddingsearch_spark.plans import inspect as pi

    edges = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    df = graphann.graph_search(
        edges, corpus, queries, k=5, beam=8, hops=2, n_entry=4
    )
    plan = pi.physical_plan(df)
    assert "CartesianProduct" not in plan


def test_graph_index_persist_and_upsert(spark, corpus, cents):
    """Cross-session persistence: save pairs+assigned as catalog
    tables, merge a batch through `upsert_graph_index`, and the edges
    derived from the PERSISTED pair table equal a full rebuild."""
    old = corpus.filter(F.col("vec_id") % 7 != 0)
    batch = corpus.filter(F.col("vec_id") % 7 == 0)
    assigned_old = graphann.assign_blocks(old, cents, n_assign=2)
    pairs_old = graphann.block_pair_sims(old, assigned_old)
    tp, ta = graphann.save_graph_index(
        pairs_old, assigned_old, "es_test_graph", n_buckets=4
    )
    assert tp == "es_test_graph_pairs" and ta == "es_test_graph_assigned"
    # the saved tables round-trip (schema + row count)
    lp, la = graphann.load_graph_index(spark, "es_test_graph")
    assert lp.count() == pairs_old.count()
    assert la.count() == assigned_old.count()
    edges = graphann.upsert_graph_index(
        spark, "es_test_graph", corpus, batch, cents,
        m=6, n_assign=2, n_buckets=4,
    )
    full = graphann.knn_graph(corpus, cents, m=6, n_assign=2)
    assert sorted(tuple(r) for r in edges.collect()) == sorted(
        tuple(r) for r in full.collect()
    )
    # persisted state also matches: a SECOND upsert with an empty batch
    # leaves everything unchanged (idempotence of the stored artifact)
    empty = corpus.filter(F.col("vec_id") < 0)
    edges2 = graphann.upsert_graph_index(
        spark, "es_test_graph", corpus, empty, cents,
        m=6, n_assign=2, n_buckets=4,
    )
    assert sorted(tuple(r) for r in edges2.collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_hierarchical_entries_and_recall(spark, corpus, cents, queries):
    """Two-layer search: per-query entries from the coarse centroid
    graph reach at least the recall of the global-sample entries at
    one FEWER base hop and the same beam; entries are deduped
    (query, node) pairs drawn from the probed blocks' members."""
    from embeddingsearch_spark.operators import ann as ann_ops

    assigned = graphann.assign_blocks(corpus, cents, n_assign=2)
    edges = graphann.edges_from_pairs(
        graphann.block_pair_sims(corpus, assigned), m=6
    )
    coarse = graphann.dense_knn_graph(
        cents, m=4, id_col="centroid_id"
    )
    hent = graphann.hierarchical_entries(
        coarse, cents, assigned, queries,
        n_blocks_probe=4, beam=8, hops=2, n_entry=4,
    )
    rows = hent.collect()
    assert len(rows) == len({(r[0], r[1]) for r in rows})  # deduped

    exact = {
        (r["query_id"], r["vec_id"])
        for r in ann_ops.brute_force_topk(corpus, queries, k=10).collect()
    }

    def recall(df):
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(got & exact) / len(exact)

    hier = graphann.graph_search(
        edges, corpus, queries, k=10, beam=24, hops=3, entries=hent
    )
    flat = graphann.graph_search(
        edges, corpus, queries, k=10, beam=24, hops=3, n_entry=8
    )
    assert recall(hier) >= recall(flat) - 1e-9


def test_graph_federated_tenant_isolation_and_parity(spark, sf_dir):
    """The federated graph serve equals per-tenant `graph_search`
    (same per-tenant entry sample), and the beam can never cross
    tenants — even when the other tenant holds an IDENTICAL vector —
    because the stored edges are tenant-pure by construction."""
    from embeddingsearch_spark.operators import graphann
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    clone = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100001).alias("vec_id"),
        "embedding",
        F.lit("globex").alias("source"),
    )
    emb = emb.unionByName(clone).localCheckpoint(eager=True)
    cents = emb.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = graphann.assign_blocks_federated(
        emb, cents, partition_col="source", n_assign=2
    )
    pairs = graphann.block_pair_sims_federated(
        emb, assigned, partition_col="source"
    )
    # edges are tenant-pure: every pair's endpoints share a parity
    # (the clone id 100001 is odd = globex)
    for r in pairs.select("_ida", "_idb").collect():
        assert r["_ida"] % 2 == r["_idb"] % 2
    for t in ("_pairs", "_assigned"):
        drop_table(spark, "es_test_tgraph" + t)
    graphann.save_federated_graph_index(
        pairs, assigned, "es_test_tgraph", partition_col="source",
        n_buckets=2,
    )
    qdf = emb.filter(F.col("vec_id") < 3)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")
    got = graphann.graph_search_federated(
        spark, "es_test_tgraph", emb, queries, route, k=5, beam=12,
        hops=3, n_entry=4, m=6, partition_col="source",
    )
    got_rows = sorted(map(tuple, got.collect()))
    # parity twin: per-tenant graph over the tenant's sub-corpus with
    # the same tenant-local md5 entry sample
    want = None
    for tenant in ("acme", "globex"):
        t_emb = emb.filter(F.col("source") == tenant)
        t_pairs = pairs.filter(F.col("source") == tenant)
        t_edges = graphann.edges_from_pairs(
            t_pairs.select("_ida", "_idb", "cosine"), m=6
        )
        t_entries = graphann.entry_points(t_emb, n_entry=4)
        t_route = route.filter(F.col("source") == tenant)
        t_q = queries.join(t_route.select("query_id"), "query_id")
        init = t_q.select("query_id").crossJoin(
            t_entries.select("vec_id")
        )
        part = graphann.graph_search(
            t_edges, t_emb, t_q, k=5, beam=12, hops=3,
            entries=init,
        )
        want = part if want is None else want.unionByName(part)
    assert got_rows == sorted(map(tuple, want.collect()))
    # isolation: query 0 (acme) never reaches the globex clone of
    # its own vector — the perfect cross-tenant match
    hits0 = {r["vec_id"] for r in got.collect() if r["query_id"] == 0}
    assert 100001 not in hits0
    assert all(v % 2 == 0 for v in hits0)


def test_graph_federated_per_tenant_centroid_numbering(spark, corpus):
    """ADVICE round-6 #1: per-tenant-NUMBERED centroids (each tenant's
    blocks 0..C-1, the IVF/PQ federated convention) must still produce
    tenant-pure pairs — the candidate join keys on (tenant, block),
    not block alone — for both the one-shot build and the incremental
    upsert's delta."""
    from pyspark.sql import Window

    two = corpus.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=False)
    # both tenants number their 4 centroids 0..3 (colliding block ids)
    w = Window.partitionBy("source").orderBy("vec_id")
    cents = (
        two.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 4)
        .select(
            "source",
            (F.col("_rn") - 1).alias("centroid_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    assigned = graphann.assign_blocks_federated(two, cents, n_assign=2)
    pairs = graphann.block_pair_sims_federated(two, assigned)
    rows = pairs.collect()
    assert rows
    # tenant purity by id parity: endpoints always share a tenant
    assert all(r["_ida"] % 2 == r["_idb"] % 2 for r in rows)

    # incremental path: persist 4/5, upsert the rest, same invariant —
    # and the merged table equals the one-shot build
    from embeddingsearch_spark.storage import drop_table

    prefix = "es_test_tgraph_num"
    for t in ("_pairs", "_assigned"):
        drop_table(spark, prefix + t)
    old = two.filter(F.col("vec_id") % 5 != 0)
    batch = two.filter(F.col("vec_id") % 5 == 0)
    a_old = graphann.assign_blocks_federated(old, cents, n_assign=2)
    graphann.save_federated_graph_index(
        graphann.block_pair_sims_federated(old, a_old), a_old,
        prefix, n_buckets=2,
    )
    graphann.upsert_federated_graph_index(
        spark, prefix, two, batch, cents, n_assign=2, n_buckets=2,
    )
    got = sorted(
        (r["_ida"], r["_idb"], r["cosine"])
        for r in spark.table(prefix + "_pairs").collect()
    )
    want = sorted(
        (r["_ida"], r["_idb"], r["cosine"]) for r in rows
    )
    assert got == want


def test_retrain_federated_graph_tenants_blast_radius(spark, corpus):
    """Single-tenant graph retrain: the flagged tenant's blocks and
    pairs rebuild under new centroids (equal to a fresh per-tenant
    build); the OTHER tenant's pair-partition files stay
    byte-identical."""
    import glob
    import os

    from embeddingsearch_spark.storage import drop_table

    two = corpus.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=False)
    cents1 = two.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    ).localCheckpoint(eager=True)
    prefix = "es_test_tgraph_rt"
    for t in ("_pairs", "_assigned"):
        drop_table(spark, prefix + t)
    a1 = graphann.assign_blocks_federated(two, cents1, n_assign=2)
    graphann.save_federated_graph_index(
        graphann.block_pair_sims_federated(two, a1), a1, prefix,
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing():
        return sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(wh, prefix + "_pairs", "source=acme", "*")
            )
        )

    before = listing()
    gx = two.filter(F.col("source") == "globex")
    new_cents = gx.filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 48)
    ).select("source", F.col("vec_id").alias("centroid_id"), "embedding")
    graphann.retrain_federated_graph_tenants(
        spark, prefix, gx, new_cents, n_assign=2, n_buckets=2
    )
    assert listing() == before
    # globex's stored pairs equal a fresh build under the new quantizer
    a2 = graphann.assign_blocks_federated(gx, new_cents, n_assign=2)
    want = sorted(
        (r["_ida"], r["_idb"], r["cosine"])
        for r in graphann.block_pair_sims_federated(gx, a2).collect()
    )
    got = sorted(
        (r["_ida"], r["_idb"], r["cosine"])
        for r in spark.table(prefix + "_pairs")
        .filter(F.col("source") == "globex")
        .collect()
    )
    assert got == want and got
