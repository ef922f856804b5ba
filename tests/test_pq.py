"""Product quantization: encode determinism, training behavior, ADC
ranking quality against exact brute force.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import ann, pq


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # 8 loose clusters in 16-dim space so PQ codes carry real signal
    centers = rng.normal(size=(8, 16)) * 3
    rows = []
    for i in range(240):
        v = centers[i % 8] + rng.normal(size=16) * 0.4
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def test_initial_codebooks_shape(emb):
    cbs = pq.initial_codebooks(emb, m_sub=4, k_codes=8)
    assert len(cbs) == 4 and len(cbs[0]) == 8 and len(cbs[0][0]) == 4
    # code j = slices of the j-th lowest-id vector
    first = emb.orderBy("vec_id").first()
    assert cbs[0][0] == pytest.approx(list(first.embedding[:4]))
    assert cbs[3][0] == pytest.approx(list(first.embedding[12:]))


def test_initial_codebooks_rejects_bad_split(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.initial_codebooks(emb, m_sub=5)


def test_encode_deterministic_and_bounded(emb):
    cbs = pq.initial_codebooks(emb, m_sub=4, k_codes=8)
    a = {r.vec_id: r.codes for r in pq.encode_pq(emb, cbs).collect()}
    b = {r.vec_id: r.codes for r in pq.encode_pq(emb, cbs).collect()}
    assert a == b
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in a.values())
    # codewords encode to themselves (their own slice is at distance 0)
    assert a[0] == [0, 0, 0, 0]
    assert a[5] == [5, 5, 5, 5]


def test_training_reduces_quantization_error(emb):
    def recon_err(cbs):
        C = [np.array(c) for c in cbs]
        rows = emb.collect()
        err = 0.0
        coded = {r.vec_id: r.codes for r in pq.encode_pq(emb, cbs).collect()}
        for r in rows:
            v = np.array(r.embedding)
            rec = np.concatenate([C[m][coded[r.vec_id][m]] for m in range(4)])
            err += float(np.sum((v - rec) ** 2))
        return err

    cbs0 = pq.initial_codebooks(emb, m_sub=4, k_codes=8)
    cbs2 = pq.train_codebooks(emb, m_sub=4, k_codes=8, iters=2)
    assert recon_err(cbs2) < recon_err(cbs0)


def test_pq_topk_recall_vs_exact(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.brute_force_topk(emb, queries, k=10)
    cbs = pq.train_codebooks(emb, m_sub=4, k_codes=16, iters=2)
    coded = pq.encode_pq(emb, cbs)
    approx = pq.pq_topk(coded, cbs, queries, k=10)

    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    # 16 codewords x 4 subspaces on clustered data: comfortably > chance
    assert sum(recalls) / len(recalls) >= 0.6
    # the self-match (query is in the corpus) must never be lost
    for q in ex:
        assert q in ap[q]


def test_pq_topk_contract(emb):
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cbs = pq.initial_codebooks(emb, m_sub=4, k_codes=8)
    out = pq.pq_topk(pq.encode_pq(emb, cbs), cbs, queries, k=5)
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    sims = [r.cosine for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in sims)


def test_ivfpq_full_probe_equals_pq_topk(emb, spark):
    """nprobe = n_centroids probes every bucket -> identical to plain
    ADC over the whole corpus."""
    from embeddingsearch_spark.operators import ann as ann_ops

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cbs = pq.train_codebooks(emb, m_sub=4, k_codes=8, iters=1)
    cents = ann_ops.kmeans_centroids(emb, k=4, iters=1)
    coded = pq.encode_pq(
        ann_ops.assign_centroids(emb, cents), cbs
    )
    full = pq.ivfpq_topk(coded, cbs, cents, queries, k=10, nprobe=4)
    plain = pq.pq_topk(coded, cbs, queries, k=10)
    assert sorted(map(tuple, full.collect()), key=lambda t: (t[0], t[3])) == \
           sorted(map(tuple, plain.select(full.columns).collect()),
                  key=lambda t: (t[0], t[3]))


def test_ivfpq_prunes_buckets(emb, spark):
    """nprobe=1 scores only the probed bucket's rows: every result row's
    centroid assignment equals the query's nearest centroid."""
    from embeddingsearch_spark.operators import ann as ann_ops

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cbs = pq.train_codebooks(emb, m_sub=4, k_codes=8, iters=1)
    cents = ann_ops.kmeans_centroids(emb, k=4, iters=1)
    assigned = ann_ops.assign_centroids(emb, cents)
    coded = pq.encode_pq(assigned, cbs)
    out = pq.ivfpq_topk(coded, cbs, cents, queries, k=10, nprobe=1)
    probe = {
        r.query_id: r.centroid_id
        for r in ann_ops.brute_force_topk(
            cents, queries, k=1, id_col="centroid_id"
        ).collect()
    }
    cid_of = {r.vec_id: r.centroid_id for r in assigned.collect()}
    for r in out.collect():
        assert cid_of[r.vec_id] == probe[r.query_id]


def test_pq_index_persist_upsert_and_parity(emb, spark):
    """Persisted PQ index: codebooks round-trip exactly; the
    save → upsert → query-from-index path returns pq_topk's frame over
    the full corpus (codes of unchanged vectors cannot change under the
    fixed persisted codebooks)."""
    cbs = pq.train_codebooks(emb, m_sub=4, k_codes=8, iters=1)
    first = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    coded_first = pq.encode_pq(first, cbs)
    pq.save_pq_index(coded_first, cbs, "es_test_pq", n_buckets=2)
    assert pq.load_pq_codebooks(spark, "es_test_pq") == [
        [[float(x) for x in c] for c in cb] for cb in cbs
    ]
    pq.upsert_pq_index(spark, "es_test_pq", batch, n_buckets=2)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq.pq_topk_from_index(spark, "es_test_pq", qs, k=5)
    want = pq.pq_topk(pq.encode_pq(emb, cbs), cbs, qs, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # re-ingest: upserting already-present ids replaces, not duplicates
    pq.upsert_pq_index(spark, "es_test_pq", batch, n_buckets=2)
    assert spark.table("es_test_pq_codes").count() == emb.count()


def test_pq_refined_degenerates_to_brute_force(emb, spark):
    """Refine contract: with refine_factor·k covering the corpus the
    refined result IS exact brute force; at small factors refined
    recall@k >= plain ADC recall@k (exact re-ranking can only fix the
    shortlist's order)."""
    cbs = pq.train_codebooks(emb, m_sub=4, k_codes=8, iters=1)
    coded = pq.encode_pq(emb, cbs)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.brute_force_topk(emb, qs, k=5)
    full = pq.pq_topk_refined(
        coded, cbs, emb, qs, k=5, refine_factor=48  # 240 >= corpus
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, exact.collect())
    )

    def recall(df):
        want = {
            (r["query_id"], r["vec_id"]) for r in exact.collect()
        }
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(got & want) / len(want)

    plain = pq.pq_topk(coded, cbs, qs, k=5)
    refined = pq.pq_topk_refined(
        coded, cbs, emb, qs, k=5, refine_factor=4
    )
    assert recall(refined) >= recall(plain)


def test_pq_adaptive_refine_budget_envelope(emb, spark):
    """Adaptive-refine contract: an unconstrained budget (or None)
    reproduces fixed refine at deep_factor; a budget at the floor
    (every query base-only) reproduces fixed refine at base_factor;
    a mid budget widens exactly the floor(extra/[(deep-base)k])
    highest-distortion queries and stays within the read envelope
    (every per-query shortlist is base·k or deep·k)."""
    cbs = pq.train_codebooks(emb, m_sub=4, k_codes=8, iters=1)
    coded = pq.encode_pq(emb, cbs, err_col="qerr")
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    deep = pq.pq_topk_refined(
        coded, cbs, emb, qs, k=5, refine_factor=6
    )
    base = pq.pq_topk_refined(
        coded, cbs, emb, qs, k=5, refine_factor=2
    )
    # budget >= nq*deep*k (4*30=120) => all queries widen
    assert rows(
        pq.pq_topk_refined_adaptive(
            coded, cbs, emb, qs, k=5, base_factor=2,
            deep_factor=6, budget_rows=120,
        )
    ) == rows(deep)
    # budget_rows=None => all deep
    assert rows(
        pq.pq_topk_refined_adaptive(
            coded, cbs, emb, qs, k=5, base_factor=2, deep_factor=6,
        )
    ) == rows(deep)
    # budget == floor (4*10=40) => nothing widens
    assert rows(
        pq.pq_topk_refined_adaptive(
            coded, cbs, emb, qs, k=5, base_factor=2,
            deep_factor=6, budget_rows=40,
        )
    ) == rows(base)
    # mid budget 60: floor 40 + one 20-row widening => exactly the
    # single highest-distortion query deepens; result rows stay k per
    # query and within the {base,deep} envelope per query
    mid = pq.pq_topk_refined_adaptive(
        coded, cbs, emb, qs, k=5, base_factor=2,
        deep_factor=6, budget_rows=60,
    )
    got = mid.groupBy("query_id").count().collect()
    assert len(got) == 4 and all(r["count"] == 5 for r in got)


def test_pq_adaptive_refine_validates_factors(emb):
    cbs = pq.initial_codebooks(emb, m_sub=4, k_codes=8)
    coded = pq.encode_pq(emb, cbs, err_col="qerr")
    qs = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        pq.pq_topk_refined_adaptive(
            coded, cbs, coded, qs, base_factor=4, deep_factor=2
        )


def test_pq_federated_single_tenant_parity(emb, spark):
    """One-collection corpus: the federated codebook seed, encode, and
    serve all equal their single-corpus twins."""
    one = emb.withColumn("source", F.lit("acme"))
    cbs = pq.initial_codebooks(emb, m_sub=4, k_codes=8)
    cbs_by = pq.initial_codebooks_federated(
        one, partition_col="source", m_sub=4, k_codes=8
    )
    assert list(cbs_by) == ["acme"]
    assert cbs_by["acme"] == cbs
    plain = {
        r["vec_id"]: list(r["codes"])
        for r in pq.encode_pq(emb, cbs).select("vec_id", "codes").collect()
    }
    fed = {
        r["vec_id"]: list(r["codes"])
        for r in pq.encode_pq_federated(
            one, cbs_by, partition_col="source"
        ).select("vec_id", "codes").collect()
    }
    assert fed == plain


def test_pq_federated_tenant_isolation_and_upsert(emb, spark):
    """The federated PQ serve equals per-tenant `pq_topk` (own
    codebooks, own codes), a query never scores another tenant's
    vectors, and the partitioned upsert leaves the other tenant's
    code files byte-identical."""
    import glob
    import os

    from embeddingsearch_spark.storage import drop_table

    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cbs_by = pq.initial_codebooks_federated(
        two, partition_col="source", m_sub=4, k_codes=8
    )
    coded = pq.encode_pq_federated(
        two, cbs_by, partition_col="source"
    ).localCheckpoint(eager=True)
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_test_tpq" + t)
    pq.save_federated_pq_index(
        coded, cbs_by, "es_test_tpq", partition_col="source",
        n_buckets=2,
    )
    qdf = two.filter(F.col("vec_id") < 3)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")
    got = pq.pq_federated_from_index(
        spark, "es_test_tpq", queries, route, k=5,
        partition_col="source",
    )
    want = None
    for tenant in ("acme", "globex"):
        t_coded = coded.filter(F.col("source") == tenant)
        t_qids = [
            r["query_id"]
            for r in route.filter(F.col("source") == tenant).collect()
        ]
        part = pq.pq_topk(
            t_coded, cbs_by[tenant],
            queries.filter(F.col("query_id").isin(t_qids)),
            k=5,
        )
        want = part if want is None else want.unionByName(part)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # isolation by parity: results stay within the query's tenant
    for r in got.collect():
        assert r["vec_id"] % 2 == r["query_id"] % 2
    # upsert: an acme batch leaves globex's files byte-identical and
    # equals re-encoding the final corpus
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(src):
        return sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_tpq_codes", f"source={src}", "*"
                )
            )
        )

    before_globex = listing("globex")
    batch = two.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        "embedding",
        "source",
    )
    deleted = spark.createDataFrame([(2,)], "vec_id long")
    pq.upsert_federated_pq_index(
        spark, "es_test_tpq", batch, partition_col="source",
        n_buckets=2, deleted_ids=deleted,
    )
    assert listing("globex") == before_globex
    remaining = two.filter(F.col("vec_id") != 2).unionByName(batch)
    want2 = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq.encode_pq_federated(
            remaining, cbs_by, partition_col="source"
        ).select("vec_id", "codes").collect()
    )
    got2 = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.table("es_test_tpq_codes")
        .select("vec_id", "codes")
        .collect()
    )
    assert got2 == want2


def test_pq_federated_refined_exact_and_tenant_pure(emb, spark):
    """The federated refine stage: with refine_factor*k >= the
    per-tenant corpus the refined serve degenerates to PER-TENANT
    exact brute force (the `pq_topk_refined` contract, tenant-scoped),
    results never leave the query's tenant, and at a small factor the
    refined recall@k >= the ADC-only serve's (refine can only buy
    quality back)."""
    from embeddingsearch_spark.storage import drop_table

    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=False)
    cbs_by = pq.initial_codebooks_federated(
        two, partition_col="source", m_sub=4, k_codes=8
    )
    coded = pq.encode_pq_federated(two, cbs_by, partition_col="source")
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_test_tpqr" + t)
    pq.save_federated_pq_index(
        coded, cbs_by, "es_test_tpqr", partition_col="source",
        n_buckets=2,
    )
    qdf = two.filter(F.col("vec_id") < 3)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")
    # 240 rows / 2 tenants = 120 <= 40*5 -> degenerates to exact
    got = pq.pq_federated_refined(
        spark, "es_test_tpqr", two, queries, route, k=5,
        refine_factor=40, partition_col="source",
    ).localCheckpoint(eager=False)
    want = None
    for tenant in ("acme", "globex"):
        t_emb = two.filter(F.col("source") == tenant)
        t_qids = [
            r["query_id"]
            for r in route.filter(F.col("source") == tenant).collect()
        ]
        part = ann.brute_force_topk(
            t_emb, queries.filter(F.col("query_id").isin(t_qids)), k=5
        )
        want = part if want is None else want.unionByName(part)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    for r in got.collect():
        assert r["vec_id"] % 2 == r["query_id"] % 2
    # refined-at-small-factor recall >= ADC-only recall
    adc = pq.pq_federated_from_index(
        spark, "es_test_tpqr", queries, route, k=5,
        partition_col="source",
    )
    ref = pq.pq_federated_refined(
        spark, "es_test_tpqr", two, queries, route, k=5,
        refine_factor=4, partition_col="source",
    )
    r_adc = ann.ann_recall(adc, want, k=5).agg(
        F.avg("recall")
    ).collect()[0][0]
    r_ref = ann.ann_recall(ref, want, k=5).agg(
        F.avg("recall")
    ).collect()[0][0]
    assert r_ref >= r_adc


def test_pq_federated_adaptive_budget_envelope(emb, spark):
    """Federated adaptive refine: budget=None equals the fixed refine
    at deep_factor (allocation degenerates to widen-everyone); a
    floor-only budget equals the fixed refine at base_factor; and an
    err-carrying upsert keeps the codes table schema intact."""
    from embeddingsearch_spark.storage import drop_table

    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=False)
    cbs_by = pq.initial_codebooks_federated(
        two, partition_col="source", m_sub=4, k_codes=8
    )
    coded = pq.encode_pq_federated(
        two, cbs_by, partition_col="source", err_col="qerr"
    )
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_test_tpqa" + t)
    pq.save_federated_pq_index(
        coded, cbs_by, "es_test_tpqa", partition_col="source",
        n_buckets=2, err_col="qerr",
    )
    qdf = two.filter(F.col("vec_id") < 3)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    unbudgeted = pq.pq_federated_refined_adaptive(
        spark, "es_test_tpqa", two, queries, route, k=5,
        base_factor=2, deep_factor=6, budget_rows=None,
    )
    fixed_deep = pq.pq_federated_refined(
        spark, "es_test_tpqa", two, queries, route, k=5,
        refine_factor=6,
    )
    assert rows(unbudgeted) == rows(fixed_deep)
    floor_only = pq.pq_federated_refined_adaptive(
        spark, "es_test_tpqa", two, queries, route, k=5,
        base_factor=2, deep_factor=6, budget_rows=0,
    )
    fixed_base = pq.pq_federated_refined(
        spark, "es_test_tpqa", two, queries, route, k=5,
        refine_factor=2,
    )
    assert rows(floor_only) == rows(fixed_base)
    # err-carrying upsert: batch rows land with the same schema and
    # the recomputed error
    batch = two.filter(F.col("vec_id") == 1).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding", "source"
    )
    pq.upsert_federated_pq_index(
        spark, "es_test_tpqa", batch, partition_col="source",
        n_buckets=2, err_col="qerr",
    )
    got = spark.table("es_test_tpqa_codes").filter(
        F.col("vec_id") == 5001
    ).collect()
    assert len(got) == 1 and got[0]["qerr"] is not None
    # missing err column fails loudly
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_test_tpqn" + t)
    pq.save_federated_pq_index(
        pq.encode_pq_federated(two, cbs_by, partition_col="source"),
        cbs_by, "es_test_tpqn", partition_col="source", n_buckets=2,
    )
    with pytest.raises(ValueError, match="lacks 'qerr'"):
        pq.pq_federated_refined_adaptive(
            spark, "es_test_tpqn", two, queries, route, k=5
        ).collect()


def test_pq_config_for_probe_anchors():
    """The auto-config rule reproduces the BASELINE.md probe anchors
    and is monotone in the corpus size."""
    a = pq.pq_config_for(250, dim=64)
    assert a == {"m_sub": 8, "k_codes": 16, "refine_factor": 16}
    b = pq.pq_config_for(2500, dim=64)
    assert b["k_codes"] == 64
    c = pq.pq_config_for(1_000_000, dim=64)
    assert c["k_codes"] == 256  # byte-per-subspace ceiling
    ks = [
        pq.pq_config_for(n, dim=64)["k_codes"]
        for n in (10, 100, 1000, 10_000, 100_000)
    ]
    assert ks == sorted(ks)
    assert pq.pq_config_for(100, dim=16)["m_sub"] == 2


def test_pq_federated_per_tenant_budget_isolation(emb, spark):
    """Per-tenant budgets: one tenant's huge budget never changes the
    other tenant's allocation (each collection competes only for its
    own raw-vector budget), and a routed tenant missing from the map
    fails loudly."""
    from embeddingsearch_spark.storage import drop_table

    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=False)
    cbs_by = pq.initial_codebooks_federated(
        two, partition_col="source", m_sub=4, k_codes=8
    )
    coded = pq.encode_pq_federated(
        two, cbs_by, partition_col="source", err_col="qerr"
    )
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_test_tpqbud" + t)
    pq.save_federated_pq_index(
        coded, cbs_by, "es_test_tpqbud", partition_col="source",
        n_buckets=2, err_col="qerr",
    )
    qdf = two.filter(F.col("vec_id") < 6)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")

    def serve(buds):
        return sorted(
            map(
                tuple,
                pq.pq_federated_refined_adaptive(
                    spark, "es_test_tpqbud", two, queries, route,
                    k=5, base_factor=2, deep_factor=6,
                    budget_rows=buds,
                )
                .join(route, "query_id")
                .filter(F.col("source") == "globex")
                .drop("source")
                .collect(),
            )
        )

    # globex's results are identical whether acme's budget is tiny or
    # huge — allocation is per collection
    a = serve({"acme": 0, "globex": 60})
    b = serve({"acme": 10_000, "globex": 60})
    assert a == b and a
    with pytest.raises(ValueError, match="no budget for routed"):
        pq.pq_federated_refined_adaptive(
            spark, "es_test_tpqbud", two, queries, route, k=5,
            budget_rows={"acme": 100},
        )


def test_initial_codebooks_federated_per_tenant_k(emb, spark):
    """{tenant: K} sizing: each collection's codebooks hold ITS K
    lowest-id vectors' slices; tenants missing from the map are
    dropped (the no-codebooks-no-encode contract)."""
    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cbs = pq.initial_codebooks_federated(
        two, m_sub=4, k_codes={"acme": 8, "globex": 4}
    )
    assert len(cbs["acme"][0]) == 8 and len(cbs["globex"][0]) == 4
    # per-tenant K equals the uniform-K build truncated per tenant
    uni = pq.initial_codebooks_federated(two, m_sub=4, k_codes=8)
    assert cbs["acme"] == uni["acme"]
    assert cbs["globex"] == [m[:4] for m in uni["globex"]]
    only = pq.initial_codebooks_federated(
        two, m_sub=4, k_codes={"acme": 8}
    )
    assert set(only) == {"acme"}


def test_retrain_federated_pq_tenants_blast_radius(emb, spark):
    """Single-tenant PQ retrain: the flagged tenant's codebooks and
    codes swap to the new quantizer; the OTHER tenant's codebook rows
    and code partition files stay byte-identical."""
    import glob
    import os

    from embeddingsearch_spark.storage import drop_table

    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=False)
    cbs1 = pq.initial_codebooks_federated(
        two, partition_col="source", m_sub=4, k_codes=8
    )
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_test_pqrt" + t)
    pq.save_federated_pq_index(
        pq.encode_pq_federated(two, cbs1), cbs1, "es_test_pqrt",
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    before = sorted(
        (os.path.basename(p), os.path.getsize(p))
        for p in glob.glob(
            os.path.join(wh, "es_test_pqrt_codes", "source=acme", "*")
        )
    )
    # globex retrains under a DIFFERENT seed (8 highest-id vectors)
    gx = two.filter(F.col("source") == "globex")
    hi = gx.orderBy(F.col("vec_id").desc()).limit(8).select(
        "vec_id"
    )
    new_cbs = pq.initial_codebooks_federated(
        gx.join(hi, "vec_id"), partition_col="source",
        m_sub=4, k_codes=8,
    )
    pq.retrain_federated_pq_tenants(
        spark, "es_test_pqrt", gx, new_cbs, n_buckets=2
    )
    after = sorted(
        (os.path.basename(p), os.path.getsize(p))
        for p in glob.glob(
            os.path.join(wh, "es_test_pqrt_codes", "source=acme", "*")
        )
    )
    assert after == before
    # acme's codebook rows untouched; globex's replaced
    cb = spark.table("es_test_pqrt_codebooks")
    acme_rows = sorted(
        (r["m"], r["code"], tuple(r["centroid"]))
        for r in cb.filter(F.col("source") == "acme").collect()
    )
    want_acme = sorted(
        (m, j, tuple(c))
        for m, sub in enumerate(cbs1["acme"])
        for j, c in enumerate(sub)
    )
    assert acme_rows == want_acme
    # globex codes equal a fresh encode under the NEW codebooks
    got = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.table("es_test_pqrt_codes")
        .filter(F.col("source") == "globex")
        .collect()
    )
    want = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq.encode_pq_federated(gx, new_cbs).collect()
    )
    assert got == want
