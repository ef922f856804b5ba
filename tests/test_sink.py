"""The MERGE-capable index-sink seam: rewrite-path parity (upsert with
deletes equals a rebuild over the remaining rows) for all index
families, and the MERGE statement the warehouse implementation would
run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import graphann, pq, retrieval
from embeddingsearch_spark.sink import MergeSink, ParquetRewriteSink
from embeddingsearch_spark.storage import drop_table


def test_merge_sink_sql_single_and_multi_key():
    assert MergeSink.merge_sql("idx_post", ["doc_id"]) == (
        "MERGE INTO idx_post t USING _es_sink_delete_keys s "
        "ON t.`doc_id` = s.`_key` WHEN MATCHED THEN DELETE"
    )
    # the graph pair table deletes on EITHER endpoint: a pair whose
    # both endpoints are keyed matches TWO source rows — MERGE is
    # rejected for that by Delta/Iceberg, so multi-key tables emit the
    # EXISTS-style DELETE (duplicate-match safe) instead
    assert MergeSink.delete_sql(
        "g_pairs", ["_ida", "_idb"], keys_view="batch_keys"
    ) == (
        "DELETE FROM g_pairs t WHERE EXISTS "
        "(SELECT 1 FROM batch_keys s "
        "WHERE t.`_ida` = s.`_key` OR t.`_idb` = s.`_key`)"
    )
    with pytest.raises(ValueError, match="single-key only"):
        MergeSink.merge_sql("g_pairs", ["_ida", "_idb"])


def test_parquet_sink_delete_insert_semantics(spark):
    """Contract: table := old − (rows keyed by delete_keys) ∪ insert."""
    drop_table(spark, "es_test_sink_basic")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.saveAsTable("es_test_sink_basic")
    sink = ParquetRewriteSink()
    sink.delete_insert(
        spark,
        "es_test_sink_basic",
        spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"),
        ["k"],
        delete_keys=spark.createDataFrame([(2,), (3,)], "k long"),
        bucket_cols=["k"],
        n_buckets=2,
    )
    got = sorted(tuple(r) for r in spark.table("es_test_sink_basic").collect())
    assert got == [(1, "a"), (2, "B"), (4, "d")]


def test_postings_upsert_with_delete_equals_rebuild(spark):
    """upsert(changed, deleted) == build over (old − deleted ∪ changed),
    including corpus stats (N/avgdl derive from the index)."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} common filler word{i}") for i in range(20)],
        "doc_id long, text string",
    )
    old = docs.filter(F.col("doc_id") < 15)
    changed = docs.filter(
        (F.col("doc_id") >= 15) | (F.col("doc_id") == 3)
    )
    deleted = spark.createDataFrame([(1,), (4,)], "doc_id long")
    drop_table(spark, "es_test_sink_post")
    retrieval.build_postings_index(old, "es_test_sink_post", n_buckets=4)
    retrieval.upsert_postings_index(
        spark, "es_test_sink_post", changed, n_buckets=4,
        deleted_ids=deleted,
    )
    remaining = old.filter(~F.col("doc_id").isin(1, 4)).unionByName(
        changed.filter(F.col("doc_id") != 3)
    ).dropDuplicates(["doc_id"])
    drop_table(spark, "es_test_sink_post_ref")
    retrieval.build_postings_index(
        remaining, "es_test_sink_post_ref", n_buckets=4
    )
    got = sorted(tuple(r) for r in spark.table("es_test_sink_post").collect())
    want = sorted(
        tuple(r) for r in spark.table("es_test_sink_post_ref").collect()
    )
    assert got == want
    # a doc listed in BOTH changed and deleted stays deleted
    deleted2 = spark.createDataFrame([(3,)], "doc_id long")
    retrieval.upsert_postings_index(
        spark, "es_test_sink_post", changed.filter(F.col("doc_id") == 3),
        n_buckets=4, deleted_ids=deleted2,
    )
    assert (
        spark.table("es_test_sink_post")
        .filter(F.col("doc_id") == 3)
        .count()
        == 0
    )


def test_graph_upsert_with_delete_equals_rebuild(spark, sf_dir):
    corpus = tables.load(spark, sf_dir, "embeddings")
    cents = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    old = corpus.filter(F.col("vec_id") % 7 != 0)
    batch = corpus.filter(F.col("vec_id") % 7 == 0)
    deleted = corpus.filter(F.col("vec_id") % 11 == 3).select("vec_id")
    assigned_old = graphann.assign_blocks(old, cents, n_assign=2)
    pairs_old = graphann.block_pair_sims(old, assigned_old)
    drop_table(spark, "es_test_sink_graph_pairs")
    drop_table(spark, "es_test_sink_graph_assigned")
    graphann.save_graph_index(
        pairs_old, assigned_old, "es_test_sink_graph", n_buckets=4
    )
    edges = graphann.upsert_graph_index(
        spark, "es_test_sink_graph", corpus, batch, cents,
        m=6, n_assign=2, n_buckets=4, deleted_ids=deleted,
    )
    remaining = corpus.join(deleted, "vec_id", "left_anti")
    full = graphann.knn_graph(remaining, cents, m=6, n_assign=2)
    assert sorted(tuple(r) for r in edges.collect()) == sorted(
        tuple(r) for r in full.collect()
    )
    # deleted ids are gone from both persisted tables, either endpoint
    ids = {r[0] for r in deleted.collect()}
    pairs = spark.table("es_test_sink_graph_pairs")
    assert (
        pairs.filter(
            F.col("_ida").isin(*ids) | F.col("_idb").isin(*ids)
        ).count()
        == 0
    )
    assert (
        spark.table("es_test_sink_graph_assigned")
        .filter(F.col("vec_id").isin(*ids))
        .count()
        == 0
    )


def test_merge_into_graph_with_delete_equals_rebuild(spark, sf_dir):
    """The in-memory merge honors deleted_ids the same way."""
    corpus = tables.load(spark, sf_dir, "embeddings")
    cents = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    old = corpus.filter(F.col("vec_id") % 10 != 0)
    batch = corpus.filter(F.col("vec_id") % 10 == 0)
    deleted = corpus.filter(F.col("vec_id") % 9 == 2).select("vec_id")
    assigned_old = graphann.assign_blocks(old, cents, n_assign=2)
    pairs_old = graphann.block_pair_sims(old, assigned_old)
    _, _, edges = graphann.merge_into_graph(
        pairs_old, assigned_old, corpus, batch, cents,
        m=6, n_assign=2, deleted_ids=deleted,
    )
    remaining = corpus.join(deleted, "vec_id", "left_anti")
    full = graphann.knn_graph(remaining, cents, m=6, n_assign=2)
    assert sorted(tuple(r) for r in edges.collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_pq_upsert_with_delete_equals_rebuild(spark, sf_dir):
    corpus = tables.load(spark, sf_dir, "embeddings")
    train = corpus.filter(F.col("vec_id") % 5 != 4)
    batch = corpus.filter(F.col("vec_id") % 5 == 4)
    deleted = corpus.filter(F.col("vec_id") % 13 == 1).select("vec_id")
    cbs = pq.train_codebooks(train, m_sub=4, k_codes=16, iters=2)
    coded = pq.encode_pq(train, cbs)
    drop_table(spark, "es_test_sink_pq_codes")
    drop_table(spark, "es_test_sink_pq_codebooks")
    pq.save_pq_index(coded, cbs, "es_test_sink_pq", n_buckets=4)
    pq.upsert_pq_index(
        spark, "es_test_sink_pq", batch, n_buckets=4,
        deleted_ids=deleted,
    )
    remaining = corpus.join(deleted, "vec_id", "left_anti")
    want = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq.encode_pq(remaining, cbs).collect()
    )
    got = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.table("es_test_sink_pq_codes").collect()
    )
    assert got == want


def test_partitioned_postings_upsert_partition_cost(spark):
    """PartitionOverwriteSink: upsert(changed, deleted) over the
    lang-partitioned postings equals a rebuild over the remaining
    docs, an UNTOUCHED partition's files are byte-identical (never
    rewritten), and a partition whose docs are all deleted is
    dropped."""
    import glob
    import os

    docs = spark.createDataFrame(
        [
            (i, f"tok{i % 3} common w{i}",
             ["en", "de", "fr"][i % 3])
            for i in range(18)
        ],
        "doc_id long, text string, lang string",
    )
    drop_table(spark, "es_test_sink_ppost")
    retrieval.build_partitioned_postings_index(
        docs, "es_test_sink_ppost", partition_col="lang", n_buckets=2
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    fr_files = sorted(
        (os.path.basename(p), os.path.getsize(p))
        for p in glob.glob(
            os.path.join(wh, "es_test_sink_ppost", "lang=fr", "*")
        )
    )
    # batch touches en (edit doc 0, add doc 100) and deletes doc 1 (de)
    changed = spark.createDataFrame(
        [(0, "edited text now", "en"), (100, "brand new", "en")],
        "doc_id long, text string, lang string",
    )
    deleted = spark.createDataFrame([(1,)], "doc_id long")
    retrieval.upsert_partitioned_postings_index(
        spark, "es_test_sink_ppost", changed, partition_col="lang",
        n_buckets=2, deleted_ids=deleted,
    )
    remaining = (
        docs.filter(~F.col("doc_id").isin(0, 1)).unionByName(changed)
    )
    drop_table(spark, "es_test_sink_ppost_ref")
    retrieval.build_partitioned_postings_index(
        remaining, "es_test_sink_ppost_ref", partition_col="lang",
        n_buckets=2,
    )
    got = sorted(
        tuple(r) for r in spark.table("es_test_sink_ppost").collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.table("es_test_sink_ppost_ref").collect()
    )
    assert got == want
    # fr untouched: identical file listing (names + sizes)
    fr_after = sorted(
        (os.path.basename(p), os.path.getsize(p))
        for p in glob.glob(
            os.path.join(wh, "es_test_sink_ppost", "lang=fr", "*")
        )
    )
    assert fr_after == fr_files
    # delete EVERY de doc -> partition dropped entirely
    all_de = docs.filter(F.col("lang") == "de").select("doc_id")
    retrieval.upsert_partitioned_postings_index(
        spark, "es_test_sink_ppost",
        spark.createDataFrame([], "doc_id long, text string, lang string"),
        partition_col="lang", n_buckets=2, deleted_ids=all_de,
    )
    assert (
        spark.table("es_test_sink_ppost")
        .filter(F.col("lang") == "de")
        .count()
        == 0
    )
    # the dropped partition is gone from the table's partition listing
    parts = [
        r[0] for r in spark.sql(
            "SHOW PARTITIONS es_test_sink_ppost"
        ).collect()
    ]
    assert not any("lang=de" in p for p in parts), parts


def test_partitioned_upsert_moves_doc_across_partitions(spark):
    """A doc whose routing value changes leaves its old partition and
    appears in the new one."""
    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "hallo welt", "de")],
        "doc_id long, text string, lang string",
    )
    drop_table(spark, "es_test_sink_move")
    retrieval.build_partitioned_postings_index(
        docs, "es_test_sink_move", partition_col="lang", n_buckets=2
    )
    moved = spark.createDataFrame(
        [(1, "bonjour monde", "fr")],
        "doc_id long, text string, lang string",
    )
    retrieval.upsert_partitioned_postings_index(
        spark, "es_test_sink_move", moved, partition_col="lang",
        n_buckets=2,
    )
    t = spark.table("es_test_sink_move")
    assert t.filter(
        (F.col("doc_id") == 1) & (F.col("lang") == "en")
    ).count() == 0
    assert t.filter(
        (F.col("doc_id") == 1) & (F.col("lang") == "fr")
    ).count() > 0


def test_ivf_upsert_with_delete_equals_rebuild(spark, sf_dir):
    """IVF joins the delete-insert family: assign only the batch under
    the persisted centroids, delete-insert through the
    partition-overwrite seam — equals a one-shot build over the
    remaining corpus, and an untouched centroid partition's files are
    byte-identical."""
    import glob
    import os

    from embeddingsearch_spark.operators import ann as ann_ops

    corpus = tables.load(spark, sf_dir, "embeddings")
    old = corpus.filter(F.col("vec_id") % 100 != 24)
    batch = corpus.filter(F.col("vec_id") % 100 == 24)
    deleted = corpus.filter(F.col("vec_id") % 250 == 1).select("vec_id")
    cents = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for t in ("_assigned", "_centroids"):
        drop_table(spark, "es_test_sink_ivf" + t)
    ann_ops.save_ivf_index(
        ann_ops.assign_centroids(old, cents), cents,
        "es_test_sink_ivf", n_buckets=2,
    )
    # a partition neither the batch nor the deletes touch stays
    # byte-identical (names + sizes)
    assigned_all = ann_ops.assign_centroids(corpus, cents)
    touched = {
        r[0]
        for r in assigned_all.filter(
            (F.col("vec_id") % 100 == 24) | (F.col("vec_id") % 250 == 1)
        )
        .select("centroid_id")
        .distinct()
        .collect()
    }
    every = {
        r[0]
        for r in assigned_all.select("centroid_id").distinct().collect()
    }
    untouched = sorted(every - touched)
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(cid):
        return sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_sink_ivf_assigned",
                    f"centroid_id={cid}", "*",
                )
            )
        )

    before = {cid: listing(cid) for cid in untouched}
    ann_ops.upsert_ivf_index(
        spark, "es_test_sink_ivf", batch, n_buckets=2,
        deleted_ids=deleted,
    )
    remaining = corpus.join(deleted, "vec_id", "left_anti")
    want = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in ann_ops.assign_centroids(remaining, cents).collect()
    )
    got = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.table("es_test_sink_ivf_assigned").collect()
    )
    assert got == want
    assert untouched, "fixture degenerate: every partition touched"
    for cid in untouched:
        assert listing(cid) == before[cid], cid


def test_composite_partitioned_upsert_tenant_isolation(spark):
    """Composite (tenant, lang) partitioning: an upsert of ONE
    tenant's docs rewrites only that tenant's touched leaves — another
    tenant's leaf in the SAME language stays byte-identical — and the
    result equals a rebuild over the final corpus."""
    import glob
    import os

    docs = spark.createDataFrame(
        [
            (i, f"tok{i % 3} common w{i}",
             ["en", "de"][i % 2], ["acme", "globex"][i % 3 == 0])
            for i in range(16)
        ],
        "doc_id long, text string, lang string, source string",
    )
    drop_table(spark, "es_test_sink_tl")
    retrieval.build_partitioned_postings_index(
        docs, "es_test_sink_tl", partition_col=["source", "lang"],
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(src, lg):
        return sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_sink_tl",
                    f"source={src}", f"lang={lg}", "*",
                )
            )
        )

    before = {
        (s, lg): listing(s, lg)
        for s in ("acme", "globex")
        for lg in ("en", "de")
    }
    # acme/en upsert: edit doc 1 (acme, de -> en move) + add doc 100
    changed = spark.createDataFrame(
        [(1, "edited text", "en", "acme"),
         (100, "brand new", "en", "acme")],
        "doc_id long, text string, lang string, source string",
    )
    retrieval.upsert_partitioned_postings_index(
        spark, "es_test_sink_tl", changed,
        partition_col=["source", "lang"], n_buckets=2,
    )
    remaining = docs.filter(F.col("doc_id") != 1).unionByName(changed)
    drop_table(spark, "es_test_sink_tl_ref")
    retrieval.build_partitioned_postings_index(
        remaining, "es_test_sink_tl_ref",
        partition_col=["source", "lang"], n_buckets=2,
    )
    got = sorted(
        tuple(r) for r in spark.table("es_test_sink_tl").collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.table("es_test_sink_tl_ref").collect()
    )
    assert got == want
    # globex leaves untouched in BOTH languages — tenant isolation
    # holds even within the language the batch touched
    for lg in ("en", "de"):
        assert listing("globex", lg) == before[("globex", lg)], lg


def test_partitioned_positions_upsert_tenant_isolation(spark):
    """The positional index's partitioned upsert: one tenant's batch
    (edit + add + delete) rewrites only that tenant's partition —
    the other tenant's files stay byte-identical — and the result
    equals a rebuild over the final corpus."""
    import glob
    import os

    docs = spark.createDataFrame(
        [
            (i, f"tok{i % 3} common w{i}",
             ["acme", "globex"][i % 2])
            for i in range(10)
        ],
        "doc_id long, text string, source string",
    )
    drop_table(spark, "es_test_sink_pos_t")
    retrieval.build_partitioned_positions_index(
        docs, "es_test_sink_pos_t", partition_col="source",
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(src):
        return sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_sink_pos_t", f"source={src}", "*"
                )
            )
        )

    before_globex = listing("globex")
    changed = spark.createDataFrame(
        [(0, "edited words here", "acme"),
         (100, "brand new doc", "acme")],
        "doc_id long, text string, source string",
    )
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    retrieval.upsert_partitioned_positions_index(
        spark, "es_test_sink_pos_t", changed,
        partition_col="source", n_buckets=2, deleted_ids=deleted,
    )
    remaining = docs.filter(
        ~F.col("doc_id").isin(0, 2)
    ).unionByName(changed)
    drop_table(spark, "es_test_sink_pos_ref")
    retrieval.build_partitioned_positions_index(
        remaining, "es_test_sink_pos_ref", partition_col="source",
        n_buckets=2,
    )
    got = sorted(
        tuple(r)
        for r in spark.table("es_test_sink_pos_t").collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.table("es_test_sink_pos_ref").collect()
    )
    assert got == want
    assert listing("globex") == before_globex


def test_federated_ivf_upsert_tenant_isolation(spark, sf_dir):
    """The multi-tenant IVF upsert: one tenant's batch (edit + add +
    delete) rewrites only that tenant's touched cells — every other
    tenant's partition subtree stays byte-identical — and the result
    equals a rebuild over the final corpus under the same per-tenant
    quantizers."""
    import glob
    import os

    from embeddingsearch_spark.operators import ann as ann_ops

    corpus = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = corpus.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for t in ("_assigned", "_centroids"):
        drop_table(spark, "es_test_sink_tivf" + t)
    old = corpus.filter(F.col("vec_id") % 100 != 24)
    ann_ops.save_federated_ivf_index(
        ann_ops.assign_centroids_federated(old, cents),
        cents, "es_test_sink_tivf", partition_col="source",
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(src):
        return sorted(
            (os.path.relpath(p, wh), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_sink_tivf_assigned",
                    f"source={src}", "**", "*",
                ),
                recursive=True,
            )
            if os.path.isfile(p)
        )

    before_globex = listing("globex")
    # an acme-only batch: edits (vec_id % 100 == 24 are even → acme)
    # plus one delete (vec 0, acme)
    batch = corpus.filter(F.col("vec_id") % 100 == 24)
    assert batch.filter(F.col("source") != "acme").count() == 0
    deleted = spark.createDataFrame([(0,)], "vec_id long")
    ann_ops.upsert_federated_ivf_index(
        spark, "es_test_sink_tivf", batch, partition_col="source",
        n_buckets=2, deleted_ids=deleted,
    )
    remaining = corpus.filter(
        (F.col("vec_id") % 100 == 24) | (F.col("vec_id") % 100 != 24)
    ).join(deleted, "vec_id", "left_anti")
    want = sorted(
        (r["vec_id"], r["source"], r["centroid_id"])
        for r in ann_ops.assign_centroids_federated(
            remaining, cents
        ).select("vec_id", "source", "centroid_id").collect()
    )
    got = sorted(
        (r["vec_id"], r["source"], r["centroid_id"])
        for r in spark.table("es_test_sink_tivf_assigned")
        .select("vec_id", "source", "centroid_id")
        .collect()
    )
    assert got == want
    # the other tenant's subtree: byte-identical
    assert listing("globex") == before_globex


def test_federated_retrain_single_tenant_blast_radius(spark, sf_dir):
    """`retrain_federated_ivf_tenants`: re-quantizing ONE collection
    re-assigns exactly that collection (equals a fresh per-tenant
    build over its corpus with the new quantizer) while the other
    collection's centroid rows AND partition files stay untouched."""
    import glob
    import os

    from embeddingsearch_spark.operators import ann as ann_ops

    corpus = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = corpus.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for t in ("_assigned", "_centroids"):
        drop_table(spark, "es_test_retrain_tivf" + t)
    ann_ops.save_federated_ivf_index(
        ann_ops.assign_centroids_federated(corpus, cents),
        cents, "es_test_retrain_tivf", partition_col="source",
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(src):
        return sorted(
            (os.path.relpath(p, wh), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_retrain_tivf_assigned",
                    f"source={src}", "**", "*",
                ),
                recursive=True,
            )
            if os.path.isfile(p)
        )

    before_acme = listing("acme")
    # retrain globex with a DIFFERENT quantizer (ids 17..47 odd)
    gx = corpus.filter(F.col("source") == "globex")
    new_cents = gx.filter(
        (F.col("vec_id") > 16) & (F.col("vec_id") < 48)
    ).select("source", F.col("vec_id").alias("centroid_id"), "embedding")
    ann_ops.retrain_federated_ivf_tenants(
        spark, "es_test_retrain_tivf", gx, new_cents,
        partition_col="source", n_buckets=2,
    )
    # acme untouched: files byte-identical, centroid rows unchanged
    assert listing("acme") == before_acme
    kept_cents = {
        (r["source"], r["centroid_id"])
        for r in spark.table("es_test_retrain_tivf_centroids")
        .select("source", "centroid_id")
        .collect()
    }
    assert {c for c in kept_cents if c[0] == "acme"} == {
        ("acme", i) for i in range(0, 16, 2)
    }
    assert {c for c in kept_cents if c[0] == "globex"} == {
        ("globex", i) for i in range(17, 48, 2)
    }
    # globex equals a fresh assignment under the new quantizer
    want = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in ann_ops.assign_centroids_federated(
            gx, new_cents
        ).select("vec_id", "centroid_id").collect()
    )
    got = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.table("es_test_retrain_tivf_assigned")
        .filter(F.col("source") == "globex")
        .select("vec_id", "centroid_id")
        .collect()
    )
    assert got == want


def test_tenant_onboard_offboard_isolation(spark, sf_dir):
    """`onboard_tenant_ivf` / `offboard_tenant_ivf`: onboarding a new
    collection inserts ONLY its partitions (existing tenants' files
    byte-identical), re-onboarding an existing name is refused,
    offboarding drops exactly that tenant's partitions + centroid
    rows (the survivor again byte-identical), and the name can be
    onboarded again afterwards."""
    import glob
    import os

    import pytest

    from embeddingsearch_spark.operators import ann as ann_ops

    corpus = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = corpus.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for t in ("_assigned", "_centroids"):
        drop_table(spark, "es_test_lc_tivf" + t)
    acme = corpus.filter(F.col("source") == "acme")
    acme_cents = cents.filter(F.col("source") == "acme")
    ann_ops.save_federated_ivf_index(
        ann_ops.assign_centroids_federated(
            acme, acme_cents, partition_col="source"
        ),
        acme_cents, "es_test_lc_tivf", partition_col="source",
        n_buckets=2,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")

    def listing(src):
        return sorted(
            (os.path.relpath(p, wh), os.path.getsize(p))
            for p in glob.glob(
                os.path.join(
                    wh, "es_test_lc_tivf_assigned",
                    f"source={src}", "**", "*",
                ),
                recursive=True,
            )
            if os.path.isfile(p)
        )

    before_acme = listing("acme")
    gx = corpus.filter(F.col("source") == "globex")
    gx_cents = cents.filter(F.col("source") == "globex")
    ann_ops.onboard_tenant_ivf(
        spark, "es_test_lc_tivf", gx, gx_cents,
        partition_col="source", n_buckets=2,
    )
    assert listing("acme") == before_acme
    # the onboarded tenant serves like a from-scratch federated build
    want = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in ann_ops.assign_centroids_federated(
            gx, gx_cents
        ).select("vec_id", "centroid_id").collect()
    )
    got = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.table("es_test_lc_tivf_assigned")
        .filter(F.col("source") == "globex")
        .select("vec_id", "centroid_id")
        .collect()
    )
    assert got == want
    with pytest.raises(ValueError, match="already onboarded"):
        ann_ops.onboard_tenant_ivf(
            spark, "es_test_lc_tivf", gx, gx_cents,
            partition_col="source", n_buckets=2,
        )
    out = ann_ops.offboard_tenant_ivf(
        spark, "es_test_lc_tivf", "globex", partition_col="source"
    )
    assert out["partitions_dropped"] > 0
    assert out["centroids_dropped"] == gx_cents.count()
    assert listing("globex") == []
    assert listing("acme") == before_acme
    assert (
        spark.table("es_test_lc_tivf_assigned")
        .filter(F.col("source") == "globex")
        .count()
        == 0
    )
    # the name is free again
    ann_ops.onboard_tenant_ivf(
        spark, "es_test_lc_tivf", gx, gx_cents,
        partition_col="source", n_buckets=2,
    )
    assert listing("acme") == before_acme


@pytest.mark.external
def test_merge_sink_on_delta_rebuild_equivalence(tmp_path):
    """Opt-in ACID integration (round-7): a REAL `delete_insert`
    through `MergeSink` on a Delta table, including the
    duplicate-match case (both endpoints of a pair in the key set —
    the exact shape Delta rejects under a MERGE and the EXISTS-DELETE
    exists for). Runs in a subprocess so the Delta session extensions
    don't collide with the test fixture's JVM session. Skipped unless
    `delta-spark` is installed (mirrors the live-provider opt-ins);
    no production-path change."""
    pytest.importorskip("delta")
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repr(str(__import__('pathlib').Path(__file__).resolve().parents[1]))})
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession
        from embeddingsearch_spark.sink import MergeSink

        builder = (
            SparkSession.builder.appName("es-delta-it")
            .master("local[2]")
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog")
            .config("spark.sql.warehouse.dir", {repr(str(tmp_path))} + "/wh")
            .config("spark.sql.shuffle.partitions", "2")
        )
        spark = configure_spark_with_delta_pip(builder).getOrCreate()
        spark.createDataFrame(
            [(1, 2, 0.9), (1, 3, 0.8), (2, 3, 0.7), (4, 5, 0.6)],
            "_ida long, _idb long, sim double",
        ).write.format("delta").saveAsTable("g_pairs")
        # keys 1 AND 2: pair (1,2) matches BOTH -> the MERGE-rejected
        # duplicate-match shape; the EXISTS-DELETE handles it
        MergeSink().delete_insert(
            spark, "g_pairs",
            spark.createDataFrame([(1, 2, 0.95)],
                                  "_ida long, _idb long, sim double"),
            ["_ida", "_idb"],
            delete_keys=spark.createDataFrame([(1,), (2,)], "k long"),
        )
        got = sorted(tuple(r) for r in spark.table("g_pairs").collect())
        want = [(1, 2, 0.95), (4, 5, 0.6)]
        assert got == want, got
        print("DELTA_SINK_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
    )
    assert "DELTA_SINK_OK" in out.stdout, out.stderr[-2000:]
