"""Physical-plan regression tests: pin the scale-critical properties so a
refactor can't silently turn a broadcast join into a shuffle join, lose
predicate pushdown, or add exchanges. These are the properties that decide
whether a query survives a 100x scale-up."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import ann as ann_ops
from embeddingsearch_spark.operators import search as so
from embeddingsearch_spark.operators import sessions
from embeddingsearch_spark.plans import inspect as pi

SF = "/root/testdata/sf0.001"


def test_search_plan_broadcasts_queries_two_shuffles(spark):
    """The cascade: query side broadcasts (J4 — never shuffle the corpus
    for the join), and exactly 2 exchanges exist: the wide-key dp agg,
    then ONE (searchdomain, query) repartition shared by the entity agg
    (subset hash partitioning satisfies its clustering) and the ranking
    window (exact match). Scale-probed at N=250 (500k corpus rows):
    same shape, BroadcastHashJoin kept, no SortMergeJoin
    (BASELINE.md scale-probe table)."""
    corpus = tables.derive_corpus(spark, SF)
    queries = tables.derive_queries(spark, SF)
    s = so.search(corpus, queries)
    pi.assert_broadcast_join(s)
    assert pi.count_shuffles(s) == 2


def test_pricing_filter_and_columns_reach_scan(spark):
    """Predicate pushdown + column pruning on the lineitem scan."""
    li = tables.load(spark, SF, "lineitem")
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    pi.assert_pushed_filter(q, "l_shipdate")
    read = pi.read_schema_columns(q)
    assert read == {"l_shipdate", "l_returnflag", "l_quantity"}, read


def test_brute_force_topk_broadcasts_queries(spark):
    emb = tables.load(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = ann_ops.brute_force_topk(emb, qs, k=5)
    pi.assert_broadcast_join(topk)
    # corpus scan + per-query top-k window: one exchange for the window
    assert pi.count_shuffles(topk) == 1


def test_sessionize_single_exchange_reused_by_rollup(spark):
    """Window partition key prefixes the groupBy key → the per-session
    rollup reuses the window's exchange; exactly one shuffle total."""
    ev = tables.load(spark, SF, "events")
    stats = sessions.session_stats(ev)
    assert pi.count_shuffles(stats) == 1


def test_centroid_assignment_zero_shuffle(spark):
    """IVF build: nearest-centroid assignment is a pure scan-stage
    expression (literal centroid array) — no exchange at any corpus size."""
    emb = tables.load(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids(emb, cents)
    assert pi.count_shuffles(assigned) == 0


def test_partition_pruning_on_saved_index(spark, tmp_path):
    """Engine.save writes partitioned by searchdomain; a searchdomain
    filter must prune partitions (PartitionFilters at the scan), so a
    per-domain query at 100 TB opens only that domain's files."""
    corpus = tables.derive_corpus(spark, SF)
    path = str(tmp_path / "index_flat")
    corpus.write.partitionBy("searchdomain").parquet(path)
    loaded = spark.read.parquet(path)
    q = loaded.filter(F.col("searchdomain") == "sd_0")
    pi.assert_partition_pruned(q)
    # and the data files of sd_1 are not in the scan's selected partitions
    assert q.count() == corpus.filter(F.col("searchdomain") == "sd_0").count()


def test_bucketed_join_zero_exchange(spark, tmp_path):
    """Both sides bucketed by the join key → SortMergeJoin with NO
    Exchange: the 100-TB co-located join layout (storage.save_bucketed)."""
    from embeddingsearch_spark import storage

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS es_bucket_test LOCATION '{tmp_path}/wh'"
    )
    try:
        left = tables.load(spark, SF, "embeddings").select("vec_id", "label")
        right = tables.load(spark, SF, "embeddings").select(
            "vec_id", F.size("embedding").alias("dim")
        )
        storage.save_bucketed(left, "es_bucket_test.ta", ["vec_id"], 4)
        storage.save_bucketed(right, "es_bucket_test.tb", ["vec_id"], 4)
        j = spark.table("es_bucket_test.ta").join(
            spark.table("es_bucket_test.tb"), "vec_id"
        )
        assert pi.count_shuffles(j) == 0
        assert j.count() == left.count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS es_bucket_test CASCADE")


def test_search_runs_in_codegen_stages(spark):
    """The scoring pipeline must run inside WholeStageCodegen spans (the
    similarity kernels are Catalyst expressions, not Python UDFs)."""
    corpus = tables.derive_corpus(spark, SF)
    queries = tables.derive_queries(spark, SF)
    s = so.search(corpus, queries)
    assert pi.codegen_stage_count(s, execute=True) >= 3


def test_pivot_two_bounded_shuffles(spark):
    """Pivot with a declared value set: no distinct-discovery pass —
    exactly the two exchanges of Spark's pivot (pre-agg on (day, type),
    pivotfirst on day over the reduced aggregate)."""
    from embeddingsearch_spark.suite.relational import q_events_pivot

    assert pi.count_shuffles(q_events_pivot(spark, SF)) == 2


def test_training_corpus_two_shuffles(spark):
    """The composed prep pipeline (dedup agg + final rollup): every other
    stage is scan-side. Join of keeper ids back to docs rides the dedup
    exchange (AQE may broadcast it; either way ≤3 exchanges)."""
    from embeddingsearch_spark.suite.textops import q_training_corpus

    assert pi.count_shuffles(q_training_corpus(spark, SF)) <= 3


def test_interval_join_is_hash_join(spark):
    """The binned interval join must plan as an equi-join (hash/SMJ),
    never a nested loop."""
    from embeddingsearch_spark.suite.windowops import q_purchase_view_window

    plan = pi.physical_plan(q_purchase_view_window(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_redact_zero_shuffle(spark):
    """Redaction is pure scan-stage regex work — any Exchange means a
    refactor broke it."""
    from embeddingsearch_spark.suite.textops import q_pii_redact

    assert pi.count_shuffles(q_pii_redact(spark, SF)) == 0


def test_corpus_mix_zero_shuffle(spark):
    """Weighted mixing is a CASE literal + hash filter + explode — all
    scan-stage."""
    from embeddingsearch_spark.suite.textops import q_corpus_mix

    assert pi.count_shuffles(q_corpus_mix(spark, SF)) == 0


def test_seq_pack_single_shuffle(spark):
    """Packing shuffles (id, n_tokens) by shard exactly once; document
    text must never enter the exchange."""
    from embeddingsearch_spark.suite.textops import q_seq_pack

    df = q_seq_pack(spark, SF)
    assert pi.count_shuffles(df) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the exchange partitions on shard, and the projection feeding it
    # carries only (shard, doc_id, n_tokens) — text stays in the scan
    assert "hashpartitioning(shard" in plan
    feeding = plan.split("Exchange hashpartitioning")[1].split("\n")[1]
    assert "text" not in feeding


def test_tfidf_no_cartesian_and_bounded_shuffles(spark):
    """TF-IDF: the corpus-size 1-row aggregate must enter as a broadcast
    (never a cartesian product), and the shuffle budget stays bounded
    (tf agg + df agg + df join + rank window over the dual tf lineage)."""
    from embeddingsearch_spark.operators import tfidf

    docs = tables.load(spark, SF, "documents")
    q = tfidf.tfidf_top_terms(docs, k=3)
    plan = pi.simple_plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert pi.count_shuffles(q) <= 5


def test_dup_spans_no_distinct_expansion(spark):
    """Duplicate-span profile: shared-key detection must be a plain
    two-level count over the (doc, key) pre-aggregate — no count_distinct
    Expand node (which would double the span stream) — and the span keys
    must be fixed-width md5 prefixes, not raw gram text."""
    from embeddingsearch_spark.operators import dedup as dd

    docs = tables.load(spark, SF, "documents")
    q = dd.duplicate_span_profile(docs, n=8)
    plan = pi.simple_plan(q)
    assert "Expand" not in plan
    assert "md5" in plan
    assert pi.count_shuffles(q) <= 6


def test_pq_encode_zero_shuffle(spark):
    """PQ encode is a pure scan-stage map — vectors never shuffle to get
    their codes."""
    from embeddingsearch_spark.operators import pq

    emb = tables.load(spark, SF, "embeddings")
    cbs = pq.initial_codebooks(emb, m_sub=8, k_codes=16)
    coded = pq.encode_pq(emb, cbs)
    assert pi.count_shuffles(coded) == 0


def test_pq_topk_single_shuffle_codes_only(spark):
    """ADC scan reads only (id, codes): one exchange for the global rank
    window over per-batch top-k partials; the embedding column is pruned
    from the scoring scan."""
    from embeddingsearch_spark.operators import pq

    emb = tables.load(spark, SF, "embeddings")
    cbs = pq.initial_codebooks(emb, m_sub=8, k_codes=16)
    coded = pq.encode_pq(emb, cbs)
    qs = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = pq.pq_topk(coded, cbs, qs, k=5)
    assert pi.count_shuffles(topk) == 1


def test_bloom_probe_broadcasts_words(spark):
    """The Bloom word table joins broadcast — the incoming batch is never
    shuffled to discover definite-new rows."""
    from embeddingsearch_spark.operators import dedup

    docs = tables.load(spark, SF, "documents").select("doc_id", "text")
    inc = docs.select((F.col("doc_id") + 9000).alias("doc_id"), "text")
    out = dedup.incremental_new_docs_bloom(inc, docs, "doc_id", "text")
    pi.assert_broadcast_join(out)


def test_cms_build_single_shuffle(spark):
    """CMS build: scan-side explode + ONE map-side-combinable groupBy."""
    from embeddingsearch_spark.operators import sketches as sk

    docs = tables.load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    cms = sk.cms_build(docs, "tok", depth=4, width=1024)
    assert pi.count_shuffles(cms) == 1


def test_cms_estimate_broadcasts_sketch(spark):
    from embeddingsearch_spark.operators import sketches as sk

    docs = tables.load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    cms = sk.cms_build(docs, "tok", depth=4, width=1024)
    cand = docs.limit(20).distinct()
    est = sk.cms_estimate(cms, cand, "tok", depth=4, width=1024)
    pi.assert_broadcast_join(est)


def test_gram_upper_single_shuffle(spark):
    """PCA Gramian: per-batch partials + one (i, j) groupBy — the corpus
    itself never shuffles."""
    from embeddingsearch_spark.operators import pca

    emb = tables.load(spark, SF, "embeddings")
    g = pca.gram_upper(emb, means=[0.0] * 64)
    assert pi.count_shuffles(g) == 1


def test_incremental_neardup_no_cartesian(spark):
    """The near-dup gate candidates come from a band equi-join — never a
    cartesian/nested-loop between the corpora."""
    from embeddingsearch_spark.operators import dedup

    docs = tables.load(spark, SF, "documents").select("doc_id", "text")
    inc = docs.limit(50).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    out = dedup.incremental_neardup(inc, docs, "doc_id", "text")
    plan = pi.physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_profile_no_window_no_sort(spark):
    """Winnow selection happens scan-side in array expressions: the plan
    must contain NO Window operator and NO global Sort — only hash
    aggregates over the selected-fingerprint stream (plus their
    exchanges) and broadcast-able joins."""
    from embeddingsearch_spark.operators import winnow as wn

    docs = tables.load(spark, SF, "documents")
    df = wn.winnow_profile(docs, "doc_id", "text")
    plan = pi.physical_plan(df)
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_remove_duplicate_spans_text_never_shuffles(spark):
    """The cleaned-corpus rewrite must not shuffle token text: every
    Exchange's output carries only ids, positions, and fixed-width keys
    (the raw text column re-enters AFTER the joins, from the scan)."""
    from embeddingsearch_spark.operators import dedup as dd

    docs = tables.load(spark, SF, "documents")
    df = dd.remove_duplicate_spans(docs, "doc_id", "text", n=8)
    plan = pi.physical_plan(df)
    # the only allowed occurrences of the token array in exchange inputs
    # are scan-stage; a '_toks' attribute inside hashpartitioning output
    # would mean the text is riding a shuffle
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_toks" not in line and "text" not in line, line


def test_oov_profile_vocab_broadcasts(spark):
    """The top-V vocabulary is a broadcast artifact — the token stream
    must never shuffle for the vocab join."""
    from embeddingsearch_spark.operators import tfidf as tf

    docs = tables.load(spark, SF, "documents")
    df = tf.oov_profile(docs, vocab_size=16)
    pi.assert_broadcast_join(df)
    assert "TakeOrderedAndProject" in pi.physical_plan(df)


def test_prototype_prune_broadcast_centroids_one_window_shuffle(spark):
    """Assignment is scan-stage (no join for it); the centroid-sim join
    broadcasts the tiny centroid table; the only hash exchange feeds the
    per-cluster rank window."""
    emb = tables.load(spark, SF, "embeddings")
    df = ann_ops.prototype_prune(emb, k=4, keep_frac=0.5)
    plan = pi.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    n_hash_ex = sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )
    assert n_hash_ex <= 1, plan


def test_perplexity_buckets_no_global_sort_window(spark):
    """The ntile cut must NOT be a single-partition Window: rank comes
    from the range-partitioned two-pass machinery, so no Window operator
    appears and no Exchange SinglePartition feeds a sort."""
    from embeddingsearch_spark.operators import lmscore

    docs = tables.load(spark, SF, "documents")
    df = lmscore.perplexity_buckets(
        docs, "doc_id", "text", n_buckets=3, vocab_size=100
    )
    plan = pi.physical_plan(df)
    assert "Window" not in plan, plan


def test_media_dhash_binary_never_shuffles(spark):
    """The dhash plan is scan → mapInPandas (resize) → project: zero
    exchanges; the hash-banding join in dhash_neardup_pairs shuffles only
    (id, hash, band) rows."""
    from embeddingsearch_spark.operators import multimodal as mm
    from embeddingsearch_spark.suite.multimodalops import derive_media

    media = derive_media(spark, SF)
    hashes = mm.media_dhash(media, grid=7, decoder="fake")
    plan = pi.physical_plan(hashes)
    assert "Exchange" not in plan, plan
    pairs = mm.dhash_neardup_pairs(hashes)
    pplan = pi.physical_plan(pairs)
    for line in pplan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "content" not in line, line


def test_html_extract_and_normalize_zero_shuffle(spark):
    """The regex extraction/normalization chain is pure scan-stage:
    no exchanges at all."""
    from embeddingsearch_spark.functions.text import (
        clean_web_text,
        html_to_text,
    )

    docs = tables.load(spark, SF, "documents")
    df = docs.select(
        "doc_id",
        html_to_text(F.col("text")).alias("a"),
        clean_web_text(F.col("text")).alias("b"),
    )
    assert "Exchange" not in pi.physical_plan(df)


def test_bigram_lm_broadcasts_small_tables(spark):
    """The doc bigram stream joins c2 without being broadcast itself;
    c1 and the vocab go in as broadcast joins; no cartesian product."""
    from embeddingsearch_spark.operators import lmscore

    docs = tables.load(spark, SF, "documents")
    df = lmscore.bigram_scores(docs, "doc_id", "text", vocab_size=100)
    plan = pi.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_minhash_estimate_joins_signatures_not_shingles(spark):
    """The estimate's exchanges carry signature/id columns only — the
    shingle column must not ride any hash exchange after the signature
    aggregation."""
    from embeddingsearch_spark.operators import dedup as dd

    docs = tables.load(spark, SF, "documents")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", k=8)
    pairs = dd.lsh_candidate_pairs(sigs, "doc_id", k=8, bands=4)
    df = dd.minhash_jaccard_estimate(sigs, pairs, "doc_id", k=8)
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "shingle" not in line, line


def test_lang_id_model_broadcasts_model_bounded_scans(spark):
    """The NB model join must be a broadcast (the dense model is L×V by
    construction) and training must not replay the gram explode per
    aggregate. Post round-11 setup/serve seam the combined gate trains
    AND persists the two model tables, then the serve leg reads them
    back — so the combined plan carries the pre-seam 8 corpus scans
    plus exactly 2 persisted-model-table scans (the intended serve
    shape); 12+ corpus scans would mean the checkpoint pin regressed."""
    from embeddingsearch_spark.suite.textops import q_lang_id_model

    df = q_lang_id_model(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert plan.count("Scan parquet") <= 10, plan.count("Scan parquet")
    assert "CartesianProduct" not in plan
    # the per-doc argmax is folded into the (doc, lang) aggregation via
    # min_by — a regression to a rank window would add a Window + sort
    assert "Window" not in plan, "argmax must not use a rank window"


def test_curation_pipeline_linear_plan(spark):
    """Regression pin for the exponential-lineage fix: the 6-stage
    composed pipeline must stay at one-corpus-pass-per-stage (the
    pre-execution plan renders checkpoint subtrees inline, so the bound
    is loose). Unpinned decision frames exploded this exact plan to
    6,948 parquet scans."""
    from embeddingsearch_spark.suite.cleanops import q_curation_pipeline

    df = q_curation_pipeline(spark, SF)
    plan = pi.physical_plan(df)
    scans = plan.count("Scan parquet")
    assert scans <= 50, scans
    assert "CartesianProduct" not in plan


def test_media_asset_pool_single_scan_no_join(spark):
    """Frame explode + featurize + pool is one scan-side chain and one
    aggregation — media bytes never join or shuffle."""
    from embeddingsearch_spark.suite.multimodalops import (
        q_media_asset_pool,
    )

    df = q_media_asset_pool(spark, SF)
    plan = pi.physical_plan(df)
    # AQE pre-execution rendering may repeat the scan node once
    assert plan.count("Scan parquet") <= 2, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join not in plan, join


def test_bm25_broadcasts_query_terms_no_cartesian(spark):
    """The postings semi-join against the query-term set must broadcast
    (the corpus never shuffles for the match), and nothing degenerates
    to a cartesian product."""
    from embeddingsearch_spark.suite.retrievalops import q_bm25_topk

    df = q_bm25_topk(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_bm25_single_corpus_scan(spark):
    """BM25 scans the corpus ONCE: N/avgdl derive from the pinned
    postings frame (its distinct (id, dl) projection), not a separate
    length pass. The stats collect() materializes the checkpoint, so
    the returned plan reads the postings RDD — zero parquet scans —
    and the postings frame itself is exactly one scan."""
    from embeddingsearch_spark.operators import retrieval

    docs = tables.load(spark, SF, "documents")
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    post_plan = pi.physical_plan(
        retrieval._postings(docs, "doc_id", "text", include_empty=True)
    )
    # formatted rendering lists the single scan node twice (tree +
    # details); one scan NODE is the invariant
    assert post_plan.count("Scan parquet") <= 2, post_plan
    df = retrieval.bm25_topk(docs, queries, k=10)
    plan = pi.physical_plan(df)
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan


def test_bm25_lang_routed_broadcasts_model_and_pred(spark):
    """The routing composition: NB model and per-query predictions
    broadcast; no cartesian product sneaks in."""
    from embeddingsearch_spark.suite.retrievalops import (
        q_bm25_lang_routed,
    )

    df = q_bm25_lang_routed(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_search_snippets_multi_no_cartesian(spark):
    """Two greedy rounds stay join+window work — no self-join of the
    hit stream, no cartesian."""
    from embeddingsearch_spark.suite.retrievalops import (
        q_search_snippets_multi,
    )

    df = q_search_snippets_multi(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_graph_ann_filtered_no_cartesian(spark):
    """Filtered beam search: the allowed-id restriction is a semi
    join, never a cartesian; entry fan-out stays a broadcast."""
    from embeddingsearch_spark.suite.ann import q_graph_ann_filtered

    df = q_graph_ann_filtered(spark, SF)
    plan = pi.physical_plan(df)
    assert "CartesianProduct" not in plan


def test_rerank_hash_pipeline_no_cartesian(spark):
    from embeddingsearch_spark.suite.retrievalops import (
        q_rerank_hash_topk,
    )

    df = q_rerank_hash_topk(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_bm25_wand_broadcasts_bounds_no_cartesian(spark):
    """The pruned path: bound/seed/essential tables all broadcast, the
    candidate semi-join shares the (query, doc) exchange with the final
    aggregation, and nothing degenerates to a cartesian product."""
    from embeddingsearch_spark.suite.retrievalops import (
        q_bm25_wand_topk,
    )

    df = q_bm25_wand_topk(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_search_snippets_no_cartesian_single_window_pair(spark):
    """Snippet extraction: hit stream joins broadcast query terms; the
    candidate-window count is a RANGE frame, never a self-join."""
    from embeddingsearch_spark.suite.retrievalops import (
        q_search_snippets,
    )

    df = q_search_snippets(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    # no self-join on the hit stream: ONE join total (the broadcast
    # query-term match) plus the snippet-text join back onto the doc
    # scan; a regression to pairwise window counting would add joins
    # healthy count is 6 (query derivation joins + term match + text
    # join-back, with AQE rendering some twice); a pairwise self-join
    # regression on the hit stream would push well past this
    n_joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert n_joins <= 6, n_joins


def test_wand_from_index_zero_corpus_scans(spark):
    """The production BM25 composition (WAND over the persisted
    postings index): the returned plan reads ONLY the index table —
    zero raw-corpus parquet scans beyond it — and never degenerates to
    a cartesian product. (Scan parquet nodes in the plan must all be
    the postings table, not documents.)"""
    from embeddingsearch_spark.operators import retrieval

    docs = tables.load(spark, SF, "documents")
    retrieval.build_postings_index(
        docs, "es_plan_postings", n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    df = retrieval.bm25_topk_pruned_from_index(
        spark, "es_plan_postings", queries, k=10
    )
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "es_plan_postings" in line, line
    assert "CartesianProduct" not in plan


def test_phrase_search_broadcast_anchor_no_cartesian(spark):
    """Phrase search: the query-term/rarest-term sides broadcast (the
    corpus never shuffles for anchoring) and the verify join stays
    equi-keyed."""
    from embeddingsearch_spark.suite.retrievalops import q_phrase_search

    df = q_phrase_search(spark, SF)
    plan = pi.physical_plan(df)
    assert pi.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_proximity_from_index_zero_corpus_scans(spark):
    """The proximity serving composition (postings index for BM25 +
    positional index for MinDist): every parquet scan in the plan is
    one of the two index tables — the corpus is never re-read or
    re-tokenized — and no cartesian product appears."""
    from embeddingsearch_spark.operators import retrieval

    docs = tables.load(spark, SF, "documents")
    retrieval.build_postings_index(
        docs, "es_plan_prox_post", n_buckets=2
    )
    retrieval.build_positions_index(
        docs, "es_plan_prox_pos", n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    df = retrieval.bm25_proximity_from_index(
        spark, "es_plan_prox_post", "es_plan_prox_pos", queries, k=10
    )
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert (
                "es_plan_prox_post" in line or "es_plan_prox_pos" in line
            ), line
    assert "CartesianProduct" not in plan


def test_champion_from_index_zero_corpus_scans(spark):
    """Champion serving reads the postings index and its tier table
    only — no raw-corpus scan, no per-query tier window re-derivation
    feeding from parquet, no cartesian."""
    from embeddingsearch_spark.operators import retrieval

    docs = tables.load(spark, SF, "documents")
    retrieval.build_postings_index(
        docs, "es_plan_champ_post", n_buckets=2
    )
    retrieval.save_champion_tier(
        spark, "es_plan_champ_post", tier=8, n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    df = retrieval.bm25_champion_from_index(
        spark, "es_plan_champ_post", queries, k=10, tier=8
    )
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "es_plan_champ_post" in line, line
    assert "CartesianProduct" not in plan


def test_snippets_from_index_no_corpus_posexplode(spark):
    """Indexed snippet serving: the hit stream reads the positional
    index (no Generate/posexplode over the corpus anywhere in the
    plan); the only corpus access is the semi-joined original-case
    text fetch for matched docs."""
    from embeddingsearch_spark.operators import retrieval
    from embeddingsearch_spark.operators.snippets import (
        best_snippets_from_index,
    )

    docs = tables.load(spark, SF, "documents")
    retrieval.build_positions_index(
        docs, "es_plan_snip_pos", n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    df = best_snippets_from_index(
        spark, "es_plan_snip_pos", docs, queries, window=10
    )
    plan = pi.physical_plan(df)
    assert "Generate" not in plan, plan
    assert "CartesianProduct" not in plan


def test_unified_serve_zero_corpus_scans(spark):
    """The unified serving composition: BM25, proximity, and phrase
    all serve from the SAME postings+positions pair — every parquet
    scan in the combined plan is one of the two index tables (the
    corpus was tokenized exactly once per table at build time), and no
    cartesian product appears in any branch."""
    from embeddingsearch_spark.operators import retrieval

    docs = tables.load(spark, SF, "documents")
    retrieval.build_postings_index(
        docs, "es_plan_uni_post", n_buckets=2
    )
    retrieval.build_positions_index(
        docs, "es_plan_uni_pos", n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    b = retrieval.bm25_topk_from_index(
        spark, "es_plan_uni_post", queries, k=10
    )
    x = retrieval.bm25_proximity_from_index(
        spark, "es_plan_uni_post", "es_plan_uni_pos", queries, k=10
    )
    p = retrieval.phrase_search_from_index(
        spark, "es_plan_uni_pos", queries
    )
    for df in (b, x, p):
        plan = pi.physical_plan(df)
        for line in plan.splitlines():
            if "Scan parquet" in line:
                assert (
                    "es_plan_uni_post" in line
                    or "es_plan_uni_pos" in line
                ), line
        assert "CartesianProduct" not in plan


def test_unified_tenant_serve_prunes_and_zero_corpus_scans(spark):
    """The multi-tenant unified layout: all three serve shapes read
    ONLY the two tenant-partitioned index tables (zero corpus scans),
    and the routed-tenant predicate reaches every index scan as
    PartitionFilters — tenant isolation enforced by the scan."""
    from embeddingsearch_spark.operators import retrieval
    from embeddingsearch_spark.storage import drop_table

    docs = tables.load(spark, SF, "documents").withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, "acme").otherwise("globex"),
    )
    drop_table(spark, "es_plan_ut_post")
    drop_table(spark, "es_plan_ut_pos")
    retrieval.build_partitioned_postings_index(
        docs, "es_plan_ut_post", partition_col="source", n_buckets=2
    )
    retrieval.build_partitioned_positions_index(
        docs, "es_plan_ut_pos", partition_col="source", n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    route = spark.createDataFrame(
        [(1, "acme")], "query_id long, source string"
    )
    b = retrieval.bm25_federated_from_index(
        spark, "es_plan_ut_post", queries, route, k=10,
        partition_col="source",
    )
    x = retrieval.bm25_proximity_federated_from_index(
        spark, "es_plan_ut_post", "es_plan_ut_pos", queries, route,
        k=10, partition_col="source",
    )
    p = retrieval.phrase_search_federated_from_index(
        spark, "es_plan_ut_pos", queries, route,
        partition_col="source",
    )
    for df in (b, x, p):
        plan = pi.physical_plan(df)
        for line in plan.splitlines():
            if "Scan parquet" in line:
                assert (
                    "es_plan_ut_post" in line
                    or "es_plan_ut_pos" in line
                ), line
        assert "CartesianProduct" not in plan
        pi.assert_partition_pruned(df)
        # the routed tenant value is a literal in the partition filter
        pf = "\n".join(
            m for m in plan.splitlines() if "PartitionFilters" in m
        )
        assert "source" in pf, plan[:3000]


def test_hybrid_indexed_serve_zero_raw_scans(spark):
    """The hybrid serving stack: the fused BM25+IVF plan reads ONLY
    the postings index and the two IVF index tables — neither the raw
    corpus nor the raw embeddings appear as scans — and the dense
    branch's probed centroids reach the assigned table as a static
    partition-pruning filter."""
    from embeddingsearch_spark.operators import retrieval
    from embeddingsearch_spark.storage import drop_table

    docs = tables.load(spark, SF, "documents")
    emb = tables.load(spark, SF, "embeddings")
    drop_table(spark, "es_plan_hyb_post")
    retrieval.build_postings_index(
        docs, "es_plan_hyb_post", n_buckets=2
    )
    centroids = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids(emb, centroids)
    ann_ops.save_ivf_index(
        assigned, centroids, "es_plan_hyb_ivf", n_buckets=2
    )
    queries = spark.createDataFrame(
        [(1, "key agg row scan slow")], "query_id long, text string"
    )
    lex = retrieval.bm25_topk_from_index(
        spark, "es_plan_hyb_post", queries, k=10
    )
    # query inputs are external to the index by definition — make them
    # literal rows so the assertion isolates the SERVE path's scans
    qrow = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).collect()[0]
    qvecs = spark.createDataFrame(
        [(qrow["query_id"], qrow["embedding"])],
        "query_id long, embedding array<float>",
    )
    dense = ann_ops.ivf_topk_from_index(
        spark, "es_plan_hyb_ivf", qvecs, k=10, nprobe=2
    )
    fused = retrieval.rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rank"),
            dense.select(
                "query_id", F.col("vec_id").alias("doc_id"), "rank"
            ),
        ],
        k=60,
        top_k=10,
    )
    plan = pi.physical_plan(fused)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert (
                "es_plan_hyb_post" in line
                or "es_plan_hyb_ivf_assigned" in line
                or "es_plan_hyb_ivf_centroids" in line
            ), line
    assert "CartesianProduct" not in plan
    # the probed centroid ids statically prune the assigned table
    pi.assert_partition_pruned(dense)


def test_ivf_federated_serve_prunes_both_levels(spark):
    """The multi-tenant IVF serve: every parquet scan in the plan is
    one of the two index tables, and the probed (tenant, centroid)
    pairs reach the assigned scan as PartitionFilters on BOTH
    partition levels — tenant isolation enforced by the files read."""
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = two.filter(F.col("vec_id") < 8).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        two, cents, partition_col="source"
    )
    drop_table(spark, "es_plan_tivf_assigned")
    drop_table(spark, "es_plan_tivf_centroids")
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_plan_tivf", partition_col="source",
        n_buckets=2,
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])], "query_id long, embedding array<float>"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    df = ann_ops.ivf_federated_from_index(
        spark, "es_plan_tivf", queries, route, k=5, nprobe=2,
        partition_col="source",
    )
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "es_plan_tivf" in line, line
    assert "CartesianProduct" not in plan
    pi.assert_partition_pruned(df)
    pf = "\n".join(
        m for m in plan.splitlines() if "PartitionFilters" in m
    )
    assert "source" in pf and "centroid_id" in pf, plan[:3000]


def test_hybrid_tenant_serve_zero_raw_scans_and_pruning(spark):
    """The multi-tenant hybrid: the fused per-tenant BM25+IVF plan
    reads ONLY the three tenant-partitioned index tables, and both
    modalities' scans carry the routed tenant in PartitionFilters."""
    from embeddingsearch_spark.operators import retrieval
    from embeddingsearch_spark.storage import drop_table

    docs = tables.load(spark, SF, "documents").withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, "acme").otherwise("globex"),
    )
    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    drop_table(spark, "es_plan_hybt_post")
    retrieval.build_partitioned_postings_index(
        docs, "es_plan_hybt_post", partition_col="source", n_buckets=2
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        emb, cents, partition_col="source"
    )
    drop_table(spark, "es_plan_hybt_ivf_assigned")
    drop_table(spark, "es_plan_hybt_ivf_centroids")
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_plan_hybt_ivf", partition_col="source",
        n_buckets=2,
    )
    queries = spark.createDataFrame(
        [(0, "key agg row scan slow")], "query_id long, text string"
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    qvecs = spark.createDataFrame(
        [(0, qrow["embedding"])], "query_id long, embedding array<float>"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    lex = retrieval.bm25_federated_from_index(
        spark, "es_plan_hybt_post", queries, route, k=10,
        partition_col="source",
    )
    dense = ann_ops.ivf_federated_from_index(
        spark, "es_plan_hybt_ivf", qvecs, route, k=10, nprobe=2,
        partition_col="source",
    )
    fused = retrieval.rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rank"),
            dense.select(
                "query_id", F.col("vec_id").alias("doc_id"), "rank"
            ),
        ],
        k=60,
        top_k=10,
    )
    plan = pi.physical_plan(fused)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert (
                "es_plan_hybt_post" in line
                or "es_plan_hybt_ivf_assigned" in line
                or "es_plan_hybt_ivf_centroids" in line
            ), line
    assert "CartesianProduct" not in plan
    pfs = [m for m in plan.splitlines() if "PartitionFilters" in m]
    assert any("source" in m for m in pfs), plan[:3000]


def test_pq_federated_serve_prunes_tenant_partitions(spark):
    """The multi-tenant PQ serve: the ADC scan reads ONLY the codes
    table, statically pruned to the routed tenant's partitions."""
    from embeddingsearch_spark.operators import pq
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cbs_by = pq.initial_codebooks_federated(
        emb, partition_col="source", m_sub=4, k_codes=8
    )
    coded = pq.encode_pq_federated(emb, cbs_by, partition_col="source")
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_plan_tpq" + t)
    pq.save_federated_pq_index(
        coded, cbs_by, "es_plan_tpq", partition_col="source",
        n_buckets=2,
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])],
        "query_id long, embedding array<float>",
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    df = pq.pq_federated_from_index(
        spark, "es_plan_tpq", queries, route, k=5,
        partition_col="source",
    )
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "es_plan_tpq_codes" in line, line
    pi.assert_partition_pruned(df)
    pf = "\n".join(
        m for m in plan.splitlines() if "PartitionFilters" in m
    )
    assert "source" in pf, plan[:3000]


def test_graph_federated_serve_prunes_tenant_partitions(spark):
    """The multi-tenant graph serve: both index scans statically prune
    to the routed tenant's partitions, and no raw-table scan appears —
    the beam runs entirely over tenant-pure stored edges (vector
    scoring reads the caller's emb frame, pinned here as literals)."""
    from embeddingsearch_spark.operators import graphann
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=True)
    cents = emb.filter(F.col("vec_id") < 8).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = graphann.assign_blocks_federated(
        emb, cents, partition_col="source", n_assign=2
    )
    pairs = graphann.block_pair_sims_federated(
        emb, assigned, partition_col="source"
    )
    for t in ("_pairs", "_assigned"):
        drop_table(spark, "es_plan_tgraph" + t)
    graphann.save_federated_graph_index(
        pairs, assigned, "es_plan_tgraph", partition_col="source",
        n_buckets=2,
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])],
        "query_id long, embedding array<float>",
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    # graph_search's per-hop checkpoints truncate lineage, so assert
    # the pruning on the serve's INPUT frames (the operator's own
    # seam), then run the full serve for the value path
    edges, entries = graphann._federated_graph_inputs(
        spark, "es_plan_tgraph", route, m=6, n_entry=4,
        partition_col="source",
    )
    for df in (edges, entries):
        plan = pi.physical_plan(df)
        for line in plan.splitlines():
            if "Scan parquet" in line:
                assert "es_plan_tgraph" in line, line
        pf = "\n".join(
            m for m in plan.splitlines() if "PartitionFilters" in m
        )
        assert "source" in pf, plan[:3000]
    got = graphann.graph_search_federated(
        spark, "es_plan_tgraph", emb, queries, route, k=5, beam=8,
        hops=2, n_entry=4, m=6, partition_col="source",
    )
    assert got.count() > 0


def test_pq_federated_refined_prunes_both_scans_and_broadcasts(spark):
    """The tenant PQ refine: the ADC pass reads only the routed
    tenant's CODE partitions, the exact-rescore raw-vector fetch reads
    only the routed tenant's VECTOR partitions (a static partition
    predicate when the raw side is a tenant-partitioned table), the
    shortlist probes the scan as a broadcast join, and no other table
    is scanned."""
    from embeddingsearch_spark.operators import pq
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cbs_by = pq.initial_codebooks_federated(
        emb, partition_col="source", m_sub=4, k_codes=8
    )
    coded = pq.encode_pq_federated(emb, cbs_by, partition_col="source")
    for t in ("_codes", "_codebooks", "_vecs"):
        drop_table(spark, "es_plan_tpqr" + t)
    pq.save_federated_pq_index(
        coded, cbs_by, "es_plan_tpqr", partition_col="source",
        n_buckets=2,
    )
    emb.write.partitionBy("source").saveAsTable("es_plan_tpqr_vecs")
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])],
        "query_id long, embedding array<float>",
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    df = pq.pq_federated_refined(
        spark, "es_plan_tpqr", spark.table("es_plan_tpqr_vecs"),
        queries, route, k=5, refine_factor=4,
        partition_col="source",
    )
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert (
                "es_plan_tpqr_codes" in line
                or "es_plan_tpqr_vecs" in line
            ), line
    # both the codes scan (inside the ADC pass, checkpoint-hidden
    # here) and the raw fetch prune on the tenant; the visible plan is
    # the rescore — its vecs scan must carry the partition filter
    pi.assert_partition_pruned(df)
    pf = "\n".join(
        m for m in plan.splitlines() if "PartitionFilters" in m
    )
    assert "source" in pf, plan[:3000]
    assert pi.has_broadcast_join(df), plan[:3000]


def test_ivf_federated_auto_nprobe_prunes_and_isolates(spark):
    """`nprobe="auto"` keeps the two-level pruning contract: the rule
    derives each tenant's width from its LIVE quantizer (pinned
    numerically here), every parquet scan is an index table, the
    probed pairs reach the assigned scan as PartitionFilters on BOTH
    levels, and the un-routed tenant appears in NO filter — widening
    the probe must never widen it across tenants."""
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = two.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        two, cents, partition_col="source"
    )
    drop_table(spark, "es_plan_tivfa_assigned")
    drop_table(spark, "es_plan_tivfa_centroids")
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_plan_tivfa", partition_col="source",
        n_buckets=2,
    )
    # the rule at 8 cents/tenant: ceil(0.9^2.5 * 8) = 7 of 8 cells
    np_map = ann_ops.ivf_auto_nprobe(spark, "es_plan_tivfa")
    assert np_map == {"acme": 7, "globex": 7}, np_map
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])], "query_id long, embedding array<float>"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    df = ann_ops.ivf_federated_from_index(
        spark, "es_plan_tivfa", queries, route, k=5, nprobe="auto",
        partition_col="source",
    )
    # the assigned scan's filter carries EXACTLY the rule's width — 7
    # of acme's 8 cells for the one probed query; silent widening (8
    # literals = unpruned full tenant) or filter collapse (0) fails.
    # Must run before any other stringification: the scan caches its
    # metadata strings at first access, truncated or not.
    aline = _assigned_scan_line(spark, df, "es_plan_tivfa_assigned")
    n_lits = len(_CENT_LIT.findall(aline))
    assert n_lits == 7, (n_lits, aline[:3000])
    assert "InMemoryFileIndex(7 paths)" in aline, aline[:3000]
    plan = pi.physical_plan(df)
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "es_plan_tivfa" in line, line
    assert "CartesianProduct" not in plan
    pi.assert_partition_pruned(df)
    pf = "\n".join(
        m for m in plan.splitlines() if "PartitionFilters" in m
    )
    assert "source" in pf and "centroid_id" in pf, plan[:3000]
    assert "globex" not in pf, pf


_CENT_LIT = __import__("re").compile(r"centroid_id#\d+L? = \d+")


def _assigned_scan_line(spark, df, table: str) -> str:
    """The single-line FileScan entry for ``table`` with untruncated
    metadata — the PartitionFilters literal count on it IS the number
    of (tenant, cell) partitions the serve reads."""
    old_len = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = pi.simple_plan(df)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old_len)
    return next(
        m
        for m in plan.splitlines()
        if table in m and "PartitionFilters" in m
    )


def test_ivf_federated_calibrated_prunes_at_measured_width(spark):
    """`nprobe="calibrated"` keeps the same two-level pruning contract
    as "auto", at the MEASURED width: the assigned scan's
    PartitionFilters carry exactly the calibrated number of (tenant,
    cell) literals — never more than the rule's floor, never the
    un-routed tenant."""
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = two.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        two, cents, partition_col="source"
    )
    drop_table(spark, "es_plan_tivfa_assigned")
    drop_table(spark, "es_plan_tivfa_centroids")
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_plan_tivfa", partition_col="source",
        n_buckets=2,
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])], "query_id long, embedding array<float>"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    cal = ann_ops.ivf_calibrated_nprobe(
        spark, "es_plan_tivfa", queries, route, k=5
    )
    rule = ann_ops.ivf_auto_nprobe(spark, "es_plan_tivfa")
    assert 1 <= cal["acme"] <= rule["acme"], (cal, rule)
    assert cal["globex"] == rule["globex"], cal  # unsampled fallback
    df = ann_ops.ivf_federated_from_index(
        spark, "es_plan_tivfa", queries, route, k=5,
        nprobe="calibrated", partition_col="source",
    )
    aline = _assigned_scan_line(spark, df, "es_plan_tivfa_assigned")
    assert len(_CENT_LIT.findall(aline)) == cal["acme"], aline[:3000]
    assert "globex" not in aline, aline[:3000]
    pi.assert_partition_pruned(df)


def test_ivf_federated_stored_prunes_at_stored_width(spark):
    """`nprobe="stored"` prunes the assigned scan at exactly the
    PERSISTED width — not the rule's, not a re-measured one: store a
    hand-picked width of 3 for the routed tenant, and the scan's
    PartitionFilters must carry exactly 3 centroid literals and never
    the un-routed tenant. A serve that silently falls back to the rule
    (7 literals here) or re-measures fails."""
    from embeddingsearch_spark.operators import calibration as cal_ops
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = two.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        two, cents, partition_col="source"
    )
    drop_table(spark, "es_plan_tivfs_assigned")
    drop_table(spark, "es_plan_tivfs_centroids")
    drop_table(spark, "es_plan_tivfs_calib")
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_plan_tivfs", partition_col="source",
        n_buckets=2,
    )
    cal_ops._store_calibration(
        spark, "es_plan_tivfs",
        [("acme", "nprobe", 3, 0.9), ("globex", "nprobe", 5, 0.9)],
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])], "query_id long, embedding array<float>"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    df = ann_ops.ivf_federated_from_index(
        spark, "es_plan_tivfs", queries, route, k=5,
        nprobe="stored", partition_col="source",
    )
    aline = _assigned_scan_line(spark, df, "es_plan_tivfs_assigned")
    assert len(_CENT_LIT.findall(aline)) == 3, aline[:3000]
    assert "InMemoryFileIndex(3 paths)" in aline, aline[:3000]
    assert "globex" not in aline, aline[:3000]
    pi.assert_partition_pruned(df)


def test_ivf_sq8_federated_prunes_and_isolates(spark):
    """The COMPRESSED IVF serve keeps the raw serve's two-level
    pruning contract: the probed (tenant, cell) pairs reach the CODES
    scan as PartitionFilters (exactly nprobe literals for one probed
    query), the un-routed tenant appears in no filter, and the
    dequantize+score is broadcast-joined — compression must never
    cost the scan its pruning."""
    from embeddingsearch_spark.operators import sq
    from embeddingsearch_spark.storage import drop_table

    emb = tables.load(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    two = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    cents = two.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(
        two, cents, partition_col="source"
    )
    for t in ("_codes", "_centroids", "_sqstats"):
        drop_table(spark, "es_plan_tsq8" + t)
    stats = sq.sq8_stats(two, partition_col="source")
    sq.save_federated_ivf_sq8_index(
        spark, assigned, cents, stats, "es_plan_tsq8", n_buckets=2
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = spark.createDataFrame(
        [(0, qrow["embedding"])], "query_id long, embedding array<float>"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    df = sq.ivf_sq8_federated_from_index(
        spark, "es_plan_tsq8", queries, route, k=5, nprobe=3,
        partition_col="source",
    )
    aline = _assigned_scan_line(spark, df, "es_plan_tsq8_codes")
    assert len(_CENT_LIT.findall(aline)) == 3, aline[:3000]
    assert "InMemoryFileIndex(3 paths)" in aline, aline[:3000]
    assert "globex" not in aline, aline[:3000]
    plan = pi.physical_plan(df)
    assert "CartesianProduct" not in plan
    pi.assert_partition_pruned(df)
    assert pi.has_broadcast_join(df), plan[:3000]
