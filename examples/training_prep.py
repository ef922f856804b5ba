"""End-to-end training-data prep — the beyond-reference pipeline surface
on the synthetic documents/embeddings tables: dedup (exact + MinHash-LSH
+ SRP-LSH on embeddings), quality gating, deterministic splits, chunking,
and a compacted partitioned output layout.

Run:  python examples/training_prep.py [sf_dir]   (default sf0.01)

Prints the per-stage row counts and the final per-split token budget,
then writes the prepared corpus partitioned by split and compacts it.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from embeddingsearch_spark import storage, tables
    from embeddingsearch_spark.functions import text as T
    from embeddingsearch_spark.operators import ann, dedup, splits
    from embeddingsearch_spark.session import get_spark

    from embeddingsearch_spark.pipeline import CurationPolicy, curate

    spark = get_spark("training-prep", master="local[8]", shuffle_partitions=8)
    docs = tables.load(spark, sf_dir, "documents")

    # 1-2. the composed curation entry point: exact dedup → MinHash
    # near-dup → Gopher gates → perplexity gate → decontamination, with
    # funnel accounting built in (one aggregation job, not a count()
    # per stage). Each stage is the same single-purpose operator the
    # hand-wired version called; `curate` adds composition + funnel.
    bench = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 4, 12)).alias(
            "text"
        ),
    )
    policy = CurationPolicy(
        exact_dedup=True,
        neardup=True,
        neardup_threshold=0.5,
        hash_fn="xxhash64",
        gopher=True,
        min_words=10,
        gopher_rules=("r_words", "r_alpha"),
        perplexity=True,
        max_ppl=30.1,
        ppl_vocab=100,
        decontaminate=True,
    )
    result = curate(docs, policy, benchmark=bench)
    print("curation funnel:")
    result.funnel.show()
    docs2 = result.docs

    # 3. embedding-space near-dup report (SRP-LSH, no blocking key)
    emb = tables.load(spark, sf_dir, "embeddings")
    n_vec_pairs = ann.srp_cosine_pairs(emb, threshold=0.7).count()
    print(f"embedding near-dup pairs (cosine >= 0.7): {n_vec_pairs}")

    # 4. split + token budget over the curated corpus
    gated = docs2.select(
        "doc_id", "text", T.token_count(F.col("text")).alias("n_tokens")
    )
    tagged = splits.hash_split(
        gated, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    budget = (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split")
    )
    budget.show()

    # 6. incremental ingest: a re-crawl batch hits the Bloom exact gate,
    # survivors hit the MinHash near-dup gate — only genuinely-new
    # content would be embedded/indexed
    recrawl = docs.limit(50).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    ).unionAll(
        spark.createDataFrame(
            [(999001, "a brand new crawl page about spark z-ordering")],
            "doc_id long, text string",
        )
    )
    bloom = dedup.build_bloom_index(docs2, "text")
    new_exact = dedup.incremental_new_docs_bloom(
        recrawl, docs2, "doc_id", "text", bloom=bloom
    )
    flags = dedup.incremental_neardup(
        recrawl.join(new_exact.select("doc_id"), "doc_id"),
        docs2, "doc_id", "text", hash_fn="xxhash64",
    )
    print(
        f"re-crawl batch: {recrawl.count()} docs, "
        f"{new_exact.count()} pass exact gate, "
        f"{flags.filter('is_new').count()} genuinely new after near-dup gate"
    )

    # 7. ANN at memory scale: PCA-whiten, PQ-encode, ADC top-k
    from embeddingsearch_spark.operators import pca, pq

    means, comps, ev = pca.pca_components(emb, k=16)
    proj = pca.project(emb, means, comps, whiten_by=ev).select(
        "vec_id", F.col("proj").alias("embedding")
    )
    cbs = pq.train_codebooks(proj, m_sub=4, k_codes=16, iters=1)
    coded = pq.encode_pq(proj, cbs)
    queries = proj.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = pq.pq_topk(coded, cbs, queries, k=5)
    print("PQ/ADC top-5 on PCA-whitened embeddings:")
    topk.orderBy("query_id", "rank").show()

    # 8. substring-level cleanup + assembly controls (round-3 surface):
    # remove duplicated 8-gram spans, gate on OOV rate, temperature-mix
    # sources, and cut pad-minimizing length-bucketed batches
    from embeddingsearch_spark.operators import packing, splits, tfidf
    from embeddingsearch_spark.operators import winnow as wn

    cleaned = dedup.remove_duplicate_spans(docs, "doc_id", "text", n=8)
    n_cut = cleaned.filter("n_removed > 0").count()
    wfp = wn.winnow_profile(docs, "doc_id", "text", k=5, w=4)
    oov = tfidf.oov_profile(docs, vocab_size=16)
    mixw = splits.mixture_weights_temperature(
        docs.select("doc_id", "source"), "source", alpha=0.3
    )
    batches = packing.length_bucket_batches(
        cleaned.select("doc_id", F.col("n_tokens") - F.col("n_removed"))
        .withColumnRenamed("(n_tokens - n_removed)", "n_tokens"),
        batch_size=32,
        n_shards=4,
    )
    print(
        f"span dedup: {n_cut} docs had duplicated spans cut; "
        f"winnowed dup docs: {wfp.filter('n_shared_fp > 0').count()}; "
        f"high-OOV docs (>0.5): {oov.filter('oov_rate > 0.5').count()}; "
        f"{mixw.count()} source mixture weights; "
        f"{batches.select('batch_id').distinct().count()} length batches"
    )

    # 9. session-3 curation surface: Gopher rule gate, CCNet perplexity
    # cut, paragraph dedup, D4 prototype pruning + cluster-balanced
    # sampling, UniMax token budgets, perceptual-hash media near-dup
    from embeddingsearch_spark.operators import (
        boilerplate,
        lmscore,
        multimodal,
        repetition,
    )

    gop = repetition.gopher_rules(docs, "doc_id", "text", min_words=10)
    ppl = lmscore.perplexity_buckets(
        docs, "doc_id", "text", n_buckets=3, vocab_size=100
    )
    pdedup = boilerplate.dedup_paragraphs(docs, "doc_id", "text")
    proto = ann.prototype_prune(emb, k=8, keep_frac=0.75)
    balanced = ann.cluster_balanced_sample(emb, k=8, n_per_cluster=25)
    uni = splits.unimax_allocation(
        docs.select("doc_id", "source"), "source",
        budget_frac=0.5, max_epochs=3.0,
    )
    dh = multimodal.media_dhash(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("modality"),
            F.encode("text", "utf-8").alias("content"),
        )
    )
    dh_pairs = multimodal.dhash_neardup_pairs(dh, bits=49)
    print(
        f"gopher keep: {gop.filter('keep').count()}/{gop.count()}; "
        f"ppl head third: {ppl.filter(F.col('segment') == 'head').count()}; "
        f"paragraph-deduped docs: "
        f"{pdedup.filter('n_removed > 0').count()}; "
        f"proto-pruned keeps: {proto.filter('keep').count()}; "
        f"balanced sample: {balanced.count()}; "
        f"dhash near-dup pairs: {dh_pairs.count()}"
    )
    print("UniMax per-source token budget (top 5 by alloc):")
    uni.orderBy(F.col("alloc").desc()).show(5)

    # 5. write partitioned by split, then compact the small files
    out = tempfile.mkdtemp(prefix="es_training_prep_")
    tagged.write.mode("overwrite").partitionBy("split").parquet(out)
    stats = storage.compact(spark, out, partition_cols=["split"])
    print(
        f"layout: {out} — {stats['files_before']} files -> "
        f"{stats['files_after']} after compaction"
    )
    manifest = storage.write_manifest(spark, out)
    print(
        f"manifest: {manifest['n_files']} files, "
        f"{manifest['total_rows']} rows, "
        f"verify: {storage.verify_manifest(out) or 'clean'}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
