"""Robust winnowing fingerprints (Schleimer, Wilkerson & Aiken, MOSS,
SIGMOD'03): the sampled-fingerprint scale path for exact-substring
duplicate detection.

``duplicate_span_profile`` (dedup.py) shuffles EVERY k-gram key — exact,
but at 100 TB the shuffle volume is ~n_tokens per doc. Winnowing selects
the minimum hash in each sliding window of ``w`` consecutive k-gram
hashes (rightmost on ties), guaranteeing that any shared substring of
length >= w + k - 1 tokens still produces at least one matching
fingerprint while shrinking the shuffled set to an expected density of
2/(w+1) — a ~(w+1)/2× reduction with a detection guarantee, not a
heuristic.

Plan shape (what survives 100 TB):
  1. per doc, k-gram hashes and the windowed minima are computed entirely
     scan-side inside array expressions (``transform``/``slice``/
     ``array_min`` — whole-stage codegen, zero shuffle, no window
     function): a document is the unit of work, so no (doc, pos) rows
     ever exist outside the scan stage;
  2. hash and position are packed into one 60-bit key
     (hash * 2^POS_BITS + (POSCAP - pos)) so ``array_min`` implements
     MOSS's rightmost-minimum tie-break in a single primitive-typed min;
  3. only the selected fingerprints (density 2/(w+1)) are exploded and
     shuffled once by hash for the cross-doc sharing count — bare 64-bit
     keys, never text.

The reference engine has no corpus-cleanup surface (SURVEY.md §2); this
extends the training-data-pipeline layer (BASELINE.json north star)
alongside duplicate_span_profile as its sampled, guarantee-preserving
scale variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import tokens

# Positions occupy the low bits so one integer min() is (hash asc,
# position desc) — MOSS's rightmost-minimal-hash rule. 2^20 positions
# per document (1M grams) and 40-bit hashes keep the packed key under
# 2^60 < 2^63. Documents beyond 1M grams are a documented contract
# violation (chunk upstream via doc_chunks): a per-row assert column
# would be silently dropped by column pruning, so the bound is enforced
# by convention, not at runtime.
POS_BITS = 20
POSCAP = (1 << POS_BITS) - 1


def _gram_hash(gram: Column) -> Column:
    """40-bit hash of a k-gram: first 10 hex chars of sha256 — identical
    bits in any engine with sha256 + hex→int (the DuckDB oracle uses
    CAST('0x' || substr(sha256(g),1,10) AS BIGINT))."""
    return F.conv(F.substring(F.sha2(gram, 256), 1, 10), 16, 10).cast(
        "bigint"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """One row per selected fingerprint: ``(id, pos, fp)`` where ``pos``
    is the 1-based k-gram position and ``fp`` the 40-bit gram hash.

    Windows are the ``n_grams - w + 1`` full spans of ``w`` consecutive
    k-gram hashes; a document with ``0 < n_grams < w`` yields one window
    over all its grams (the guarantee degrades gracefully for short
    docs); an empty/short-of-k doc yields no rows.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n_grams = F.greatest(F.size("_toks") - (k - 1), F.lit(0))
    # packed key per gram position: hash * 2^POS_BITS + (POSCAP - pos).
    # Materialized as a column referenced w+1 times below — multi-ref of
    # a non-cheap expression stops CollapseProject from inlining it, so
    # the O(n·k) hashing runs once per row. (An expression placed INSIDE
    # a per-window lambda is re-evaluated per element — the first version
    # did that and went quadratic: 37× slower than dup_span_profile at
    # the factor-50 probe instead of ~2.5× faster.)
    keys = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: _gram_hash(F.concat_ws(" ", F.slice(F.col("_toks"), i, k)))
        * F.lit(1 << POS_BITS)
        + (F.lit(POSCAP) - i),
    )
    staged = toks.withColumn("_keys", keys).withColumn(
        "_nw", n_grams - (w - 1)
    )
    # full-window minima WITHOUT a per-window lambda: fold w shifted
    # slices of _keys with elementwise least() — every slice is an
    # array-valued argument evaluated once per row, so the whole pass is
    # O(n·w) instead of O(n²·k)
    acc = F.slice(F.col("_keys"), 1, F.col("_nw"))
    for s in range(1, w):
        acc = F.zip_with(
            acc,
            F.slice(F.col("_keys"), F.lit(1 + s), F.col("_nw")),
            lambda a, b: F.least(a, b),
        )
    wins = (
        F.when(F.size("_keys") == 0, F.array().cast("array<bigint>"))
        .when(
            F.col("_nw") <= 0,  # 0 < n_grams < w: one window, all grams
            F.array(F.array_min("_keys")),
        )
        .otherwise(acc)
    )
    # guard the degenerate all-empty-docs case: _keys is [one key] even
    # for empty docs (sequence floor), so size==0 never fires; gate on
    # n_grams instead
    wins = F.when(
        n_grams <= 0, F.array().cast("array<bigint>")
    ).otherwise(wins)
    selected = F.array_distinct(wins)
    return staged.select(
        F.col(id_col), F.explode(selected).alias("_key")
    ).select(
        id_col,
        (F.lit(POSCAP) - F.col("_key") % F.lit(1 << POS_BITS))
        .cast("int")
        .alias("pos"),
        F.shiftrightunsigned("_key", POS_BITS).alias("fp"),
    )


def winnow_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Per-doc dup profile over winnowed fingerprints — the sampled
    analog of ``duplicate_span_profile``: ``(id, n_fp, n_shared_fp,
    shared_fraction)`` where a fingerprint is *shared* when its hash is
    selected by >= 2 distinct documents.

    Only selected fingerprints shuffle (density 2/(w+1)); the shared-hash
    set is tiny relative to the corpus and AQE broadcasts the semi-join
    when it fits.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    # every downstream branch consumes the SAME (id, fp) aggregate, so
    # its exchange subtree is identical three times over and Spark's
    # ReuseExchange runs the scan + winnow explode ONCE (totals derived
    # as sum(occ), never from a second pass over the corpus)
    occ = fps.groupBy(id_col, "fp").agg(F.count(F.lit(1)).alias("occ"))
    shared = (
        occ.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("fp")
    )
    dup = (
        occ.join(shared, "fp")
        .groupBy(id_col)
        .agg(F.sum("occ").alias("n_shared_fp"))
    )
    totals = occ.groupBy(id_col).agg(F.sum("occ").alias("n_fp"))
    return totals.join(dup, id_col, "left_outer").select(
        id_col,
        F.col("n_fp").cast("bigint").alias("n_fp"),
        F.coalesce("n_shared_fp", F.lit(0)).cast("bigint").alias(
            "n_shared_fp"
        ),
        (F.coalesce("n_shared_fp", F.lit(0)) / F.col("n_fp")).alias(
            "shared_fraction"
        ),
    )


def winnow_cross_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Train/eval contamination via winnowed fingerprints on BOTH sides:
    the MOSS guarantee is symmetric (a shared substring of >= w + k - 1
    tokens contains a full window inside the shared region, whose minimal
    hash is selected by each side independently), so overlap detection
    keeps the n-gram check's span guarantee while each side ships only
    ~2/(w+1) of its grams — the decontamination shape for a 100 TB corpus
    against a large benchmark suite.

    Returns (corpus_id, bench_id, n_shared_fp) — one row per
    contaminated (doc, benchmark) pair, counting shared distinct
    fingerprint hashes.
    """
    cf = (
        winnow_fingerprints(corpus, corpus_id, text_col, k=k, w=w)
        .select(corpus_id, "fp")
        .distinct()
    )
    bf = (
        winnow_fingerprints(bench, bench_id, text_col, k=k, w=w)
        .select(bench_id, "fp")
        .distinct()
    )
    return (
        cf.join(F.broadcast(bf), "fp")
        .groupBy(corpus_id, bench_id)
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
    )


def incremental_winnow_gate(
    incoming: DataFrame,
    indexed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Ingest gate at SUBSTRING granularity: an incoming doc is flagged
    when it shares >= ``min_shared`` winnowed fingerprint hashes with
    the indexed corpus — catching partial-copy ingests (any embedded
    span of >= w + k - 1 indexed tokens, the MOSS guarantee) that the
    exact-fingerprint gate misses entirely and whole-doc similarity
    gates miss when the copy is a small part of a long doc.

    The indexed side's fingerprints can be PERSISTED once (a
    ``winnow_fingerprints`` table at 2/(w+1) gram density) and reused
    for every batch — pass the saved table's DataFrame as ``indexed``
    with a precomputed ``fp`` column, or the raw corpus (winnowed here).
    Each ingest batch then pays only its own winnowing plus one join
    against bare 64-bit keys.

    Returns one row per incoming doc: ``(id, n_fp, n_shared_fp,
    best_match, best_shared, is_new)`` — best_match is the indexed doc
    sharing the most fingerprints (smallest id on ties, NULL when none).
    """
    from pyspark.sql.window import Window

    inc_fp = (
        winnow_fingerprints(incoming, id_col, text_col, k=k, w=w)
        .select(id_col, "fp")
        .distinct()
    )
    if "fp" in indexed.columns:
        idx_fp = indexed.select(
            F.col(id_col).alias("_idx_id"), "fp"
        ).distinct()
    else:
        idx_fp = (
            winnow_fingerprints(indexed, id_col, text_col, k=k, w=w)
            .select(F.col(id_col).alias("_idx_id"), "fp")
            .distinct()
        )
    pairs = (
        inc_fp.join(idx_fp, "fp")
        .groupBy(id_col, "_idx_id")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    best = (
        pairs.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("_shared").desc(), F.col("_idx_id").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("_idx_id").alias("best_match"),
            F.col("_shared").alias("best_shared"),
        )
    )
    shared_fps = (
        inc_fp.join(idx_fp.select("fp").distinct(), "fp")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
    )
    totals = inc_fp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    return (
        incoming.select(id_col)
        .join(totals, id_col, "left_outer")
        .join(shared_fps, id_col, "left_outer")
        .join(best, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_fp", F.lit(0)).cast("bigint").alias("n_fp"),
            F.coalesce("n_shared_fp", F.lit(0))
            .cast("bigint")
            .alias("n_shared_fp"),
            F.col("best_match").cast("bigint").alias("best_match"),
            F.coalesce("best_shared", F.lit(0))
            .cast("bigint")
            .alias("best_shared"),
            (F.coalesce("n_shared_fp", F.lit(0)) < min_shared).alias(
                "is_new"
            ),
        )
    )
