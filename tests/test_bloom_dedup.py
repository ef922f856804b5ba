"""Bloom-prefiltered incremental dedup: result-identical to the exact
anti-join gate, bitmap sized correctly, definite-new rows bypass the
verify join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import dedup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_matches_exact_gate(spark):
    indexed = _mk(
        spark, [(i, f"indexed document number {i}") for i in range(200)]
    )
    # 50 exact re-deliveries + 150 genuinely new
    incoming = _mk(
        spark,
        [(1000 + i, f"indexed document number {i}") for i in range(50)]
        + [(2000 + i, f"brand new content {i}") for i in range(150)],
    )
    exact = dedup.incremental_new_docs(incoming, indexed, "doc_id", "text")
    bloom = dedup.incremental_new_docs_bloom(
        incoming, indexed, "doc_id", "text"
    )
    assert sorted(r.doc_id for r in bloom.collect()) == sorted(
        r.doc_id for r in exact.collect()
    )
    assert bloom.count() == 150


def test_bloom_matches_under_high_fpp(spark):
    """Even a deliberately tiny, collision-heavy filter (fpp=0.5) must
    stay row-identical — false positives only cost verify work."""
    indexed = _mk(spark, [(i, f"doc {i}") for i in range(100)])
    incoming = _mk(
        spark,
        [(500 + i, f"doc {i}") for i in range(30)]
        + [(900 + i, f"new {i}") for i in range(70)],
    )
    bloom = dedup.incremental_new_docs_bloom(
        incoming, indexed, "doc_id", "text", fpp=0.5
    )
    assert sorted(r.doc_id for r in bloom.collect()) == sorted(
        900 + i for i in range(70)
    )


def test_bloom_sizing():
    m, k = dedup._bloom_sizing(1_000_000, 0.01)
    assert m % 64 == 0
    # canonical formula: ~9.59 bits/item, 7 hashes at 1% fpp
    assert 9_000_000 < m < 10_500_000
    assert k == 7
    # degenerate inputs stay sane
    m, k = dedup._bloom_sizing(0, 0.01)
    assert m >= 64 and 1 <= k <= 8


def test_bloom_words_bounded(spark):
    keys = spark.createDataFrame(
        [(f"key {i}",) for i in range(500)], "fp string"
    )
    m, k = 4096, 3
    words = dedup.bloom_words(keys, "fp", m, k).collect()
    assert len(words) <= m // 64
    assert all(0 <= r.w < m // 64 for r in words)
    # ~1500 random positions in 4096 bits: a majority of words are touched
    assert len(words) > 30


def test_bloom_no_false_negatives(spark):
    """Every indexed key must Bloom-hit: re-delivering the full indexed
    set yields zero new rows regardless of fpp."""
    indexed = _mk(spark, [(i, f"text {i}") for i in range(300)])
    redelivered = indexed.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    out = dedup.incremental_new_docs_bloom(
        redelivered, indexed, "doc_id", "text", fpp=0.02
    )
    assert out.count() == 0


def test_prebuilt_bloom_index_reuse(spark):
    """A persisted build_bloom_index result probes identically across
    batches (the amortized scale path)."""
    indexed = _mk(spark, [(i, f"doc {i}") for i in range(120)])
    bloom = dedup.build_bloom_index(indexed, "text", fpp=0.01)
    bloom = (bloom[0].cache(), bloom[1], bloom[2])
    for batch in range(2):
        incoming = _mk(
            spark,
            [(batch * 1000 + i, f"doc {i}") for i in range(20)]
            + [(batch * 1000 + 500 + i, f"new {batch}-{i}") for i in range(30)],
        )
        out = dedup.incremental_new_docs_bloom(
            incoming, indexed, "doc_id", "text", bloom=bloom
        )
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            batch * 1000 + 500 + i for i in range(30)
        )


def test_duplicate_rows_within_batch_keep_multiplicity(spark):
    """The gate decides per distinct (id, fp) but must preserve input row
    multiplicity — the same (id, text) twice in one batch yields two
    output rows, exactly like incremental_new_docs."""
    indexed = _mk(spark, [(i, f"doc {i}") for i in range(50)])
    incoming = _mk(
        spark,
        [(900, "fresh A"), (900, "fresh A"), (901, "fresh B"), (1, "doc 1")],
    )
    plain = dedup.incremental_new_docs(incoming, indexed, "doc_id", "text")
    bloomed = dedup.incremental_new_docs_bloom(
        incoming, indexed, "doc_id", "text"
    )
    # compare by column NAME: Spark orders USING-join keys first, so the
    # two gates differ in column order but must agree row-for-row
    key = lambda r: (r["doc_id"], r["fp"])  # noqa: E731
    p = sorted(map(key, plain.collect()))
    b = sorted(map(key, bloomed.collect()))
    assert p == b
    assert len(b) == 3  # (900 x2, 901) — dup row kept twice


def test_augment_bloom_index_restores_coverage(spark):
    """Stale-bitmap contract: after new docs are indexed, OR-ing their
    fingerprints in via augment_bloom_index makes re-delivered copies
    Bloom-hit (and thus verify-drop) again."""
    indexed0 = _mk(spark, [(i, f"doc {i}") for i in range(80)])
    bloom = dedup.build_bloom_index(indexed0, "text", fpp=0.01)

    batch1 = _mk(spark, [(200 + i, f"late {i}") for i in range(20)])
    indexed1 = indexed0.unionByName(batch1)

    # stale bitmap: late docs absent -> re-delivery leaks them as "new"
    redelivered = batch1.select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    leaked = dedup.incremental_new_docs_bloom(
        redelivered, indexed1, "doc_id", "text", bloom=bloom
    )
    # most late docs leak as "new" (only chance Bloom false-positives
    # reach the verify and get dropped) — the documented failure mode
    assert leaked.count() >= 15

    fixed_bloom = dedup.augment_bloom_index(bloom, batch1, "text")
    clean = dedup.incremental_new_docs_bloom(
        redelivered, indexed1, "doc_id", "text", bloom=fixed_bloom
    )
    assert clean.count() == 0
