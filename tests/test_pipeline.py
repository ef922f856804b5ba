"""curate(docs, policy): stage composition, toggles, funnel accounting."""

from pyspark.sql import functions as F

from embeddingsearch_spark.pipeline import CurationPolicy, curate

DOCS = [
    # two exact dups (1 canonical survives), one near-dup tail pair,
    # one too-short doc, one doc sharing the benchmark 5-gram
    (1, "the quick brown fox jumps over the lazy dog near the old river bank today again"),
    (2, "the quick brown fox jumps over the lazy dog near the old river bank today again"),
    (3, "a completely different document about spark shuffle partitions and broadcast joins in production"),
    (4, "a completely different document about spark shuffle partitions and broadcast joins in production extra"),
    (5, "too short"),
    (6, "contains the secret benchmark phrase alpha beta gamma delta epsilon here plus enough words to pass the length gate easily ok"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_curate_full_funnel(spark):
    bench = spark.createDataFrame(
        [(100, "secret benchmark phrase alpha beta gamma delta epsilon")],
        "bench_id long, text string",
    )
    policy = CurationPolicy(
        exact_dedup=True,
        neardup=True,
        neardup_threshold=0.5,
        gopher=True,
        min_words=10,
        perplexity=False,
        decontaminate=True,
        contam_ngram=5,
    )
    res = curate(_docs(spark), policy, benchmark=bench)
    funnel = {r["stage"]: r["n"] for r in res.funnel.collect()}
    assert funnel["input"] == 6
    assert funnel["exact_dedup"] == 5  # doc 2 collapses into 1
    assert funnel["neardup"] == 4  # doc 4 (near-dup of 3) dropped
    assert funnel["gopher"] == 3  # doc 5 too short
    assert funnel["decontaminate"] == 2  # doc 6 overlaps benchmark
    ids = {r["doc_id"] for r in res.docs.select("doc_id").collect()}
    assert ids == {1, 3}
    # funnel deltas are vs previous stage
    rows = {r["stage"]: r for r in res.funnel.collect()}
    assert rows["exact_dedup"]["n_dropped"] == 1
    assert rows["decontaminate"]["n_dropped"] == 1


def test_curate_stages_skippable(spark):
    policy = CurationPolicy(
        exact_dedup=False,
        neardup=False,
        gopher=True,
        min_words=10,
        perplexity=False,
        decontaminate=False,
    )
    res = curate(_docs(spark), policy)
    stages = [s for s, _ in res.stages]
    assert stages == ["input", "gopher"]
    # no benchmark passed → decontaminate never runs even when enabled
    res2 = curate(_docs(spark), CurationPolicy(perplexity=False))
    assert "decontaminate" not in [s for s, _ in res2.stages]


def test_curate_ppl_gate_passes_unscorable_docs(spark):
    """Empty/NULL-text docs get NULL perplexity (the LM abstains) and
    must PASS the ppl gate — with every other stage off, no doc may be
    dropped by a gate that couldn't score it."""
    docs = spark.createDataFrame(
        [
            (1, "normal document with several ordinary words inside"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    policy = CurationPolicy(
        exact_dedup=False,
        neardup=False,
        gopher=False,
        perplexity=True,
        max_ppl=1e18,
        decontaminate=False,
    )
    res = curate(docs, policy)
    ids = {r["doc_id"] for r in res.docs.collect()}
    assert ids == {1, 2, 3}


def test_curate_paragraph_rewrite_keeps_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared para\n\nunique one two three four five six seven eight nine ten"),
            (2, "shared para\n\nother text one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    policy = CurationPolicy(
        exact_dedup=False,
        paragraph_dedup=True,
        neardup=False,
        gopher=False,
        perplexity=False,
    )
    res = curate(docs, policy)
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert len(out) == 2  # rewrite never drops docs
    # first occurrence (doc 1) keeps the shared paragraph, doc 2 loses it
    assert out[1].startswith("shared para")
    assert "shared para" not in out[2]


def test_curate_mix_and_pack(spark):
    docs = spark.createDataFrame(
        [
            (i, "word " * 20 + "tail", "wiki" if i % 2 == 0 else "crawl")
            for i in range(20)
        ],
        "doc_id long, text string, source string",
    )
    policy = CurationPolicy(
        exact_dedup=False,
        neardup=False,
        gopher=False,
        perplexity=False,
        mix_weights={"wiki": 2.0, "crawl": 1.0},
        pack_budget=64,
    )
    res = curate(docs, policy)
    stages = [s for s, _ in res.stages]
    assert stages == ["input", "mix", "pack"]
    out = res.docs
    assert {"copy", "shard", "pack_id", "pack_pos"} <= set(out.columns)
    per_source = {
        r["source"]: r["n"]
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_source["wiki"] == 20  # 10 docs x 2 copies
    assert per_source["crawl"] == 10


def test_curate_lang_gate(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog with many words here"),
            (2, "der schnelle braune fuchs und der faule hund mit worten"),
        ],
        "doc_id long, text string",
    )
    policy = CurationPolicy(
        exact_dedup=False,
        neardup=False,
        gopher=False,
        perplexity=False,
        lang_allow=("en",),
    )
    res = curate(docs, policy)
    assert [s for s, _ in res.stages] == ["input", "lang"]
    ids = {r["doc_id"] for r in res.docs.collect()}
    assert ids == {1}


def test_curate_incremental_gates(spark):
    """Exact re-delivery caught by the fingerprint gate, near copy by
    the near-dup gate, short fresh doc by gopher; the genuinely new
    long doc survives all three."""
    from embeddingsearch_spark.pipeline import curate_incremental

    indexed = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river bank"),
            (11, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (12, "tiny"),
            (13, "a completely novel document about catalyst plans and shuffle exchange reuse strategies"),
        ],
        "doc_id long, text string",
    )
    res = curate_incremental(batch, indexed, min_words=5)
    funnel = {r["stage"]: r["n"] for r in res.funnel.collect()}
    assert funnel == {
        "batch": 4,
        "exact_gate": 3,  # 10 is byte-identical
        "neardup_gate": 2,  # 11 is a near copy
        "gopher": 1,  # 12 too short
    }
    ids = {r["doc_id"] for r in res.docs.collect()}
    assert ids == {13}
