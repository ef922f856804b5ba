"""Content-defined chunking: coverage, determinism, shift robustness."""

from __future__ import annotations

from embeddingsearch_spark.operators.cdc import cdc_chunks


def _chunks(spark, docs: dict[int, str], **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    out: dict[int, list] = {i: [] for i in docs}
    for r in cdc_chunks(df, **kw).collect():
        out[r["doc_id"]].append(r)
    for v in out.values():
        v.sort(key=lambda r: r["chunk_id"])
    return out


def test_chunks_partition_the_document(spark):
    text = " ".join(f"t{i % 13}x{i % 7}" for i in range(200))
    ch = _chunks(spark, {1: text})[1]
    assert ch[0]["start_tok"] == 1
    covered = 0
    for i, r in enumerate(ch):
        assert r["chunk_id"] == i + 1
        assert r["start_tok"] == covered + 1
        assert r["n_tokens"] >= 1
        covered += r["n_tokens"]
    assert covered == 200


def test_short_and_empty_docs(spark):
    ch = _chunks(spark, {1: "a b", 2: "", 3: "a b c d e f"})
    assert len(ch[1]) == 1 and ch[1][0]["n_tokens"] == 2  # < g: one chunk
    assert ch[2] == []
    assert sum(r["n_tokens"] for r in ch[3]) == 6


def test_insertion_shift_robustness(spark):
    """Inserting one token near the front must leave the tail chunks'
    hashes intact — the property fixed-window chunking lacks."""
    base = " ".join(f"tok{i}" for i in range(300))  # aperiodic: every
    edited = "INSERTED " + base                     # chunk hash unique
    ch = _chunks(spark, {1: base, 2: edited})
    h1 = [r["chunk_hash"] for r in ch[1]]
    h2 = [r["chunk_hash"] for r in ch[2]]
    assert len(set(h1)) == len(h1)  # aperiodic text -> distinct chunks
    shared = set(h1) & set(h2)
    # all but the chunk the insertion landed in survive
    assert len(shared) >= len(h1) - 2
    assert len(shared) > 0


def test_deterministic(spark):
    text = " ".join(f"q{i % 17}" for i in range(150))
    a = _chunks(spark, {1: text})[1]
    b = _chunks(spark, {1: text})[1]
    assert [(r["start_tok"], r["chunk_hash"]) for r in a] == [
        (r["start_tok"], r["chunk_hash"]) for r in b
    ]


def test_dedup_profile_revision_duplication(spark):
    from embeddingsearch_spark.operators.cdc import cdc_dedup_profile

    base = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, base), (2, "SHIFTED " + base), (3, "totally different words x y z a b c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cdc_dedup_profile(docs).collect()}
    # the shifted revision shares almost every chunk with the original
    assert out[1]["shared_fraction"] > 0.7
    assert out[2]["shared_fraction"] > 0.7
    assert out[3]["shared_fraction"] == 0.0
