"""Robust-winnowing fingerprints: density bound, detection guarantee,
rightmost tie-break, short-doc degradation."""

from __future__ import annotations

import pytest

from embeddingsearch_spark.operators.winnow import (
    POS_BITS,
    POSCAP,
    winnow_fingerprints,
    winnow_profile,
)


def _doc_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )


def _py_winnow(toks: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Reference implementation: packed-key min per window, distinct."""
    import hashlib

    n = len(toks) - k + 1
    if n <= 0:
        return set()
    keys = []
    for i in range(1, n + 1):
        gram = " ".join(toks[i - 1 : i - 1 + k])
        h = int(hashlib.sha256(gram.encode()).hexdigest()[:10], 16)
        keys.append(h * (1 << POS_BITS) + (POSCAP - i))
    sel = set()
    for p in range(min(w, n), n + 1):
        lo = max(1, p - w + 1)
        sel.add(min(keys[lo - 1 : p]))
    return {(POSCAP - key % (1 << POS_BITS), key >> POS_BITS) for key in sel}


def test_matches_reference_python(spark):
    docs = {
        1: "a b c d e f g h i j k l m",
        2: "x y a b c d e f g z",
        3: "q",
        4: "",
    }
    out = {
        r["doc_id"]: set()
        for r in _doc_df(spark, docs).select("doc_id").collect()
    }
    for r in winnow_fingerprints(_doc_df(spark, docs), "doc_id", "text").collect():
        out[r["doc_id"]].add((r["pos"], r["fp"]))
    for i, t in docs.items():
        toks = t.split() if t.strip() else []
        assert out[i] == _py_winnow(toks, 5, 4), f"doc {i}"


def test_detection_guarantee(spark):
    # Two docs sharing a run of w + k - 1 = 8 tokens must share >= 1
    # selected fingerprint hash (the MOSS guarantee).
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = {
        1: f"p q r {shared} u v",
        2: f"m n {shared} o",
    }
    rows = winnow_fingerprints(_doc_df(spark, docs), "doc_id", "text").collect()
    by_doc: dict[int, set] = {1: set(), 2: set()}
    for r in rows:
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2]


def test_density_bound(spark):
    # n_fp <= n_windows, and for repetitive text far fewer.
    docs = {1: " ".join(f"t{i % 50}" for i in range(400))}
    prof = winnow_profile(_doc_df(spark, docs), "doc_id", "text").collect()
    n_grams = 400 - 4
    n_windows = n_grams - 3
    assert 0 < prof[0]["n_fp"] <= n_windows
    # expected density 2/(w+1) = 0.4; allow generous slack
    assert prof[0]["n_fp"] < 0.7 * n_windows


def test_short_doc_single_window(spark):
    # 0 < n_grams < w: exactly one window -> exactly one fingerprint.
    docs = {1: "a b c d e f"}  # 6 tokens, k=5 -> 2 grams < w=4
    prof = winnow_profile(_doc_df(spark, docs), "doc_id", "text").collect()
    assert prof[0]["n_fp"] == 1


def test_empty_and_below_k_docs_absent(spark):
    docs = {1: "", 2: "a b", 3: "a b c d e f g h"}
    prof = winnow_profile(_doc_df(spark, docs), "doc_id", "text")
    ids = {r["doc_id"] for r in prof.collect()}
    assert ids == {3}


def test_profile_shared_fraction(spark):
    d = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = {1: d, 2: d, 3: "z1 z2 z3 z4 z5 z6 z7 z8 z9"}
    prof = {
        r["doc_id"]: r
        for r in winnow_profile(_doc_df(spark, docs), "doc_id", "text").collect()
    }
    assert prof[1]["shared_fraction"] == pytest.approx(1.0)
    assert prof[2]["shared_fraction"] == pytest.approx(1.0)
    assert prof[3]["shared_fraction"] == pytest.approx(0.0)


def test_cross_overlap_planted_leak(spark):
    from embeddingsearch_spark.operators.winnow import winnow_cross_overlap

    leak = "l1 l2 l3 l4 l5 l6 l7 l8"  # w + k - 1 = 8 tokens
    corpus = _doc_df(
        spark,
        {
            1: f"c1 c2 {leak} c3 c4",
            2: "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10",
        },
    )
    bench = spark.createDataFrame(
        [(100, f"b1 {leak} b2"), (101, "e1 e2 e3 e4 e5 e6 e7 e8")],
        "bench_id long, text string",
    )
    rows = winnow_cross_overlap(corpus, bench).collect()
    pairs = {(r["doc_id"], r["bench_id"]) for r in rows}
    assert (1, 100) in pairs  # the MOSS guarantee: >=8-token leak found
    assert (2, 101) not in pairs  # disjoint texts share nothing


def test_incremental_winnow_gate(spark):
    from embeddingsearch_spark.operators.winnow import incremental_winnow_gate

    base = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
    indexed = _doc_df(spark, {1: base, 2: "q1 q2 q3 q4 q5 q6 q7 q8 q9"})
    incoming = spark.createDataFrame(
        [
            (10, base),                       # exact copy -> flagged
            (11, f"x1 x2 {base} y1"),         # partial copy -> flagged
            (12, "z1 z2 z3 z4 z5 z6 z7 z8"),  # fresh -> new
            (13, "t"),                         # too short for any fp -> new
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in incremental_winnow_gate(incoming, indexed).collect()
    }
    assert len(out) == 4
    assert not out[10]["is_new"] and out[10]["best_match"] == 1
    assert not out[11]["is_new"] and out[11]["best_match"] == 1
    assert out[12]["is_new"] and out[12]["best_match"] is None
    assert out[13]["is_new"] and out[13]["n_fp"] == 0


def test_incremental_winnow_gate_precomputed_fp_table(spark):
    from embeddingsearch_spark.operators.winnow import (
        incremental_winnow_gate,
        winnow_fingerprints,
    )

    base = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    indexed = _doc_df(spark, {1: base})
    fp_table = winnow_fingerprints(indexed, "doc_id", "text")
    incoming = _doc_df(spark, {10: base, 11: "n1 n2 n3 n4 n5 n6 n7 n8"})
    out = {
        r["doc_id"]: r
        for r in incremental_winnow_gate(incoming, fp_table).collect()
    }
    assert not out[10]["is_new"] and out[10]["best_match"] == 1
    assert out[11]["is_new"]


# -- property: Spark winnow == pure-Python reference on random docs ---------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _word = st.integers(min_value=0, max_value=6).map(lambda i: f"w{i}")
    _docs_strategy = st.lists(
        st.lists(_word, min_size=0, max_size=30).map(" ".join),
        min_size=1,
        max_size=8,
    )

    @pytest.mark.slow
    @given(texts=_docs_strategy)
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_winnow_matches_python_reference_random(spark, texts):
        """Small alphabet forces repeats, ties, and shared spans; doc
        lengths straddle every edge (0, <k, <w windows, long)."""
        docs = dict(enumerate(texts))
        got: dict[int, set] = {i: set() for i in docs}
        rows = winnow_fingerprints(
            _doc_df(spark, docs), "doc_id", "text", k=3, w=4
        ).collect()
        for r in rows:
            got[r["doc_id"]].add((r["pos"], r["fp"]))
        for i, t in docs.items():
            toks = t.split() if t.strip() else []
            assert got[i] == _py_winnow(toks, 3, 4), f"doc {i}: {t!r}"
