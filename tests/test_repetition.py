"""Repetition filters (operators/repetition.py): metric definitions and
the remove path."""

from __future__ import annotations

from embeddingsearch_spark.operators import repetition as rep


def _profile(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return rep.repetition_profile(df).first()


def test_clean_text(spark):
    words = " ".join(f"w{i}" for i in range(40))
    r = _profile(spark, words)
    assert r["dup_line_frac"] == 0.0
    assert r["dup5_frac"] == 0.0
    assert r["top2_frac"] == 2 / 40  # all-unique grams: mode count is 1
    assert r["keep"]


def test_duplicate_lines(spark):
    r = _profile(spark, "same line\nsame line\nother line\nfourth line")
    assert r["dup_line_frac"] == 0.25  # 4 lines, 3 distinct
    assert not (r["dup_line_frac"] > rep.MAX_DUP_LINE_FRAC)


def test_top2_spam_run(spark):
    # 10 tokens, 'spam spam' occurs 7 times -> top2 = 14/10
    r = _profile(spark, "intro " + "spam " * 8 + "end")
    assert r["n_tokens"] == 10
    assert r["top2_frac"] == 1.4
    assert not r["keep"]


def test_dup5_repeated_block(spark):
    # 'a b c d e' twice: all ten 5-gram positions... windows across the
    # seam differ, but the two exact copies both count (2 * 5 / 10 = 1.0)
    r = _profile(spark, "a b c d e a b c d e")
    assert r["n_tokens"] == 10
    assert r["dup5_frac"] == 1.0
    assert not r["keep"]


def test_short_and_empty_docs(spark):
    r = _profile(spark, "")
    assert r["n_tokens"] == 0 and r["keep"]
    r = _profile(spark, "one")
    assert r["top2_frac"] == 0.0 and r["dup5_frac"] == 0.0 and r["keep"]


def test_remove_repetitive(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"tok{i}" for i in range(30))),
            (2, "bad " * 50),
        ],
        "doc_id long, text string",
    )
    kept = [r["doc_id"] for r in rep.remove_repetitive(df).collect()]
    assert kept == [1]


def test_gopher_rules_each_rule_fires(spark):
    """Hand-built docs violating exactly one rule each; a clean doc
    passes all seven."""
    from embeddingsearch_spark.operators.repetition import gopher_rules

    clean = (
        "the quick brown fox jumps over the lazy dog and that "
        "hound have been with many other animals of note today"
    )
    rows = [
        (1, clean),
        (2, "the of and"),                       # too few words
        (3, "### " * 30 + clean),                # symbol ratio
        (4, clean + "\n" + "\n".join("- b" for _ in range(30))),  # bullets
        (5, clean + "\nwait...\nmore...\nend..."),  # ellipsis lines
        (6, clean + " " + " ".join(str(i) for i in range(40))),  # alpha
        (7, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh "
            "jj kk ll zx cv bn mq wa sd fg hj kl qw er ty ui op"),  # stop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_rules(df, "doc_id", "text", min_words=10).collect()
    }
    assert out[1]["keep"]
    assert not out[2]["r_words"] and not out[2]["keep"]
    assert not out[3]["r_symbol"]
    assert not out[4]["r_bullet"]
    assert not out[5]["r_ellipsis"]
    assert not out[6]["r_alpha"]
    assert not out[7]["r_stop"]
