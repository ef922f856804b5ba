"""Boilerplate line removal + unigram LM scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import boilerplate, lmscore


def _docs(spark):
    footer = "copyright footer"
    rows = [
        (1, f"unique one\n{footer}"),
        (2, f"unique two\n{footer}"),
        (3, f"unique three\n{footer}"),
        (4, footer),                      # only boilerplate → empty text
        (5, "unique five\n\nunique six"),  # blank line survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_boilerplate_lines(spark):
    out = {
        r["doc_id"]: r
        for r in boilerplate.remove_boilerplate_lines(
            _docs(spark), "doc_id", "text", max_df=2
        ).collect()
    }
    assert out[1]["text"] == "unique one"
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 2
    assert out[4]["text"] == "" and out[4]["n_removed"] == 1
    # blank separator line is exempt and order is preserved
    assert out[5]["text"] == "unique five\n\nunique six"
    assert out[5]["n_removed"] == 0


def test_line_document_frequency_counts_docs_not_instances(spark):
    df = spark.createDataFrame(
        [(1, "a\na"), (2, "a")], "doc_id long, text string"
    )
    freq = {
        r["line_fp"]: r["df"]
        for r in boilerplate.line_document_frequency(
            df, "doc_id", "text"
        ).collect()
    }
    assert set(freq.values()) == {2}  # 'a' appears in 2 docs (not 3 rows)


def test_unigram_scores_match_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    # counts: a=3, b=1, c=1; N=5; vocab keeps top-2 = a (3), b (1, ties → 'b' < 'c')
    out = {
        r["doc_id"]: r
        for r in lmscore.unigram_scores(
            df, "doc_id", "text", vocab_size=2, smoothing=1.0
        ).collect()
    }
    denom = 5 + 1.0 * (2 + 1)
    pa, pb, poov = 4 / denom, 2 / denom, 1 / denom
    exp_doc1 = -(2 * math.log(pa) + math.log(pb)) / 3
    assert abs(out[1]["avg_nll"] - exp_doc1) < 1e-12
    assert out[1]["n_oov"] == 0
    assert out[2]["n_oov"] == 1  # 'c' fell below the vocab cut
    exp_doc2 = -(math.log(pa) + math.log(poov)) / 2
    assert abs(out[2]["avg_nll"] - exp_doc2) < 1e-12
    assert abs(out[2]["perplexity"] - math.exp(exp_doc2)) < 1e-9


def test_lm_score_plan_broadcasts_vocab_two_shuffles(spark):
    """Vocab joins by broadcast (never shuffle the exploded corpus for
    it); total exchanges = vocab count + per-doc aggregate."""
    from embeddingsearch_spark.plans import inspect as pi

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 9).cast("string"),
                 F.lit(" common words here")).alias("text"),
    )
    out = lmscore.unigram_scores(df, "doc_id", "text", vocab_size=8)
    pi.assert_broadcast_join(out)
    assert pi.count_shuffles(out) <= 2


def test_unigram_reference_corpus(spark):
    ref = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    target = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    out = lmscore.unigram_scores(
        target, "doc_id", "text", vocab_size=10, smoothing=1.0, reference=ref
    ).collect()[0]
    assert out["n_tokens"] == 2 and out["n_oov"] == 1


def test_perplexity_buckets_exact_ntile(spark):
    """17 docs into 3 buckets → ntile sizes 6/6/5; head holds the
    lowest-perplexity docs; empty docs are dropped like CCNet drops
    unscorable lines."""
    rows = [(i, "common " * 3 + f"rare{i}") for i in range(8)]
    rows += [(100 + i, "common common common common") for i in range(9)]
    rows.append((999, "   "))  # unscorable
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lmscore.perplexity_buckets(
        df, "doc_id", "text", n_buckets=3, vocab_size=4
    ).collect()
    assert len(out) == 17  # empty doc dropped
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {1: 6, 2: 6, 3: 5}
    segs = {r["bucket"]: r["segment"] for r in out}
    assert segs == {1: "head", 2: "middle", 3: "tail"}
    # all-common docs have lower perplexity than rare-token docs:
    # every all-common doc must land in a bucket <= any rare doc's
    max_common = max(r["bucket"] for r in out if r["doc_id"] >= 100)
    min_rare = min(r["bucket"] for r in out if r["doc_id"] < 100)
    assert max_common <= min_rare


def test_dedup_paragraphs_first_occurrence_survives(spark):
    """Cross-doc dup: first (doc_id, pos) copy survives, later cut;
    intra-doc dup: second copy in the same doc cut; unique paragraphs
    and blanks untouched."""
    rows = [
        (1, "alpha beta\n\nshared promo"),
        (2, "shared promo\n\ngamma delta"),
        (3, "echo\n\necho\n\nfoxtrot"),
        (4, "unique only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate.dedup_paragraphs(df, "doc_id", "text").collect()
    }
    assert out[1]["text"] == "alpha beta\n\nshared promo"
    assert out[1]["n_removed"] == 0
    # doc 2's copy of "shared promo" loses to doc 1's
    assert out[2]["text"] == "gamma delta"
    assert out[2]["n_removed"] == 1
    # intra-doc: first "echo" survives, second cut
    assert out[3]["text"] == "echo\n\nfoxtrot"
    assert out[3]["n_removed"] == 1
    assert out[4]["text"] == "unique only"
    assert out[4]["n_paragraphs"] == 1


def test_clean_web_text_normalization(spark):
    """CRLF, unicode spaces, zero-width, control chars, blank-line runs
    all normalize; plain clean text is a fixed point."""
    from embeddingsearch_spark.functions.text import clean_web_text

    rows = [
        (1, "a\u00a0b\u200bc"),                # NBSP -> space, ZWSP gone
        (2, "x\r\ny\rz"),                     # CRLF / CR -> LF
        (3, "p   q\n\n\n\n\nr"),            # runs collapse
        (4, "\x07bell\x1f and\ttab"),         # controls gone, tab->space
        (5, "already clean\ntwo lines"),
        (6, "  \u3000 padded   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", clean_web_text(F.col("text")).alias("c")
        ).collect()
    }
    assert out[1] == "a bc"
    assert out[2] == "x\ny\nz"
    assert out[3] == "p q\n\nr"
    assert out[4] == "bell and tab"
    assert out[5] == "already clean\ntwo lines"
    assert out[6] == "padded"


def test_bigram_scores_hand_computed(spark):
    """Two tiny docs; verify against a directly-computed NLL."""
    import math

    rows = [(1, "a b a b"), (2, "b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in lmscore.bigram_scores(
            df, "doc_id", "text", vocab_size=10, smoothing=1.0, lam=0.7
        ).collect()
    }
    # corpus bigrams: d1: (a,b),(b,a),(a,b); d2: (b,a)
    # c2: (a,b)=2, (b,a)=2 ; c1: a=2, b=2
    # unigrams: a=3, b=3, N=6, k=2 -> p_uni(w)= (3+1)/(6+3) = 4/9
    p_ab = 0.7 * (2 / 2) + (1.0 - 0.7) * (4 / 9)
    nll_ab = -math.log(p_ab)
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_nll"] - nll_ab) < 1e-12  # all bigrams same p
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["perplexity"] - math.exp(nll_ab)) < 1e-9


def test_bigram_scores_reference_unseen_history(spark):
    """Scoring against a reference corpus: an unseen history falls back
    to the unigram term alone (no NULLs, no crash)."""
    ref = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    target = spark.createDataFrame(
        [(9, "z z z")], "doc_id long, text string"
    )
    out = lmscore.bigram_scores(
        target, "doc_id", "text", vocab_size=10, reference=ref
    ).collect()
    assert len(out) == 1 and out[0]["n_bigrams"] == 2
    assert out[0]["avg_nll"] is not None and out[0]["avg_nll"] > 0


def test_html_to_text_extraction(spark):
    """Scripts/styles/comments dropped whole, block tags become line
    breaks, entities decode, whitespace normalizes."""
    from embeddingsearch_spark.functions.text import html_to_text

    html = (
        '<html><head><style>p {color:red}</style>'
        '<script type="text/js">var x = "<p>";</script></head>'
        "<body><h1>Title</h1><p>First &amp; second &lt;tag&gt;</p>"
        "<!-- hidden --><div>Item&nbsp;one<br>line two</div>"
        "<p>it&#39;s &quot;quoted&quot;</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == (
        "\nTitle\n\nFirst & second <tag>\n\nItem one\nline two\n\n"
        "it's \"quoted\"\n"
    )


def test_fix_mojibake_repairs_classic_damage(spark):
    from embeddingsearch_spark.functions.text import fix_mojibake

    from embeddingsearch_spark.functions.text import MOJIBAKE_PAIRS

    dmg = {f: m for m, f in MOJIBAKE_PAIRS}
    rows = [
        (1, "cafÃ© naÃ¯ve?"),        # Ã© -> é (Ã¯ not in table: untouched)
        (2, f"don{dmg['’']}t {dmg['“']}quote{dmg['”']}"),
        (3, "plain ascii stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", fix_mojibake(F.col("text")).alias("t")
        ).collect()
    }
    assert out[1] == "café naÃ¯ve?"
    assert out[2] == "don’t “quote”"
    assert out[3] == "plain ascii stays"


def test_fix_mojibake_literal_bytes(spark):
    """Literal-expected regression (not derived from MOJIBAKE_PAIRS):
    real cp1252-family mojibake decodes PER BYTE, so the damaged form of
    the closing curly quote ” (utf-8 E2 80 9D) is 'â€\x9d' (0x80 -> €,
    0x9D undefined -> passthrough), NOT latin-1's 'â\\x80\\x9d'. A
    whole-sequence latin-1 fallback derivation never repairs this, the
    single most common closing-quote damage on the web."""
    from embeddingsearch_spark.functions.text import fix_mojibake

    rows = [
        (1, "say â€œhiâ€\x9d"),  # â€œhiâ€\x9d
        (2, "itâ€™s â€“ ok"),  # â€™ â€“
        (3, "cafÃ© Â\xa0end"),  # Ã© Â\xa0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", fix_mojibake(F.col("text")).alias("t")
        ).collect()
    }
    assert out[1] == "say “hi”"
    assert out[2] == "it’s – ok"
    assert out[3] == "café  end"


def test_dedup_paragraphs_literal_separator(spark):
    """A regex-metacharacter separator is treated literally."""
    df = spark.createDataFrame(
        [(1, "aa||bb||aa"), (2, "bb||cc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate.dedup_paragraphs(
            df, "doc_id", "text", sep="||"
        ).collect()
    }
    assert out[1]["text"] == "aa||bb" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "cc" and out[2]["n_removed"] == 1
