"""Char-n-gram Naive Bayes language ID: discrimination on real
multilingual text, determinism, and edge cases."""

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import langid

# Small genuinely-multilingual training corpus (public-domain-style
# sample sentences, typed here — no external data). Three docs per
# language so priors are uniform and discrimination comes from grams.
TRAIN = [
    ("en", "the quick brown fox jumps over the lazy dog near the river"),
    ("en", "this is a simple english sentence with common short words"),
    ("en", "where there is a will there is always another way forward"),
    ("de", "der schnelle braune fuchs springt über den faulen hund am fluss"),
    ("de", "dies ist ein einfacher deutscher satz mit kurzen wörtern"),
    ("de", "wo ein wille ist da ist auch immer ein weg nach vorne"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux"),
    ("fr", "ceci est une phrase française simple avec des mots courts"),
    ("fr", "là où il y a une volonté il y a toujours un chemin"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso del río"),
    ("es", "esta es una oración española sencilla con palabras cortas"),
    ("es", "donde hay voluntad siempre hay otro camino hacia adelante"),
]

TEST_DOCS = [
    (1, "the dog and the fox were there by the river", "en"),
    (2, "über den fluss und durch den wald der schnelle weg", "de"),
    (3, "le chien et le renard sont là par la rivière", "fr"),
    (4, "el perro y el zorro están por el río siempre", "es"),
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        [(i, t, lg) for i, (lg, t) in enumerate(TRAIN)],
        "doc_id long, text string, lang string",
    )
    return langid.charngram_lang_model(
        train, "doc_id", "text", "lang", n=3, vocab_size=512
    )


def test_charngram_extract_counts(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "ab"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = langid.charngram_extract(df, "doc_id", "text", n=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["gram"])
    assert sorted(got[1]) == ["abc", "bcd"]
    assert 2 not in got and 3 not in got and 4 not in got


def test_discriminates_real_languages(spark, model):
    dense, langs = model
    docs = spark.createDataFrame(
        TEST_DOCS, "doc_id long, text string, expected string"
    )
    pred = langid.lang_id_predict(
        docs, "doc_id", "text", dense, langs, n=3
    )
    got = {r["doc_id"]: r["lang_pred"] for r in pred.collect()}
    want = {d: e for d, _, e in TEST_DOCS}
    assert got == want


def test_model_is_dense_and_bounded(spark, model):
    dense, langs = model
    n_langs = langs.count()
    assert n_langs == 4
    # dense = exactly L x V rows (V capped at vocab_size; smaller here
    # because the corpus has fewer distinct grams than the cap)
    v = dense.select("gram").distinct().count()
    assert v <= 512
    assert dense.count() == n_langs * v


def test_empty_and_oov_docs_score_deterministically(spark, model):
    dense, langs = model
    docs = spark.createDataFrame(
        [(1, ""), (2, "zzqx"), (3, None)],
        "doc_id long, text string",
    )
    pred = langid.lang_id_predict(
        docs, "doc_id", "text", dense, langs, n=3
    ).collect()
    got = {r["doc_id"]: r for r in pred}
    # every doc gets exactly one prediction row
    assert set(got) == {1, 2, 3}
    # zero-gram docs: score = log prior only; uniform priors → tie →
    # smallest lang code
    assert got[1]["lang_pred"] == "de" and got[1]["n_grams"] == 0
    assert got[3]["lang_pred"] == "de" and got[3]["n_grams"] == 0
    # all-OOV doc: prior + n_oov * floor; floors differ per lang only
    # via n_lang, prediction still deterministic
    assert got[2]["n_grams"] == 2


def test_ppl_buckets_by_predicted_labels(spark, model):
    """The composition the trained labels exist for: predict a language
    per doc, then run the CCNet per-group perplexity cut keyed on
    lang_pred. Every group cuts into exact equal-count buckets."""
    from embeddingsearch_spark.operators.lmscore import (
        perplexity_buckets_by,
    )

    dense, langs = model
    # 6 docs per language, from held-out-ish sentences built on the
    # training vocabulary so predictions are the intended language
    texts = {
        "en": "the fox and the dog ran over the river all the way",
        "de": "der hund und der fuchs springen über den weg am fluss",
        "fr": "le chien et le renard sont par le chemin toujours là",
        "es": "el perro y el zorro saltan sobre el camino del río",
    }
    rows = []
    i = 0
    for lg, t in texts.items():
        for j in range(6):
            rows.append((i, f"{t} extra{j}"))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pred = langid.lang_id_predict(
        docs, "doc_id", "text", dense, langs, n=3
    ).select("doc_id", "lang_pred")
    labeled = docs.join(pred, "doc_id")
    out = perplexity_buckets_by(
        labeled, "doc_id", "text", "lang_pred", n_buckets=3,
        vocab_size=256,
    ).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["lang_pred"], []).append(r["bucket"])
    # four predicted groups of 6 docs, each cut into 3 buckets of 2
    assert set(by_group) == set(texts)
    for lg, buckets in by_group.items():
        assert sorted(buckets) == [1, 1, 2, 2, 3, 3], (lg, buckets)


def test_prediction_matches_numpy_mirror(spark, model):
    """Replay train+predict in pure Python/NumPy and compare scores —
    the same style of mirror the k-means operator pins against."""
    import math
    from collections import Counter

    dense, langs = model
    vocab = {r["gram"] for r in dense.select("gram").distinct().collect()}
    V = 512
    s = 1.0

    def grams(t):
        t = t.lower()
        return [t[i : i + 3] for i in range(len(t) - 2)]

    by_lang = {}
    docs_per_lang = Counter()
    for lg, t in TRAIN:
        docs_per_lang[lg] += 1
        by_lang.setdefault(lg, Counter()).update(
            g for g in grams(t) if g in vocab
        )
    total_docs = len(TRAIN)
    n_lang = {lg: sum(c.values()) for lg, c in by_lang.items()}

    def score(text, lg):
        sc = math.log(docs_per_lang[lg] / total_docs)
        denom = n_lang[lg] + s * (V + 1)
        for g in grams(text):
            if g in vocab:
                sc += math.log((by_lang[lg][g] + s) / denom)
            else:
                sc += math.log(s / denom)
        return sc

    docs = spark.createDataFrame(
        TEST_DOCS, "doc_id long, text string, expected string"
    )
    pred = {
        r["doc_id"]: r
        for r in langid.lang_id_predict(
            docs, "doc_id", "text", dense, langs, n=3
        ).collect()
    }
    for doc_id, text, _ in TEST_DOCS:
        want_lang, want_score = min(
            ((lg, score(text, lg)) for lg in n_lang),
            key=lambda p: (-round(p[1], 6), p[0]),
        )
        assert pred[doc_id]["lang_pred"] == want_lang
        assert abs(pred[doc_id]["score"] - round(want_score, 6)) < 1e-5
