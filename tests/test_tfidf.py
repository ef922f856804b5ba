"""TF-IDF operator: hand-computed fixture + invariants."""

from __future__ import annotations

import math

from pyspark.sql import Row

from embeddingsearch_spark.operators import tfidf


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="Apple cherry cherry date"),
        ]
    )


def test_vocabulary_df_cf(spark):
    rows = {
        r.token: (r.df, r.cf)
        for r in tfidf.vocabulary(_docs(spark)).collect()
    }
    # lowercased: 'Apple' folds into 'apple'
    assert rows == {
        "apple": (2, 3),
        "banana": (2, 2),
        "cherry": (2, 3),
        "date": (1, 1),
    }


def test_top_terms_hand_computed(spark):
    out = tfidf.tfidf_top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for recs in by_doc.values():
        recs.sort(key=lambda r: r.rank)

    idf = lambda df: math.log(4.0 / (df + 1.0))  # N=3 → (N+1)=4
    # doc 1: apple tf=2 df=2 → 2*ln(4/3); banana tf=1 df=2 → ln(4/3)
    d1 = by_doc[1]
    assert [r.term for r in d1] == ["apple", "banana"]
    assert abs(d1[0].tfidf - 2 * idf(2)) < 1e-12
    # doc 2: banana and cherry tie (tf=1, df=2) → token asc breaks the tie
    assert [r.term for r in by_doc[2]] == ["banana", "cherry"]
    # doc 3: cherry tf=2 beats date (higher idf but tf=1):
    # 2*ln(4/3)=0.575 > ln(4/2)=0.693? No — date wins: ln(2) > 2*ln(4/3)?
    # 2*0.2877=0.5754 < 0.6931 → date first.
    assert [r.term for r in by_doc[3]] == ["date", "cherry"]


def test_rank_dense_and_bounded(spark):
    out = tfidf.tfidf_top_terms(_docs(spark), k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert max(ranks) <= 3


def test_oov_profile(spark):
    from embeddingsearch_spark.operators.tfidf import oov_profile

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # with V=2 vocab {a, b}: 0 OOV
            (2, "a b zz qq"),        # 2 of 4 OOV
            (3, "zz zz zz zz"),       # all OOV (zz cf=7 > b cf=2 though!)
            (4, ""),                  # no tokens -> no row
        ],
        "doc_id long, text string",
    )
    # cf: a=4, zz=7, b=2, qq=1 -> V=2 vocab is {zz, a}
    out = {
        r["doc_id"]: r
        for r in oov_profile(docs, vocab_size=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_oov"] == 1 and out[1]["n_tokens"] == 4  # b OOV
    assert out[2]["n_oov"] == 2  # b, qq
    assert out[3]["oov_rate"] == 0.0  # zz in vocab
