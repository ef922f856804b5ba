"""MinHash hash_fn option: both hash backends produce verified-exact
near-dup pairs (precision is hash-independent); signatures differ but
schema and banding contract hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.functions.text import word_shingles
from embeddingsearch_spark.operators import dedup as dd

THRESHOLD = 0.5


def _true_jaccard_ok(spark, sf_dir, pairs_df):
    """Every emitted pair must truly have Jaccard >= THRESHOLD."""
    docs = tables.load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("s")
    ).distinct()
    a = sh.withColumnRenamed("doc_id", "id_a")
    b = sh.withColumnRenamed("doc_id", "id_b")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    j = (
        pairs_df.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n", "na")
        .join(sizes.withColumnRenamed("doc_id", "id_b"), "id_b")
        .withColumnRenamed("n", "nb")
        .withColumn(
            "jacc",
            F.coalesce(F.col("n_inter"), F.lit(0))
            / (F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0))),
        )
    )
    bad = j.filter(F.col("jacc") < THRESHOLD).count()
    return bad == 0


@pytest.mark.parametrize("hash_fn", ["sha256", "xxhash64"])
def test_pipeline_precision(spark, sf_dir, hash_fn):
    docs = tables.load(spark, sf_dir, "documents")
    pairs = dd.near_duplicates_minhash(
        docs, "doc_id", "text", threshold=THRESHOLD, hash_fn=hash_fn
    ).select("id_a", "id_b")
    assert _true_jaccard_ok(spark, sf_dir, pairs)


def test_same_schema_different_signatures(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").limit(50)
    sha = dd.minhash_signatures(docs, "doc_id", "text", hash_fn="sha256")
    xxh = dd.minhash_signatures(docs, "doc_id", "text", hash_fn="xxhash64")
    assert [f.name for f in sha.schema] == [f.name for f in xxh.schema]


def test_bad_hash_fn_rejected(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        dd.minhash_signatures(docs, "doc_id", "text", hash_fn="md5")


def test_minhash_config_for_scurve():
    from embeddingsearch_spark.operators.dedup import minhash_config_for

    def collide_p(t, bands, rows):
        return 1.0 - (1.0 - t**rows) ** bands

    for t in (0.3, 0.5, 0.7, 0.9):
        k, bands = minhash_config_for(t, k=128, recall=0.9)
        assert k == 128 and k % bands == 0
        rows = k // bands
        # promised recall at the threshold
        assert collide_p(t, bands, rows) >= 0.9
        # maximally selective: no feasible split with more rows per band
        for b2 in range(1, bands):
            if 128 % b2 == 0 and collide_p(t, b2, 128 // b2) >= 0.9:
                assert 128 // b2 <= rows

    # higher threshold admits more selective (longer) bands
    _, b_lo = minhash_config_for(0.3, k=128)
    _, b_hi = minhash_config_for(0.9, k=128)
    assert 128 // b_hi >= 128 // b_lo


def test_minhash_jaccard_estimate_bounds_and_exact_dup(spark):
    """Identical docs estimate 1.0; the estimate always equals the
    agreeing-component fraction computed from the signatures directly."""
    from embeddingsearch_spark.operators import dedup as dd

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # identical
        (3, "one two three four five six seven"),     # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dd.minhash_signatures(df, "doc_id", "text", k=8, shingle_n=3)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in dd.minhash_jaccard_estimate(sigs, pairs, k=8).collect()
    }
    sig_map = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in sigs.collect()}
    assert est[(1, 2)] == 1.0
    manual_13 = sum(
        a == b for a, b in zip(sig_map[1], sig_map[3])
    ) / 8.0
    assert est[(1, 3)] == manual_13
    assert 0.0 <= est[(1, 3)] <= 1.0


def test_editdist_verify_known_distances(spark):
    from embeddingsearch_spark.operators import dedup as dd

    rows = [(1, "kitten"), (2, "sitting"), (3, "kitten")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dd.editdist_verify(df, pairs, "doc_id", "text").collect()
    }
    assert out[(1, 2)]["edit_dist"] == 3
    assert abs(out[(1, 2)]["edit_sim"] - (1 - 3 / 7)) < 1e-12
    assert out[(1, 3)]["edit_dist"] == 0 and out[(1, 3)]["edit_sim"] == 1.0


def test_editdist_verify_null_text_survives_threshold(spark):
    """NULL-text pairs keep their NULL row at ANY threshold — the verify
    tier must surface them, not silently drop them (the bare >= filter
    would eat NULL sims)."""
    from embeddingsearch_spark.operators import dedup as dd

    rows = [(1, "kitten"), (2, None), (3, "kitten")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dd.editdist_verify(
            df, pairs, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)]["edit_sim"] is None
    assert out[(1, 3)]["edit_sim"] == 1.0
