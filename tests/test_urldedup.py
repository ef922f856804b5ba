"""URL canonicalization + URL-level dedup + domain blocklist."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.functions import urls as U
from embeddingsearch_spark.operators import urldedup
from embeddingsearch_spark.plans import inspect as pi


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(U.canonical_url(F.col("url")).alias("c")).first()["c"]


def test_canonical_collapses_equivalent_forms(spark):
    variants = [
        "https://WWW.Example.com:443/a/b/?utm_source=feed&b=2&a=1",
        "http://example.com:80/a/b?a=1&b=2",
        "https://example.com/a/b/?b=2&a=1&fbclid=XYZ",
        "example-unrelated",  # scheme-less → host '' (distinct group)
    ]
    canons = [_canon(spark, u) for u in variants]
    assert canons[0] == canons[1] == canons[2] == "example.com/a/b?a=1&b=2"
    assert canons[3] == ""


def test_canonical_preserves_distinctions(spark):
    # non-default port, different path case, and real params all survive
    assert _canon(spark, "https://a.com:8443/x") == "a.com:8443/x"
    assert _canon(spark, "https://a.com/X") != _canon(spark, "https://a.com/x")
    assert _canon(spark, "https://a.com/?page=2") == "a.com?page=2"
    # fragment never distinguishes
    assert _canon(spark, "https://a.com/x#top") == _canon(spark, "https://a.com/x")


def test_url_duplicates_groups(spark):
    rows = [
        (1, "https://www.site.com/p?utm_campaign=x"),
        (2, "http://site.com/p/"),
        (3, "https://site.com/q"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = urldedup.url_duplicates(df, "id", "url").orderBy("id").collect()
    assert [r["canonical_id"] for r in out] == [1, 1, 3]
    assert [r["is_duplicate"] for r in out] == [True, True, False]
    assert out[0]["domain"] == "site.com"


def test_blocklist_exact_and_suffix(spark):
    rows = [
        (1, "https://good.com/a"),
        (2, "https://bad.com/a"),
        (3, "https://sub.spam.invalid/a"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = urldedup.filter_blocked_domains(
        df, "url", blocked=["bad.com"], blocked_suffixes=[".invalid"]
    )
    assert [r["id"] for r in kept.orderBy("id").collect()] == [1]


def test_blocklist_plan_broadcasts_and_canon_is_scan_stage(spark):
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("https://d"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p")).alias("url"),
    )
    kept = urldedup.filter_blocked_domains(df, "url", blocked=["d0.com"])
    pi.assert_broadcast_join(kept)
    assert pi.count_shuffles(kept) == 0  # anti-join broadcast, filter scan-side
    # url_duplicates shuffles only for the canon groupBy + group join
    dup = urldedup.url_duplicates(df, "id", "url")
    assert pi.count_shuffles(dup) <= 2
