"""URL-level deduplication and domain filtering for web corpora.

The cheapest dedup pass in a crawl pipeline: canonicalize the URL
(functions/urls.py — scan-stage regexp work) and collapse exact canonical
matches BEFORE any content is hashed or embedded. At 100 TB the groupBy
shuffles only ``(id, canon_url)`` pairs — never document bodies — and the
domain blocklist is a broadcast anti-join (blocklists are KBs, corpora
are TBs).

The reference engine has no URL surface (SURVEY.md §2); this extends the
training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.urls import canonical_url, url_host


def url_duplicates(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Map every row to its canonical-URL group: ``(id, domain, canon_url,
    canonical_id, group_size, is_duplicate)`` where canonical_id is the
    group's min id. Mirrors `dedup.exact_duplicates` but keys on the
    canonical URL, so recrawls, tracking-tagged links, and http/https
    twins collapse without reading content."""
    canon = df.select(
        F.col(id_col),
        url_host(F.col(url_col)).alias("domain"),
        canonical_url(F.col(url_col)).alias("canon_url"),
    )
    groups = canon.groupBy("canon_url").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return canon.join(groups, "canon_url").select(
        id_col,
        "domain",
        "canon_url",
        "canonical_id",
        "group_size",
        (F.col("group_size") > 1).alias("is_duplicate"),
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | Sequence[str] | None = None,
    blocked_suffixes: Sequence[str] | None = None,
) -> DataFrame:
    """Drop rows whose URL host is on a blocklist (exact domains and/or
    domain suffixes like ``".invalid"``). Exact domains anti-join against
    a broadcast blocklist DataFrame/list; suffixes are a scan-stage
    endswith filter — neither shuffles the corpus."""
    out = df.withColumn("_domain", url_host(F.col(url_col)))
    if blocked is not None:
        if not isinstance(blocked, DataFrame):
            spark = df.sparkSession
            blocked = spark.createDataFrame(
                [(d,) for d in blocked], "domain string"
            )
        out = out.join(
            F.broadcast(blocked.select(F.col("domain").alias("_domain"))),
            "_domain",
            "left_anti",
        )
    for suffix in blocked_suffixes or []:
        out = out.filter(~F.col("_domain").endswith(suffix))
    return out.drop("_domain")
