"""End-to-end web-archive ingest: WET records → substring-granular
ingest gate → quality policy → accepted corpus.

Run:  python examples/web_ingest.py

Synthesizes a tiny WET archive (the CommonCrawl text format), reads it
with sources/webarchive.read_wet, gates the records against an indexed
corpus with the winnowed-fingerprint gate, and applies the composed
quality policy to what survives.
"""

from __future__ import annotations

import gzip
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _wet(records: list[tuple[str, str]]) -> bytes:
    out = b""
    for i, (uri, text) in enumerate(records):
        body = text.encode()
        out += (
            f"WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:{i}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from embeddingsearch_spark.operators import winnow as wn
    from embeddingsearch_spark.session import get_spark
    from embeddingsearch_spark.sources.webarchive import read_wet

    spark = get_spark("web-ingest-example", shuffle_partitions=4)

    indexed = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten eleven"),
        ],
        "doc_id long, text string",
    )

    crawl = tempfile.mkdtemp(prefix="es_wet_")
    (Path(crawl) / "part-0.wet.gz").write_bytes(
        gzip.compress(
            _wet(
                [
                    # re-crawl of an indexed page (embedded span) -> gated
                    (
                        "https://dup.example/a",
                        "nav bar alpha beta gamma delta epsilon zeta eta "
                        "theta iota kappa footer",
                    ),
                    # fresh content -> accepted
                    (
                        "https://new.example/b",
                        "volcano plume heights were revised after the "
                        "overnight lidar calibration pass",
                    ),
                ]
            )
        )
    )

    wet = read_wet(spark, crawl + "/*").withColumn(
        "doc_id", F.monotonically_increasing_id() + 100
    )
    flags = wn.incremental_winnow_gate(
        wet.select("doc_id", "text"), indexed, "doc_id", "text"
    )
    accepted = wet.join(flags.filter("is_new").select("doc_id"), "doc_id")
    print(f"WET records: {wet.count()}, accepted after winnow gate: "
          f"{accepted.count()}")
    accepted.select("target_uri", "length").show(truncate=False)

    # the survivors then run through the composed curation entry point
    # (normalize → dedup tiers → gates), funnel included — the same
    # policy object a batch pipeline would persist
    from embeddingsearch_spark.pipeline import CurationPolicy, curate

    result = curate(
        accepted.select("doc_id", "text"),
        CurationPolicy(
            normalize=True,
            exact_dedup=True,
            neardup=True,
            gopher=True,
            min_words=5,
            perplexity=False,
        ),
    )
    print("curation funnel over the accepted records:")
    result.funnel.show()
    spark.stop()


if __name__ == "__main__":
    main()
