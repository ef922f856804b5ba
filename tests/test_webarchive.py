"""WET/WARC source: record parsing, gzip transparency, malformed input."""

from __future__ import annotations

import gzip

from embeddingsearch_spark.sources.webarchive import (
    iter_wet_records,
    read_wet,
)


def _wet_bytes() -> bytes:
    def rec(rtype, uri, body: bytes, rid="<urn:uuid:1>"):
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: {rid}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    return (
        rec("warcinfo", "", b"software: test\r\n")
        + rec("conversion", "https://a.example/x", b"hello web text")
        + rec("conversion", "https://b.example/y", "café unicode".encode())
    )


def test_iter_wet_records_plain_and_gzip():
    for raw in (_wet_bytes(), gzip.compress(_wet_bytes())):
        recs = list(iter_wet_records(raw, "f.wet"))
        assert len(recs) == 2  # warcinfo filtered out
        assert recs[0][2] == "https://a.example/x"
        assert recs[0][6] == "hello web text"
        assert recs[1][6] == "café unicode"
        assert recs[0][5] == len(b"hello web text")


def test_iter_wet_records_malformed_garbage():
    raw = b"junk line\r\n" + _wet_bytes() + b"\r\ntrailing junk no header"
    recs = list(iter_wet_records(raw))
    assert len(recs) == 2


def test_read_wet_spark(spark, tmp_path):
    p1 = tmp_path / "a.wet"
    p1.write_bytes(_wet_bytes())
    p2 = tmp_path / "b.wet.gz"
    p2.write_bytes(gzip.compress(_wet_bytes()))
    df = read_wet(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 4  # two conversion records per file
    assert {r["target_uri"] for r in rows} == {
        "https://a.example/x",
        "https://b.example/y",
    }
    texts = sorted({r["text"] for r in rows})
    assert texts == ["café unicode", "hello web text"]
    assert all(r["warc_date"].startswith("2026") for r in rows)
