"""Web-archive (WARC/WET) source — the CommonCrawl ingestion format a
training-data pipeline actually consumes (public spec: ISO 28500 /
iipc/warc-specifications; WET = "conversion" records carrying extracted
plain text).

Scale shape: the archive FILE is the unit of parallelism — CommonCrawl
ships ~150 MB gzip members, one crawl = ~90k files, so a listing glob
fans out across executors naturally via the ``binaryFile`` reader (one
file per row) and each task streams its file's records through a
constant-memory parser inside ``mapInPandas``. Text never returns to
the driver; malformed records are counted, not fatal.

For archives beyond executor-comfortable sizes, split upstream (the
format is a plain catenation of records; gzip members concatenate), or
point the reader at a pre-split listing — the parser itself is
record-streaming either way.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WET_SCHEMA = (
    "path string, record_id string, target_uri string, warc_date string, "
    "content_type string, length long, text string"
)


def _parse_warc_stream(stream: io.BufferedIOBase):
    """Yield (headers: dict, body: bytes) per WARC record from a byte
    stream — constant memory, no regex: read header lines to the blank
    line, then exactly Content-Length body bytes, then the record
    separator (CRLF CRLF)."""
    while True:
        # skip blank lines between records; EOF -> done
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            # not a record boundary — skip garbage until next record
            continue
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if not hline or not hline.strip():
                break
            if b":" in hline:
                k, v = hline.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            n = int(headers.get("content-length", "0"))
        except ValueError:
            n = 0
        body = stream.read(n) if n > 0 else b""
        yield headers, body


def iter_wet_records(raw: bytes, path: str = ""):
    """Yield WET 'conversion' record tuples from raw (optionally gzip)
    archive bytes — shared by the Spark source and its tests."""
    if raw[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    for headers, body in _parse_warc_stream(stream):
        if headers.get("warc-type") != "conversion":
            continue  # warcinfo / request / response metadata records
        yield (
            path,
            headers.get("warc-record-id", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            headers.get("content-type", ""),
            len(body),
            body.decode("utf-8", "replace"),
        )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET archives under ``path`` (glob ok; .gz transparent) → one row
    per conversion record: (path, record_id, target_uri, warc_date,
    content_type, length, text). Feed straight into the dedup /
    quality / assembly operators."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "path",
            "record_id",
            "target_uri",
            "warc_date",
            "content_type",
            "length",
            "text",
        ]
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                recs = list(iter_wet_records(bytes(content), str(p)))
                yield pd.DataFrame(recs, columns=cols)

    return files.mapInPandas(run, schema=WET_SCHEMA)
