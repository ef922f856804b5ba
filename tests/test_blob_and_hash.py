"""Reference wire-format parity: float32-LE BLOB codec round trip (S2/S3)
and the base64(sha256) datapoint hash form (F1)."""

from __future__ import annotations

import base64
import hashlib
import struct

from pyspark.sql import functions as F

from embeddingsearch_spark.functions.blob import blob_to_vector, vector_to_blob
from embeddingsearch_spark.functions.text import text_hash


def test_blob_codec_roundtrip_and_layout(spark):
    vecs = [[1.0, -2.5, 0.0], [3.25], []]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<float>")
    out = df.select(
        "v",
        vector_to_blob(F.col("v")).alias("blob"),
    ).withColumn("back", blob_to_vector(F.col("blob")))
    for r in out.collect():
        # exact byte layout: little-endian float32, reference Buffer.BlockCopy
        assert bytes(r.blob) == struct.pack(f"<{len(r.v)}f", *r.v)
        assert r.back == r.v


def test_base64_sha256_parity(spark):
    """The reference stores base64(sha256-bytes) (SearchdomainHelper.cs:
    455-458); engine canonical form is sha256 hex, with the base64 form
    derivable exactly."""
    texts = ["hello", "", "héllo wörld", "a\nb"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        "t",
        text_hash(F.col("t")).alias("hex_hash"),
        F.base64(F.unhex(text_hash(F.col("t")))).alias("b64_hash"),
    )
    for r in out.collect():
        digest = hashlib.sha256(r.t.encode()).digest()
        assert r.hex_hash == digest.hex()
        assert r.b64_hash == base64.b64encode(digest).decode()
