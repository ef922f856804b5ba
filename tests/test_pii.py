"""PII redaction (functions/pii.py): pattern coverage, chaining order,
and that redaction leaves clean text untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.functions import pii


def _redact(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(pii.redact_pii(F.col("text")).alias("r")).first()["r"]


def test_all_kinds(spark):
    got = _redact(
        spark,
        "mail a.b+c@ex.co call 555-123-4567 ssn 123-45-6789 ip 10.0.0.1 end",
    )
    assert got == "mail <EMAIL> call <PHONE> ssn <SSN> ip <IP> end"


def test_ssn_wins_over_phone_shape(spark):
    # dashed 3-2-4 digits is SSN, 3-3-4 is phone — order must not bleed
    assert _redact(spark, "a 111-22-3333 b 111-222-3333") == "a <SSN> b <PHONE>"


def test_clean_text_unchanged(spark):
    s = "version 1.2 of the 3000 series shipped on 2024-01-02"
    assert _redact(spark, s) == s


def test_counts(spark):
    df = spark.createDataFrame(
        [("x@y.io and z@w.ai from 8.8.8.8",)], "text string"
    )
    row = df.select(*pii.pii_counts(F.col("text")).values()).first()
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (
        2, 0, 0, 1,
    )


def test_kind_selection(spark):
    df = spark.createDataFrame([("x@y.io from 8.8.8.8",)], "text string")
    got = df.select(
        pii.redact_pii(F.col("text"), kinds=["email"]).alias("r")
    ).first()["r"]
    assert got == "<EMAIL> from 8.8.8.8"
