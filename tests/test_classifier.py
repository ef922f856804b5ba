"""Linear quality classifier: edge cases + weight override."""

from __future__ import annotations

import math

from pyspark.sql import Row

from embeddingsearch_spark.operators import classifier


def test_empty_and_plain_text(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="the cat sat on the mat with a hat"),
        ]
    )
    rows = {r.doc_id: r for r in classifier.classify_quality(df).collect()}
    # empty text: all features 0 → logit == bias, prob = sigmoid(bias)
    assert abs(rows[1].quality_logit - classifier.DEFAULT_BIAS) < 1e-9
    assert abs(
        rows[1].quality_prob
        - 1.0 / (1.0 + math.exp(-classifier.DEFAULT_BIAS))
    ) < 1e-9
    assert rows[1].is_high_quality is False
    # stopword-heavy english: positive class under default weights
    assert rows[2].quality_prob > rows[1].quality_prob


def test_weight_override_flips_label(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat on the mat with a hat")]
    )
    hi = classifier.classify_quality(df, bias=10.0).collect()[0]
    lo = classifier.classify_quality(df, bias=-100.0).collect()[0]
    assert hi.is_high_quality and not lo.is_high_quality
    # prob is a monotone map of the logit
    assert hi.quality_prob > lo.quality_prob
