"""Linear quality classifier: fasttext-style logistic scoring over cheap
engineered text features, entirely scan-stage Catalyst expressions.

Production pipelines (CCNet, fasttext quality filters à la GPT-3/LLaMA data
prep) train a linear model offline on labeled good/bad text and ship only
the weight vector; applying it is a dot product + sigmoid per document.
Expressed declaratively that is zero shuffles, whole-stage-codegen'd, and
runs inside the parquet scan — no model runtime crosses the executor
boundary. Swapping in retrained weights is a parameter change, not a
deploy.

The default weights here are illustrative (tuned only to be non-degenerate
on the synthetic corpus); real deployments pass their trained vector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import quality_metrics

# feature name -> weight; features come from functions.text.quality_metrics
# plus log1p(n_tokens) for a scale-free length signal.
DEFAULT_WEIGHTS: dict[str, float] = {
    "log_n_tokens": 0.8,
    "stopword_ratio": 12.0,
    "punct_ratio": -8.0,
    "digit_ratio": -6.0,
    "avg_token_len": 0.15,
}
DEFAULT_BIAS: float = -4.5


def quality_logit(
    text: Column,
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_BIAS,
) -> Column:
    """The linear score z = bias + w·features(text) as one expression."""
    w = DEFAULT_WEIGHTS if weights is None else weights
    m = quality_metrics(text)
    feats: dict[str, Column] = {
        "log_n_tokens": F.log1p(m["n_tokens"].cast("double")),
        "stopword_ratio": m["stopword_ratio"],
        "punct_ratio": m["punct_ratio"],
        "digit_ratio": m["digit_ratio"],
        "avg_token_len": m["avg_token_len"],
    }
    z: Column = F.lit(float(bias))
    for name, weight in w.items():
        z = z + F.lit(float(weight)) * feats[name]
    return z


def classify_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_BIAS,
) -> DataFrame:
    """(id, quality_logit, quality_prob, is_high_quality) per document.

    The label compares the logit against 0 (≡ prob ≥ 0.5) so the decision
    never sits on a float-formatting boundary.
    """
    z = quality_logit(F.col(text_col), weights, bias)
    return df.select(
        F.col(id_col),
        z.alias("quality_logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality_prob"),
        (z >= 0).alias("is_high_quality"),
    )
