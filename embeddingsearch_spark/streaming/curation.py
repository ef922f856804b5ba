"""Streaming curation: the batch `pipeline.curate` gates that are
streaming-safe, applied to an unbounded document feed.

Streaming-safe means: scan-stage projections (Gopher word/alpha rules,
language allowlist — zero state) plus the state-store exact-dedup
(`dropDuplicates` on the content fingerprint — one 32-byte hash per
unique doc, hash-partitioned across state stores; use
``dropDuplicatesWithinWatermark`` upstream to bound it on unbounded
feeds). Order-dependent stages (near-dup banding, corpus-relative
perplexity cuts, global mixing) belong to the batch pipeline or to the
`incremental_*` gate operators that compare a batch AGAINST an indexed
corpus — this module is the per-record fast path that runs before
anything touches the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curation_gate(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 25,
    max_words: int = 100_000,
    min_alpha_ratio: float = 0.8,
    lang_allow: tuple[str, ...] = (),
    dedup_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Filter a document stream to curation survivors.

    Gates (all scan-stage, no state): word-count bounds; fraction of
    words containing an alphabetic character >= ``min_alpha_ratio``;
    optional heuristic-language allowlist. Then state-store exact dedup
    on ``(*dedup_cols, fingerprint)`` — pass e.g. ``("source",)`` to
    scope dedup per feed. Emits the input columns plus ``fp`` and
    ``n_words``."""
    from embeddingsearch_spark.functions.text import (
        fingerprint,
        lang_id,
        tokens,
    )

    # materialize the token array ONCE (the HOF-lambda hoist
    # convention): n_words and the alpha filter both read `_t` instead
    # of re-tokenizing per expression
    staged = stream.withColumn("_t", tokens(F.col(text_col)))
    n_words = F.size("_t").cast("double")
    safe_w = F.when(n_words == 0, F.lit(1.0)).otherwise(n_words)
    alpha = (
        F.size(
            F.filter(F.col("_t"), lambda t: t.rlike(r"\p{L}"))
        ).cast("double")
        / safe_w
    )
    gated = (
        staged.withColumn("n_words", n_words.cast("long"))
        .filter(
            (n_words >= min_words)
            & (n_words <= max_words)
            & (alpha >= min_alpha_ratio)
        )
        .drop("_t")
    )
    if lang_allow:
        gated = gated.filter(
            lang_id(F.col(text_col)).isin(*lang_allow)
        )
    gated = gated.withColumn("fp", fingerprint(F.col(text_col)))
    return gated.dropDuplicates([*dedup_cols, "fp"])
