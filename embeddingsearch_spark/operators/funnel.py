"""Pipeline funnel accounting: how many docs survive each curation
stage. Every real data pipeline publishes this table — it is how you
notice a gate suddenly eating 40% of a crawl.

One job for the whole funnel: stage id-sets union with a stage tag and
aggregate once (map-side combinable counts), then the per-stage deltas
are a lag window over the k-row stage table — never a per-stage
``count()`` loop (k driver round-trips and k jobs).

Beyond-reference (the reference has no pipeline surface — SURVEY.md §2);
part of the training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stats(stages: list[tuple[str, DataFrame]]) -> DataFrame:
    """``stages`` = ordered (name, surviving-ids DataFrame) pairs, the
    first being the input corpus. Returns one row per stage:
    ``(stage_idx, stage, n, n_dropped, drop_pct)`` where n_dropped and
    drop_pct are vs the PREVIOUS stage (0 for the first).

    Each stage DataFrame's FIRST column is taken as the id; extra
    columns are ignored, so gate outputs can be passed as-is.
    """
    if not stages:
        raise ValueError("funnel_stats needs at least one stage")
    from pyspark.sql import Window

    tagged = None
    for i, (name, df) in enumerate(stages):
        idc = df.columns[0]
        part = df.select(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(idc).cast("string").alias("_id"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    counts = tagged.groupBy("stage_idx", "stage").agg(
        F.count(F.lit(1)).alias("n")
    )
    # left-join counts onto the DECLARED stage list: a stage whose gate
    # dropped every row must still appear with n=0 — that catastrophic
    # gate is the exact event this table exists to surface, and later
    # stages' deltas must be computed against it, not skip over it
    spark = stages[0][1].sparkSession
    from embeddingsearch_spark import tables

    stage_list = tables.literal_frame(
        spark,
        [(i, name) for i, (name, _) in enumerate(stages)],
        "stage_idx int, stage string",
    )
    counts = stage_list.join(
        counts, ["stage_idx", "stage"], "left_outer"
    ).select(
        "stage_idx", "stage", F.coalesce("n", F.lit(0)).alias("n")
    )
    # k-row table: the single-partition lag window is bounded by the
    # stage count, never the corpus
    w = Window.orderBy("stage_idx")
    prev = F.lag("n").over(w)
    dropped = F.when(prev.isNull(), F.lit(0)).otherwise(prev - F.col("n"))
    pct = F.when(
        prev.isNull() | (prev == 0), F.lit(0.0)
    ).otherwise(dropped.cast("double") / prev)
    return counts.select(
        "stage_idx",
        "stage",
        "n",
        dropped.cast("bigint").alias("n_dropped"),
        F.round(pct, 6).alias("drop_pct"),
    )
