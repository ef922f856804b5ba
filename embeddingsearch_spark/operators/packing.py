"""Sequence packing: assign documents to fixed-token-budget training
examples (greedy first-fit in deterministic order) — the step between a
cleaned corpus and a pretraining dataloader. Beyond-reference op
(training-data-pipeline surface, BASELINE.json north star).

Distribution shape: packing is inherently sequential, so the corpus is
hash-sharded first (deterministic md5 shard, engine-reproducible) and the
greedy scan runs per shard in an Arrow-batched applyInPandas — ONE
shuffle on the shard key. Packing efficiency doesn't suffer: the budget
is tiny relative to a shard, so per-shard first-fit wastes the same
padding a global scan would.

100 TB sizing: one task holds one shard (ids + token counts only — the
text itself is NOT shuffled; join assignments back by id afterwards).
Pick ``n_shards`` so a shard's (id, n_tokens) rows fit a task (e.g. 2^16
shards for 10^11 docs → ~1.5M rows/24 MB per shard). pack_id embeds the
shard (shard * 2^40 + local), so ids are globally unique without
coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHARD_SPAN = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Per-doc pack assignment ``(id, n_tokens, shard, pack_id,
    pack_pos)``. Greedy first-fit over docs in ascending-id order within
    a shard: a doc opens a new pack when it would overflow the budget;
    docs longer than the budget sit alone in their own pack (split/
    truncate upstream if that's not wanted)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_", F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).cast("int")
    slim = df.select(
        F.col(id_col).cast("long"),
        F.col(token_col).cast("long"),
        shard.alias("shard"),
    )
    out_schema = (
        f"{id_col} long, {token_col} long, shard int, "
        "pack_id long, pack_pos int"
    )

    def pack(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        sh = int(pdf["shard"].iloc[0])
        packs, positions = [], []
        acc, pack, pos = 0, 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                pack += 1
                acc, pos = 0, 0
            acc += t
            packs.append(sh * _SHARD_SPAN + pack)
            positions.append(pos)
            pos += 1
        pdf = pdf.copy()
        pdf["pack_id"] = packs
        pdf["pack_pos"] = positions
        return pdf

    return slim.groupBy("shard").applyInPandas(pack, schema=out_schema)


def pack_stats(packed: DataFrame, token_col: str = "n_tokens", budget: int = 2048) -> DataFrame:
    """Padding-efficiency summary per shard: packs, docs, fill ratio."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum(token_col).alias("_fill"), F.count(F.lit(1)).alias("_docs")
    )
    return per_pack.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("_docs").alias("n_docs"),
        F.round(F.avg(F.col("_fill") / budget), 6).alias("avg_fill"),
    )


def length_bucket_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    batch_size: int = 32,
    n_shards: int = 8,
    salt: str = "lbb",
) -> DataFrame:
    """Pad-waste-minimizing batch assignment (the inference/training
    batching rule): docs are bucketed by ceil(log2(n_tokens)) so every
    batch holds similar-length sequences, then cut into fixed-size
    batches in a deterministic order. Padding per batch is bounded by
    the bucket's 2× length spread instead of the corpus-wide max.

    Scale shape: ONE shuffle by (bucket, shard) — the md5 shard is the
    parallelism knob exactly as in ``pack_sequences`` (a hot bucket
    splits across shards instead of serializing one partition); the
    per-partition window sort is by doc id, engine-reproducible.

    Returns (id, n_tokens, bucket, shard, batch_id, batch_pos) with
    batch_id = bucket * 2^40 + shard * 2^20 + per-shard batch ordinal
    (globally unique, locality-revealing).
    """
    from pyspark.sql.window import Window

    n = F.col(token_col)
    bucket = (
        F.when(n <= 1, F.lit(0))
        .otherwise(F.ceil(F.log2(n)))
        .cast("int")
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).cast("int")
    staged = df.select(
        F.col(id_col),
        n.cast("bigint").alias(token_col),
        bucket.alias("bucket"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(id_col)
    rn = F.row_number().over(w) - 1
    return staged.select(
        id_col,
        token_col,
        "bucket",
        "shard",
        (
            F.col("bucket").cast("bigint") * F.lit(1 << 40)
            + F.col("shard").cast("bigint") * F.lit(1 << 20)
            + (rn / batch_size).cast("bigint")
        ).alias("batch_id"),
        (rn % batch_size).cast("int").alias("batch_pos"),
    )


def batch_pad_stats(
    batches: DataFrame, token_col: str = "n_tokens"
) -> DataFrame:
    """Padding-efficiency summary per batch over
    ``length_bucket_batches`` output: fill_frac = sum(tokens) /
    (n_docs * max(tokens)) — the fraction of the padded tensor that is
    real data (1.0 = zero pad waste). One map-side-combinable groupBy."""
    return (
        batches.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(token_col).alias("max_tokens"),
            F.sum(token_col).alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("max_tokens").cast("bigint").alias("max_tokens"),
            F.col("sum_tokens").cast("bigint").alias("sum_tokens"),
            F.when(
                (F.col("n_docs") * F.col("max_tokens")) == 0, F.lit(0.0)
            )
            .otherwise(
                F.col("sum_tokens") / (F.col("n_docs") * F.col("max_tokens"))
            )
            .alias("fill_frac"),
        )
    )
