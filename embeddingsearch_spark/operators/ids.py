"""Contiguous global id assignment without a global-sort bottleneck.

The naive `row_number().over(Window.orderBy(col))` collapses the whole
dataset into ONE partition — the canonical 100 TB anti-pattern (the job
that "works" at test scale and OOMs one executor at real scale).
`monotonically_increasing_id` scales but is non-contiguous.

This is the standard two-pass fix: range-partition by the order key
(one shuffle, the same cost any global ordering pays), sort within
partitions (no shuffle), count rows per partition (tiny first pass:
n_partitions scalars to the driver), then stream each partition once
adding `cumulative_offset + local_position`. Every id is assigned
exactly once, ids are dense 0..n-1 in key order, and no task ever holds
more than its own partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_id",
    n_partitions: int | None = None,
    return_total: bool = False,
) -> DataFrame:
    """df + ``global_id`` = dense 0-based rank in ``order_cols`` order.
    ``order_cols`` must be a unique key (ties would make the rank — any
    engine's rank — nondeterministic). ``return_total=True`` returns
    ``(df, total_rows)`` — the total falls out of the counting pass for
    free, and rank-arithmetic consumers (ntile-style bucketing) need it
    without paying another full count job."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # range boundaries come from SAMPLING — a re-evaluation can draw
        # different boundaries, silently desyncing the count pass from
        # the numbering pass. Checkpoint pins one materialized
        # partitioning that both passes read (every two-pass algorithm
        # over nondeterministic partitioning needs this).
        .localCheckpoint(eager=False)
    )

    counts = {
        r._pid: r.n
        for r in rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
    )

    def number(batches):
        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"]).copy()
            pdf[out_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    # mapInPandas iterates one partition per task, batches in partition
    # order — the running counter is per-partition state, never global
    out = rp.mapInPandas(number, schema=f"{fields}, {out_col} long")
    if return_total:
        return out, acc
    return out
