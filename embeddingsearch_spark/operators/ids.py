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
) -> DataFrame | tuple[DataFrame, int]:
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


def assign_group_ranks(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_col: str = "group_rank",
    n_partitions: int | None = None,
):
    """df + dense 0-based rank WITHIN each group in ``order_cols`` order,
    plus the per-group totals — the per-group twin of
    `assign_global_ids`, for group-partitioned ntile/rank semantics
    (per-language perplexity cuts, per-source quotas) WITHOUT a
    ``Window.partitionBy(group)`` whose parallelism would be capped by
    the group count and wrecked by skew (one giant language = one giant
    sorted partition).

    Range-partition on (group, *order) — a group may span partitions,
    so the counting pass collects (partition, group) counts (bounded by
    partitions × groups present per partition boundary, tiny for
    language/source-scale groups) and the numbering pass resumes each
    group's rank at its per-partition offset. Returns
    ``(ranked_df, totals_df)`` where totals is the tiny (group, total)
    table (broadcast it for rank arithmetic).

    (group, *order) must be a unique key per row (ties → any engine's
    rank is nondeterministic).

    Float-typed group columns: NaN is canonicalized to NULL (one shared
    "unknown" group) because the Arrow boundary erases the NaN/NULL
    distinction in both directions — see the inline comment. The ranked
    output's group column reflects the canonicalized value.
    """
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Float-typed group columns: canonicalize NaN -> NULL before anything
    # else. The Arrow boundary erases the distinction BOTH ways (SQL NULL
    # reads as NaN in a float64 pandas column; pandas NaN writes back as
    # NULL), so a NaN group can't round-trip through the numbering pass —
    # and a half-preserved distinction is worse than none: ranked rows
    # would come back NULL while totals said NaN, and the caller's
    # eqNullSafe join would silently drop every NaN-group row. One
    # canonical NULL group is consistent end-to-end (dict keys, ranked
    # output, totals, joins).
    if df.schema[group_col].dataType.simpleString() in ("float", "double"):
        df = df.withColumn(
            group_col,
            F.when(F.isnan(F.col(group_col)), F.lit(None)).otherwise(
                F.col(group_col)
            ),
        )
    cols = [group_col, *order_cols]
    rp = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        # same checkpoint rationale as assign_global_ids: pin ONE
        # sampled range partitioning for both passes
        .localCheckpoint(eager=False)
    )
    counts = (
        rp.groupBy("_pid", group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    def _k(v):
        # canonical dict key for a group value. NaN was already folded
        # into NULL above for float columns; guard here anyway so a
        # stray NaN (e.g. from a future non-canonicalized path) keys
        # consistently instead of crashing the driver-side sort.
        import math as _m

        if v is None or (isinstance(v, float) and _m.isnan(v)):
            return None
        return v

    per_group_running: dict = {}
    offsets: dict = {}
    for r in sorted(
        counts,
        key=lambda r: (
            r[group_col] is None,
            "" if r[group_col] is None else str(r[group_col]),
            r["_pid"],
        ),
    ):
        g = _k(r[group_col])
        offsets[(r["_pid"], g)] = per_group_running.get(g, 0)
        per_group_running[g] = per_group_running.get(g, 0) + r["n"]

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )

    def number(batches):
        pos: dict = {}
        pid = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            out = pdf.drop(columns=["_pid"]).copy()
            ranks = []
            for gv in out[group_col]:
                g = _k(gv)
                if g not in pos:
                    pos[g] = offsets[(pid, g)]
                ranks.append(pos[g])
                pos[g] += 1
            out[out_col] = ranks
            yield out

    ranked = rp.mapInPandas(number, schema=f"{fields}, {out_col} long")
    totals = df.sparkSession.createDataFrame(
        [
            (g, n)
            for g, n in sorted(
                per_group_running.items(),
                key=lambda kv: (kv[0] is None, str(kv[0])),
            )
        ],
        f"{group_col} {df.schema[group_col].dataType.simpleString()}, "
        "group_total long",
    )
    return ranked, totals
