"""Physical-plan inspection: make the scale-critical plan properties
(broadcast joins, predicate pushdown, partition pruning, whole-stage
codegen, shuffle count) ASSERTABLE so tests lock them in.

The reference hand-codes its access paths (SURVEY.md §4 — no optimizer);
here the optimizer picks them, which means a refactor can silently turn a
broadcast join into a 100-TB shuffle. These helpers pin the plans we
designed for:

    assert_broadcast_join(df)        # small side must broadcast (J4)
    assert_pushed_filter(df, "l_shipdate")   # predicate reaches the scan
    assert_partition_pruned(df)      # partition column filter prunes files
    count_shuffles(df) <= n          # exchange budget per operator
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-optimization, pre-AQE-execution)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle of its input;
    BroadcastExchange does NOT count — broadcasting the small side is the
    point). AQE may coalesce partitions at runtime but never removes an
    exchange — this is the static shuffle budget of the plan."""
    # each node appears once as "(<id>) Exchange" in the details section
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or (
        "BroadcastNestedLoopJoin" in physical_plan(df)
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in the plan; a shuffle join here becomes "
        f"the bottleneck at scale:\n{plan[:4000]}"
    )


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters sections of every scan node, concatenated."""
    return "\n".join(
        re.findall(r"PushedFilters: \[[^\]]*\]", physical_plan(df))
    )


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert column in pf, (
        f"filter on {column!r} did not reach the parquet scan "
        f"(PushedFilters: {pf or '<none>'}) — the scan would read "
        "everything at scale"
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (column pruning check)."""
    cols: set[str] = set()
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        for field in m.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def assert_partition_pruned(df: DataFrame, expect_pruning: bool = True) -> None:
    """For scans of partitioned tables: the partition filter must appear in
    the scan's PartitionFilters (files outside the predicate never open)."""
    plan = physical_plan(df)
    matches = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    nonempty = any(m.strip() for m in matches)
    if expect_pruning:
        assert nonempty, (
            "no PartitionFilters in any scan — the partition predicate is "
            f"not pruning:\n{plan[:4000]}"
        )


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans (wider = more of the plan runs as
    generated JVM code with no virtual-call overhead). Under AQE the final
    plan only exists after execution, so this runs the query by default."""
    if execute:
        # collect() executes THIS DataFrame's queryExecution so its AQE
        # plan finalizes (a noop write builds a separate execution)
        df.collect()
    plan = simple_plan(df)
    # codegen spans print as "WholeStageCodegen (n)" in tree mode or as
    # "*(n) Operator" prefixes in simple mode
    ids = re.findall(r"WholeStageCodegen \((\d+)\)", plan) + re.findall(
        r"\*\((\d+)\)", plan
    )
    return len(set(ids))
