"""Contiguous global ids: dense, order-correct, no single-partition
exchange in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import ids
from embeddingsearch_spark.plans import inspect as pi


def test_ids_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in [900, 3, 77, 12, 500, 1, 0]],
        "k long, v string",
    )
    out = ids.assign_global_ids(df, ["k"], n_partitions=3).collect()
    by_k = {r.k: r.global_id for r in out}
    ordered = sorted(by_k)
    assert [by_k[k] for k in ordered] == list(range(len(ordered)))


def test_ids_dense_at_scale_many_partitions(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k")  # permuted, unique
    )
    out = ids.assign_global_ids(df, ["k"], n_partitions=16)
    assert out.count() == 10_000
    # dense 0..n-1, and id order == key order
    agg = out.agg(
        F.min("global_id"), F.max("global_id"),
        F.countDistinct("global_id"),
    ).first()
    assert tuple(agg) == (0, 9_999, 10_000)
    sample = out.filter(F.col("k") % 997 == 0).collect()
    for r in sample:
        assert r.global_id == r.k  # keys ARE 0..n-1 here


def test_no_single_partition_exchange(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = ids.assign_global_ids(df, ["k"], n_partitions=8)
    # the checkpoint truncates out's visible plan, so pin the shuffle
    # shape on the stage the operator builds before it: a RANGE
    # repartition (8 partitions), never a single-partition sort
    staged = df.repartitionByRange(8, "k").sortWithinPartitions("k")
    plan = pi.physical_plan(staged)
    assert "rangepartitioning(k" in plan.lower().replace(" ", ""), plan
    assert "SinglePartition" not in plan, plan
    assert "SinglePartition" not in pi.physical_plan(out)


def test_assign_group_ranks_dense_per_group(spark):
    """Per-group 0-based dense ranks in order, totals correct, groups
    spanning range partitions still rank contiguously."""
    from embeddingsearch_spark.operators.ids import assign_group_ranks

    rows = [(g, i) for g in ("a", "b") for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, v long")
    ranked, totals = assign_group_ranks(
        df, "grp", ["v"], out_col="rk", n_partitions=8
    )
    got = {
        (r["grp"], r["v"]): r["rk"] for r in ranked.collect()
    }
    assert len(got) == 1000
    for g in ("a", "b"):
        for i in range(500):
            assert got[(g, i)] == i, (g, i, got[(g, i)])
    t = {r["grp"]: r["group_total"] for r in totals.collect()}
    assert t == {"a": 500, "b": 500}


def test_assign_group_ranks_null_group(spark):
    """NULL group values rank as their own group instead of crashing."""
    from embeddingsearch_spark.operators.ids import assign_group_ranks

    rows = [("a", 1), (None, 2), ("b", 3), (None, 1)]
    df = spark.createDataFrame(rows, "grp string, v long")
    ranked, totals = assign_group_ranks(df, "grp", ["v"], out_col="rk")
    got = {(r["grp"], r["v"]): r["rk"] for r in ranked.collect()}
    assert got[(None, 1)] == 0 and got[(None, 2)] == 1
    assert got[("a", 1)] == 0 and got[("b", 3)] == 0
    t = {r["grp"]: r["group_total"] for r in totals.collect()}
    assert t == {None: 2, "a": 1, "b": 1}


def test_assign_group_ranks_nan_float_group(spark):
    """A float group column with NaN values: NaN is canonicalized to
    NULL (the Arrow boundary erases the NaN/NULL distinction in both
    directions), so NaN and NULL rows rank as ONE group, the totals
    table carries a single NULL row, and — the regression this pins —
    the downstream eqNullSafe join finds a group_total for EVERY ranked
    row instead of silently dropping NaN-group rows."""
    import math

    from embeddingsearch_spark.operators.ids import assign_group_ranks

    rows = [
        (1.0, 10),
        (1.0, 11),
        (float("nan"), 20),
        (float("nan"), 21),
        (None, 30),
    ]
    df = spark.createDataFrame(rows, "grp double, v long")
    ranked, totals = assign_group_ranks(df, "grp", ["v"], out_col="rk")

    def key(g):
        if g is None:
            return "null"
        return "nan" if math.isnan(g) else g

    got = {(key(r["grp"]), r["v"]): r["rk"] for r in ranked.collect()}
    # NaN + NULL merged into one NULL group, ranked in v order
    assert got[("null", 20)] == 0 and got[("null", 21)] == 1
    assert got[("null", 30)] == 2
    assert got[(1.0, 10)] == 0 and got[(1.0, 11)] == 1
    t = {key(r["grp"]): r["group_total"] for r in totals.collect()}
    assert t == {1.0: 2, "null": 3}

    # the downstream join shape: every ranked row must find its total
    joined = ranked.join(
        totals.withColumnRenamed("grp", "_g"),
        ranked["grp"].eqNullSafe(F.col("_g")),
        "left",
    )
    assert joined.filter(F.col("group_total").isNull()).count() == 0


def test_exact_quantiles_nearest_rank_low(spark):
    """Quantile = value at floor(q*(n-1)) ascending; NULLs excluded;
    empty metric yields NULL values."""
    from embeddingsearch_spark.operators.quantiles import exact_quantiles

    rows = [(i, float(i * 10), None) for i in range(1, 11)]  # 10..100
    df = spark.createDataFrame(rows, "id long, v double, w double")
    out = {
        (r["metric"], r["q"]): r["value"]
        for r in exact_quantiles(
            df, ["v", "w"], [0.0, 0.5, 1.0], "id"
        ).collect()
    }
    # n=10: floor(0*9)=0 -> 10; floor(0.5*9)=4 -> 50; floor(1*9)=9 -> 100
    assert out[("v", 0.0)] == 10.0
    assert out[("v", 0.5)] == 50.0
    assert out[("v", 1.0)] == 100.0
    # all-NULL metric
    assert out[("w", 0.5)] is None


def test_exact_quantiles_ieee_boundary(spark):
    """floor(0.7*10) must be 7, not 6 — IEEE renders 0.7*10 as
    6.999999999999999; the epsilon guard restores the declared index."""
    from embeddingsearch_spark.operators.quantiles import exact_quantiles

    rows = [(i, float(i)) for i in range(11)]  # 0..10, n=11
    df = spark.createDataFrame(rows, "id long, v double")
    out = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, ["v"], [0.7], "id").collect()
    }
    assert out[0.7] == 7.0
