"""Sketch path vs exact path: same schema, bounded error. The exact
variant is oracled by the driver (events_type_profile); here the HLL++ /
quantile-sketch variant must stay within its advertised bounds of it."""

from __future__ import annotations

import pytest

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators.sketches import group_profile


@pytest.fixture(scope="module")
def profiles(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in group_profile(ev, "event_type", "value", "user_id").collect()
    }
    approx = {
        r["event_type"]: r
        for r in group_profile(
            ev, "event_type", "value", "user_id", exact=False
        ).collect()
    }
    return exact, approx


def test_same_schema(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    a = group_profile(ev, "event_type", "value", "user_id")
    b = group_profile(ev, "event_type", "value", "user_id", exact=False)
    assert [f.name for f in a.schema] == [f.name for f in b.schema]


def test_distinct_within_hll_bound(profiles):
    exact, approx = profiles
    for k, e in exact.items():
        # rsd=0.02; allow 5 sigma (still exact-equal at these cardinalities
        # most of the time — HLL++ uses a sparse exact mode when small)
        assert abs(approx[k]["n_distinct"] - e["n_distinct"]) <= max(
            1, 0.10 * e["n_distinct"]
        )
        assert approx[k]["n_rows"] == e["n_rows"]  # count stays exact
        assert approx[k]["sum_value"] == e["sum_value"]


def test_quantiles_within_sketch_bound(spark, sf_dir, profiles):
    # sketch error is bounded in RANK space, not value space: the approx
    # p-quantile must land between nearby exact quantiles (wide margins —
    # per-type groups at test scale are ~100 rows, so one rank step in a
    # sparse tail is a big value jump)
    from pyspark.sql import functions as F

    _, approx = profiles
    ev = tables.load(spark, sf_dir, "events")
    bounds = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.40)).alias("p40"),
            F.percentile("value", F.lit(0.60)).alias("p60"),
            F.percentile("value", F.lit(0.90)).alias("p90"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    for k, b in bounds.items():
        assert b["p40"] <= approx[k]["median_value"] <= b["p60"]
        assert b["p90"] <= approx[k]["p95_value"] <= b["p99"]
