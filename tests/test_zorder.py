"""Z-order layout: Morton interleave correctness and — the point of the
exercise — per-file min/max tightness that enables multi-column data
skipping.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import zorder


def _morton(xs: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, x in enumerate(xs):
            out |= ((x >> i) & 1) << (i * len(xs) + j)
    return out


def test_z_value_matches_reference_morton(spark):
    rows = [(3, 5), (0, 0), (255, 255), (170, 85), (1, 128)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn(
            "z", zorder.z_value([F.col("a"), F.col("b")], bits=8)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton([a, b], 8)


def test_z_value_three_columns(spark):
    df = spark.createDataFrame([(7, 1, 4)], "a long, b long, c long")
    r = df.withColumn(
        "z", zorder.z_value([F.col("a"), F.col("b"), F.col("c")], bits=4)
    ).first()
    assert r.z == _morton([7, 1, 4], 4)


def test_bucket_bounds_and_clamp(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-5.0, 0.0, 50.0, 99.9, 100.0, 140.0]], "v double"
    )
    out = zorder.with_z_value(
        df, ["v"], bits=8, bounds={"v": (0.0, 100.0)}
    ).collect()
    zs = {r.v: r.z for r in out}
    assert zs[-5.0] == 0  # clamped below
    assert zs[140.0] == 255  # clamped above
    assert zs[0.0] == 0
    assert 0 < zs[50.0] < 255


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema.to_arrow_schema().get_field_index(col)
        lo, hi = None, None
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((lo, hi))
    return spans


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    # two independent uniform dimensions — the worst case for single-key
    # sorting, the home turf of z-ordering
    df = spark.range(20_000).select(
        F.col("id").alias("row_id"),
        (F.hash("id") % 1000 + 1000).alias("x"),
        (F.hash("id", "id") % 1000 + 1000).alias("y"),
    )
    base = str(tmp_path_factory.mktemp("zorder"))
    zorder.zorder_write(df, f"{base}/z", ["x", "y"], n_files=64)
    df.repartition(64).write.parquet(f"{base}/naive")
    return base


def test_zorder_files_have_tight_spans_on_both_cols(laid_out):
    for col in ("x", "y"):
        z_spans = _file_spans(f"{laid_out}/z", col)
        n_spans = _file_spans(f"{laid_out}/naive", col)
        z_avg = sum(hi - lo for lo, hi in z_spans) / len(z_spans)
        n_avg = sum(hi - lo for lo, hi in n_spans) / len(n_spans)
        # naive files each span ~the full domain; z-ordered files cover a
        # hyper-rectangle ~1/8 per side at 64 files over 2 dims (range-
        # partitioner sampling blurs boundaries, hence the slack)
        assert z_avg < n_avg * 0.35, (col, z_avg, n_avg)


def test_zorder_skips_files_for_selective_filter(laid_out):
    lo, hi = 1400, 1499  # 5% of either domain
    for col in ("x", "y"):
        spans = _file_spans(f"{laid_out}/z", col)
        hit = sum(1 for flo, fhi in spans if not (fhi < lo or flo > hi))
        # ideal: a 5% slab touches ~1/8 of the files (one grid column of
        # the 8x8 z-grid); sampling noise can double that, not more
        assert hit <= int(len(spans) * 0.4), (col, hit, len(spans))


def test_z_value_random_cross_check(spark):
    """500 random bucket tuples: Spark's shift/or column arithmetic must
    equal the Python reference interleave exactly."""
    import random

    rng = random.Random(42)
    rows = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.withColumn(
        "z", zorder.z_value([F.col("a"), F.col("b"), F.col("c")], bits=8)
    ).collect()
    for r in got:
        assert r.z == _morton([r.a, r.b, r.c], 8), (r.a, r.b, r.c)
