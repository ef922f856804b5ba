"""Deterministic dataset splitting for training pipelines: assignment by
hashed id, not by RNG. ``sample()``/``randomSplit()`` depend on partition
layout and seed plumbing — re-partition the corpus and the split moves.
Hashing the id gives a split that is stable across runs, engines, and
cluster sizes; auditable (any engine can recompute membership); and
incremental (new rows land in a split without touching old ones). The
reference has no sampling surface (SURVEY.md §2) — beyond-reference op.

Scale: pure scan-stage expression (md5 + modulo per row) — no shuffle, no
state, trivially parallel; at 100 TB it fuses into whatever scan already
runs.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """Uniform bucket in [0, 10000): first 8 hex chars of
    md5(salt '_' id) as an integer, mod 10000. Engine-reproducible —
    DuckDB: ``('0x' || substr(md5(...), 1, 8))::BIGINT % 10000``."""
    h = F.md5(F.concat_ws("_", F.lit(salt), id_col.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % N_BUCKETS
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row with a split name; fractions must sum to 1 (e.g.
    {"train": 0.9, "valid": 0.05, "test": 0.05}). Cut points are
    cumulative-fraction thresholds over the hash bucket."""
    fractions = dict(fractions or {"train": 0.9, "test": 0.1})
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = split_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cut = int(round(acc * N_BUCKETS))
        case = F.when(bucket < cut, F.lit(name))
        expr = case if expr is None else expr.when(bucket < cut, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
