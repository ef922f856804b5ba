"""blocked_cosine_pairs oversized-block guard: blocks past max_block must
never hit the quadratic all-pairs join — they either raise (on_oversize=
'error') or fall back to SRP-LSH confined to the block. Identical vectors
collide in every SRP band, so fallback recall is exact for the planted
duplicates and the assertions stay deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators.ann import blocked_cosine_pairs


@pytest.fixture(scope="module")
def blocked_emb(spark):
    # block "big": 15 rows, three identical-vector groups of 5
    # block "small": 4 rows, one identical pair + two far vectors
    rows = []
    for i in range(15):
        base = [0.0] * 8
        base[i % 3] = 1.0
        rows.append((i, "big", base))
    def vec(hot):
        v = [0.0] * 8
        v[hot] = 1.0
        return v

    rows.append((100, "small", vec(0)))
    rows.append((101, "small", vec(0)))
    rows.append((102, "small", vec(4)))
    rows.append((103, "small", vec(6)))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )


def test_error_mode_raises_on_oversized_block(blocked_emb):
    with pytest.raises(ValueError, match="big"):
        blocked_cosine_pairs(
            blocked_emb, max_block=10, on_oversize="error"
        ).collect()


def test_fallback_routes_big_block_through_lsh(blocked_emb):
    got = blocked_cosine_pairs(blocked_emb, max_block=10, threshold=0.99)
    pairs = {(r["id_a"], r["id_b"]): r["label"] for r in got.collect()}
    # small block (exact path): the identical pair found, far pairs absent
    assert pairs.get((100, 101)) == "small"
    assert (102, 103) not in pairs
    # big block (SRP fallback): every identical pair found — identical
    # vectors share every band bucket, so LSH recall is 1 for them
    big_expected = {
        (i, j)
        for i in range(15)
        for j in range(i + 1, 15)
        if i % 3 == j % 3
    }
    big_got = {p for p, lbl in pairs.items() if lbl == "big"}
    assert big_got == big_expected
    # no cross-block pairs
    assert all(
        (a < 100) == (b < 100) for a, b in pairs
    )


def test_under_budget_identical_to_unguarded(blocked_emb):
    guarded = blocked_cosine_pairs(blocked_emb, max_block=1000)
    unguarded = blocked_cosine_pairs(blocked_emb, max_block=1000000)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )
