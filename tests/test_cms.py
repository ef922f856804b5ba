"""Count-Min sketch: never underestimates, tight at low collision load,
mergeable by addition, bounded size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import sketches as sk


def _items(spark, counts: dict[str, int]):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "tok string")


def test_cms_upper_bound_and_tightness(spark):
    counts = {f"t{i}": (i % 7) + 1 for i in range(200)}
    items = _items(spark, counts)
    cms = sk.cms_build(items, "tok", depth=4, width=4096)
    cand = spark.createDataFrame([(t,) for t in counts], "tok string")
    est = {
        r.tok: r.est_count
        for r in sk.cms_estimate(cms, cand, "tok", depth=4, width=4096).collect()
    }
    assert all(est[t] >= n for t, n in counts.items())
    # ~800 increments into 4 x 4096 counters: almost every estimate exact
    exact = sum(1 for t, n in counts.items() if est[t] == n)
    assert exact >= 190


def test_cms_absent_item_low_estimate(spark):
    items = _items(spark, {f"t{i}": 5 for i in range(100)})
    cms = sk.cms_build(items, "tok", depth=4, width=4096)
    cand = spark.createDataFrame([("never-seen",)], "tok string")
    est = sk.cms_estimate(cms, cand, "tok", depth=4, width=4096).first()
    assert est.est_count <= 5  # collision noise at most, usually 0


def test_cms_size_bounded(spark):
    items = _items(spark, {f"t{i}": 3 for i in range(500)})
    cms = sk.cms_build(items, "tok", depth=4, width=128)
    assert cms.count() <= 4 * 128


def test_cms_merge_by_addition(spark):
    a = _items(spark, {"x": 3, "y": 1})
    b = _items(spark, {"x": 2, "z": 4})
    kw = dict(depth=4, width=1024)
    merged = (
        sk.cms_build(a, "tok", **kw)
        .unionByName(sk.cms_build(b, "tok", **kw))
        .groupBy("seed", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    both = sk.cms_build(a.unionByName(b), "tok", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, both.collect())
    )


def test_cms_sha256_mode_deterministic(spark):
    items = _items(spark, {"alpha": 2, "beta": 3})
    kw = dict(depth=2, width=512, hash_fn="sha256")
    c1 = sorted(map(tuple, sk.cms_build(items, "tok", **kw).collect()))
    c2 = sorted(map(tuple, sk.cms_build(items, "tok", **kw).collect()))
    assert c1 == c2
    cand = spark.createDataFrame([("alpha",), ("beta",)], "tok string")
    cms = sk.cms_build(items, "tok", **kw)
    est = {
        r.tok: r.est_count
        for r in sk.cms_estimate(cms, cand, "tok", **kw).collect()
    }
    assert est == {"alpha": 2, "beta": 3}
