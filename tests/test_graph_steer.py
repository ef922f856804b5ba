"""Low-structure graph steer (round-11): graph_structure_gain from the
persisted lr pair table, and graph_config_for's gain-conditional beam
widening."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import graphann
from embeddingsearch_spark.storage import drop_table


def test_config_rule_widens_only_below_threshold():
    base = graphann.graph_config_for(250)
    assert base["beam"] == 20 and base["n_entry"] == 10
    low = graphann.graph_config_for(250, structure_gain=0.02)
    assert low["beam"] == 28 and low["n_entry"] == 14
    # at/above threshold: plain rule
    hi = graphann.graph_config_for(250, structure_gain=0.09)
    assert hi == base
    at = graphann.graph_config_for(250, structure_gain=0.05)
    assert at == base
    # the steer touches only beam/n_entry
    assert {k: low[k] for k in ("n_blocks", "n_assign", "m", "hops")} == {
        k: base[k] for k in ("n_blocks", "n_assign", "m", "hops")
    }


def _corpus(spark, clustered: bool):
    rng = np.random.default_rng(7)
    rows = []
    # dim 32: the gain statistic is dimension-sensitive — gaussian
    # random at dim 8 reads ~0.07 (block co-membership correlates with
    # cosine in low dim), dim 32 reads ~0.02 like the real 64-dim
    # testdata; the steer targets the high-dim regime embeddings live in
    for i in range(160):
        if clustered:
            c = i % 4
            v = rng.normal(size=32) * 0.05
            v[c] += 3.0
        else:
            v = rng.normal(size=32)
        rows.append((i, [float(x) for x in v], ("acme", "globex")[i % 2]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, source string"
    )


def _build_lr(spark, emb, prefix):
    for t in ("_pairs", "_assigned"):
        drop_table(spark, prefix + t)
    cents = emb.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = graphann.assign_blocks_federated(
        emb, cents, partition_col="source", n_assign=2
    )
    pairs = graphann.block_pair_sims_federated(
        emb, assigned, partition_col="source"
    ).withColumn("_lr", F.lit(False)).unionByName(
        graphann.long_range_pairs(
            emb, long_range=2, partition_col="source"
        )
    )
    graphann.save_federated_graph_index(
        pairs, assigned, prefix, partition_col="source", n_buckets=2
    )


def test_structure_gain_separates_clustered_from_uniform(spark):
    """The statistic orders correctly: the clustered corpus's gain is
    well above the uniform one's for every tenant, and the per-tenant
    dict covers both collections."""
    _build_lr(spark, _corpus(spark, False), "es_t_steer_u")
    _build_lr(spark, _corpus(spark, True), "es_t_steer_c")
    gu = graphann.graph_structure_gain(
        spark, "es_t_steer_u", partition_col="source"
    )
    gc_ = graphann.graph_structure_gain(
        spark, "es_t_steer_c", partition_col="source"
    )
    assert set(gu) == set(gc_) == {"acme", "globex"}
    for t in gu:
        assert gc_[t] > gu[t] + 0.05, (t, gc_[t], gu[t])
    # global (no partition) form returns a float
    g = graphann.graph_structure_gain(spark, "es_t_steer_u")
    assert isinstance(g, float)


def test_structure_gain_requires_lr_generation(spark):
    import pytest

    emb = _corpus(spark, False)
    for t in ("_pairs", "_assigned"):
        drop_table(spark, "es_t_steer_plain" + t)
    cents = emb.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = graphann.assign_blocks_federated(
        emb, cents, partition_col="source", n_assign=2
    )
    pairs = graphann.block_pair_sims_federated(
        emb, assigned, partition_col="source"
    )
    graphann.save_federated_graph_index(
        pairs, assigned, "es_t_steer_plain", partition_col="source",
        n_buckets=2,
    )
    with pytest.raises(ValueError, match="_lr"):
        graphann.graph_structure_gain(spark, "es_t_steer_plain")


def test_graph_auto_config_threads_steer(spark):
    """`graph_auto_config(steer_low_structure=True)` widens the
    low-structure (uniform) tenants' beams from the live index and
    leaves the plain call untouched."""
    _build_lr(spark, _corpus(spark, False), "es_t_steer_ac")
    plain = graphann.graph_auto_config(
        spark, "es_t_steer_ac", partition_col="source"
    )
    steered = graphann.graph_auto_config(
        spark, "es_t_steer_ac", partition_col="source",
        steer_low_structure=True,
    )
    for t in plain:
        assert steered[t]["beam"] > plain[t]["beam"]
        assert steered[t]["hops"] == plain[t]["hops"]
        assert steered[t]["m"] == plain[t]["m"]


def test_calibrated_config_falls_back_to_steered_beam(spark):
    """With `steer_low_structure=True` on a low-structure corpus where
    NO ladder beam reaches the target, the measured config falls back
    to the WIDENED rule beam (the ladder only narrows from the rule);
    the plain call falls back to the plain rule."""
    _build_lr(spark, _corpus(spark, False), "es_t_steer_cal")
    emb = _corpus(spark, False)
    qdf = emb.filter(F.col("vec_id") % 7 == 0)
    qs = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    rt = qdf.select(F.col("vec_id").alias("query_id"), "source")
    plain = graphann.graph_calibrated_config(
        spark, "es_t_steer_cal", emb, qs, rt, k=10,
        recall_target=1.01,  # unreachable: force the rule fallback
        sample_per_tenant=4,
    )
    steered = graphann.graph_calibrated_config(
        spark, "es_t_steer_cal", emb, qs, rt, k=10,
        recall_target=1.01, sample_per_tenant=4,
        steer_low_structure=True,
    )
    for t in plain:
        assert steered[t]["beam"] > plain[t]["beam"]
