"""Measure on-disk bytes/row of the federated IVF layouts at a given SF:
raw float vectors (_assigned) vs SQ8 codes stored as array<int> vs the
tinyint physical layout — the `table_bytes_per_row` pricing inputs for
`ivf_scan_cost(bytes_per_row=...)` and the BASELINE.md byte table.

A second arg replicates the corpus N times (fresh ids) before
indexing — at small SFs the per-file footer/dictionary overhead
dominates and hides the codes' true size; replication amortizes it
(the honest large-corpus estimate).

Usage: python scripts/layout_bytes_probe.py [sf_dir] [replicate]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from embeddingsearch_spark import tables  # noqa: E402
from embeddingsearch_spark.operators import ann as ann_ops  # noqa: E402
from embeddingsearch_spark.operators import sq  # noqa: E402
from embeddingsearch_spark.operators.calibration import (  # noqa: E402
    table_bytes_per_row,
)
from embeddingsearch_spark.session import get_spark  # noqa: E402
from embeddingsearch_spark.storage import drop_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("layout-bytes-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    emb = tables.load(spark, sf_dir, "embeddings")
    if rep > 1:
        base = emb.count()
        # perturb each replica deterministically — identical arrays
        # would dictionary-collapse in parquet and fake the ratio
        emb = emb.crossJoin(
            spark.range(rep).select(F.col("id").alias("_rep"))
        ).select(
            (F.col("vec_id") + F.col("_rep") * base).alias("vec_id"),
            F.transform(
                "embedding",
                # keep the source element type (float32) so the raw
                # layout's B/row stays comparable
                lambda x, i: (
                    x
                    + (
                        F.crc32(
                            F.concat_ws(
                                ",",
                                F.col("_rep").cast("string"),
                                i.cast("string"),
                            )
                        )
                        % 1000
                    ).cast("double")
                    / 1e6
                ).cast("float"),
            ).alias("embedding"),
        )
    emb = emb.withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    ).localCheckpoint(eager=True)
    n = emb.count()
    dim = len(emb.select("embedding").head()[0])
    cents = emb.filter(F.col("vec_id") < 16).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ann_ops.assign_centroids_federated(emb, cents)
    stats = sq.sq8_stats(emb, partition_col="source")
    for pre in ("es_probe_raw", "es_probe_sq8i", "es_probe_sq8t"):
        for t in ("_assigned", "_codes", "_centroids", "_sqstats"):
            drop_table(spark, pre + t)
    ann_ops.save_federated_ivf_index(
        assigned, cents, "es_probe_raw", n_buckets=4
    )
    sq.save_federated_ivf_sq8_index(
        spark, assigned, cents, stats, "es_probe_sq8i", n_buckets=4,
        codes_dtype="int",
    )
    sq.save_federated_ivf_sq8_index(
        spark, assigned, cents, stats, "es_probe_sq8t", n_buckets=4,
        codes_dtype="tinyint",
    )
    # SQ4 packed codes in the SAME table shape as the SQ8 layout
    # ((vec_id, codes) partitioned by (source, centroid), bucketed) —
    # the round-11 bytes-at-recall comparison input
    from embeddingsearch_spark.storage import replace_bucketed

    drop_table(spark, "es_probe_sq4_codes")
    sq4coded = (
        assigned.select("vec_id", "source", "centroid_id")
        .join(
            sq.sq4_encode(emb, stats, partition_col="source"),
            ["vec_id", "source"],
        )
        .select("vec_id", "source", "centroid_id", "codes")
    )
    replace_bucketed(
        sq4coded, "es_probe_sq4_codes", ["vec_id"], n_buckets=4,
        partition_cols=["source", "centroid_id"],
    )

    # PQ codes layout (m_sub=8 × k=16 — the tenant-gate config): the
    # third pricing input for serve_bytes_e2e (round-11 judge item #4)
    from embeddingsearch_spark.operators import pq as pq_ops

    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_probe_pq" + t)
    cbs_by = pq_ops.initial_codebooks_federated(
        emb, partition_col="source", m_sub=8, k_codes=16
    )
    coded = pq_ops.encode_pq_federated(
        emb, cbs_by, partition_col="source"
    )
    pq_ops.save_federated_pq_index(
        coded, cbs_by, "es_probe_pq", partition_col="source",
        n_buckets=4,
    )
    raw = table_bytes_per_row(spark, "es_probe_raw_assigned")
    sq8i = table_bytes_per_row(spark, "es_probe_sq8i_codes")
    sq8t = table_bytes_per_row(spark, "es_probe_sq8t_codes")
    sq4b = table_bytes_per_row(spark, "es_probe_sq4_codes")
    pqb = table_bytes_per_row(spark, "es_probe_pq_codes")
    print(f"sf_dir={sf_dir} rows={n} dim={dim}")
    print(
        f"sq4 packed      : {sq4b:9.2f} B/row  {sq4b/dim:6.3f} B/dim"
        f"  ratio raw/sq4 = {raw/sq4b:5.2f}x  sq8/sq4 = {sq8i/sq4b:5.2f}x"
    )
    print(
        f"pq codes (m=8)  : {pqb:9.2f} B/row  {pqb/dim:6.3f} B/dim"
        f"  ratio raw/pq = {raw/pqb:5.2f}x"
    )
    print(f"raw   _assigned : {raw:9.2f} B/row  {raw/dim:6.3f} B/dim")
    print(
        f"sq8 int codes   : {sq8i:9.2f} B/row  {sq8i/dim:6.3f} B/dim"
        f"  ratio raw/sq8i = {raw/sq8i:5.2f}x"
    )
    print(
        f"sq8 tinyint     : {sq8t:9.2f} B/row  {sq8t/dim:6.3f} B/dim"
        f"  ratio raw/sq8t = {raw/sq8t:5.2f}x  int/tiny = {sq8i/sq8t:5.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
