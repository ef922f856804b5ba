"""Per-tenant recall probe for the federated ANN families (BASELINE.md
round-6 #4): measure recall@10 of each tenant-isolated serve
(federated IVF, PQ, graph) against the PER-TENANT exact brute force at
a given sf dir — the quality twin of the global families' recall rows,
proving the isolation path costs no unexpected quality.

Usage: python scripts/tenant_recall_probe.py [sf_dir]
Prints one line per (family, tenant): mean recall@10 over that
tenant's routed queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from embeddingsearch_spark import tables  # noqa: E402
from embeddingsearch_spark.operators import ann as ann_ops  # noqa: E402
from embeddingsearch_spark.operators import graphann, pq  # noqa: E402
from embeddingsearch_spark.session import get_spark  # noqa: E402
from embeddingsearch_spark.storage import drop_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]")
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn(
        "source",
        F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
    )
    n = spark.sparkContext.defaultParallelism
    emb = emb.repartition(n).localCheckpoint(eager=True)
    qdf = emb.filter(F.col("vec_id") % 13 == 0)
    queries = qdf.select(F.col("vec_id").alias("query_id"), "embedding")
    route = qdf.select(F.col("vec_id").alias("query_id"), "source")

    # per-tenant exact baseline
    exact = None
    for t in ("acme", "globex"):
        t_emb = emb.filter(F.col("source") == t)
        t_q = queries.join(
            route.filter(F.col("source") == t).select("query_id"),
            "query_id",
        )
        part = ann_ops.brute_force_topk(t_emb, t_q, k=10)
        exact = part if exact is None else exact.unionByName(part)
    exact = exact.localCheckpoint(eager=True)

    def report(name, approx):
        r = ann_ops.ann_recall(approx, exact, k=10)
        by = (
            r.join(route, "query_id")
            .groupBy("source")
            .agg(F.round(F.avg("recall"), 4).alias("recall"))
            .orderBy("source")
            .collect()
        )
        for row in by:
            print(f"{name:18s} {row['source']:8s} recall@10 = {row['recall']}")

    # IVF: per-tenant quantizer (16 cents each), nprobe=4
    cents = emb.filter(F.col("vec_id") < 32).select(
        "source", F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for t in ("_assigned", "_centroids"):
        drop_table(spark, "es_probe_tivf" + t)
    ann_ops.save_federated_ivf_index(
        ann_ops.assign_centroids_federated(emb, cents),
        cents, "es_probe_tivf", n_buckets=4,
    )
    report(
        "ivf_federated",
        ann_ops.ivf_federated_from_index(
            spark, "es_probe_tivf", queries, route, k=10, nprobe=4
        ),
    )

    # PQ: per-tenant codebooks (m=8, K=16)
    cbs_by = pq.initial_codebooks_federated(emb, m_sub=8, k_codes=16)
    coded = pq.encode_pq_federated(emb, cbs_by)
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_probe_tpq" + t)
    pq.save_federated_pq_index(coded, cbs_by, "es_probe_tpq", n_buckets=4)
    report(
        "pq_federated",
        pq.pq_federated_from_index(
            spark, "es_probe_tpq", queries, route, k=10
        ),
    )
    report(
        "pq_fed_refined",
        pq.pq_federated_refined(
            spark, "es_probe_tpq", emb, queries, route, k=10,
            refine_factor=8,
        ),
    )
    # quality config: finer per-tenant quantizer (K=64) + wider
    # shortlist — the knobs that buy recall>=0.9 on uniform-random
    # vectors (the worst case); raw-vector reads stay factor*k*|Q|
    cbs64 = pq.initial_codebooks_federated(emb, m_sub=8, k_codes=64)
    coded64 = pq.encode_pq_federated(emb, cbs64)
    for t in ("_codes", "_codebooks"):
        drop_table(spark, "es_probe_tpq64" + t)
    pq.save_federated_pq_index(coded64, cbs64, "es_probe_tpq64", n_buckets=4)
    report(
        "pq_fed_ref_k64f16",
        pq.pq_federated_refined(
            spark, "es_probe_tpq64", emb, queries, route, k=10,
            refine_factor=16,
        ),
    )
    report(
        "pq_fed_ref_k64f32",
        pq.pq_federated_refined(
            spark, "es_probe_tpq64", emb, queries, route, k=10,
            refine_factor=32,
        ),
    )

    # graph: per-tenant blocks sized by graph_config_for on the
    # PER-TENANT corpus size (the tuning rule the global family pins)
    n_tenant = emb.groupBy("source").count().agg(
        F.max("count")
    ).collect()[0][0]
    cfg = graphann.graph_config_for(int(n_tenant))
    cw = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("source").orderBy("vec_id")
    )
    gcents = (
        emb.withColumn("_rn", cw)
        .filter(F.col("_rn") <= cfg["n_blocks"])
        .select(
            "source", F.col("vec_id").alias("centroid_id"), "embedding"
        )
    )
    assigned = graphann.assign_blocks_federated(
        emb, gcents, n_assign=cfg["n_assign"]
    )
    pairs = graphann.block_pair_sims_federated(emb, assigned)
    for t in ("_pairs", "_assigned"):
        drop_table(spark, "es_probe_tgraph" + t)
    graphann.save_federated_graph_index(
        pairs, assigned, "es_probe_tgraph", n_buckets=4
    )
    print("graph config:", cfg)
    report(
        "graph_federated",
        graphann.graph_search_federated(
            spark, "es_probe_tgraph", emb, queries, route,
            k=10, beam=cfg["beam"], hops=cfg["hops"],
            n_entry=cfg["n_entry"], m=cfg["m"],
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
