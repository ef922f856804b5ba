"""Round-11 probe (judge item #3): the graph family's uniform-corpus
recall ceiling. Measures, at a given sf dir, on BOTH the uniform
testdata embeddings and the clustered twin (same construction as
tenant_recall_probe.calibrate_probe):

1. the STRUCTURE GAIN readable from the persisted lr2 pair table —
   avg(near-pair sim) − avg(ring-pair sim). Ring partners are
   md5-random node pairs, near pairs are block-kNN pairs, so the gap
   measures how much local structure the corpus has with NO extra
   corpus pass and no absolute-similarity threshold;
2. held-out recall@10 of the lr2 federated serve at a beam LADDER, so
   the widened low-structure rule is pinned to a measured number.

Usage: python scripts/graph_uniform_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from embeddingsearch_spark import tables  # noqa: E402
from embeddingsearch_spark.operators import ann as ann_ops  # noqa: E402
from embeddingsearch_spark.operators import graphann  # noqa: E402
from embeddingsearch_spark.session import get_spark  # noqa: E402
from embeddingsearch_spark.storage import drop_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        tables.load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .withColumn(
            "source",
            F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
        )
    )
    dim = len(base.select("embedding").first()[0])
    n_clusters = 16
    cl = (F.col("vec_id") / 2).cast("long") % n_clusters
    clustered = base.select(
        "vec_id",
        "source",
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i == (cl % dim).cast("int"), F.lit(2.0)).otherwise(
                F.lit(0.0)
            ),
        ).alias("embedding"),
    )
    npart = spark.sparkContext.defaultParallelism

    def qr(df, mod):
        qdf = df.filter(F.col("vec_id") % mod == 0)
        if mod == 17:
            qdf = qdf.filter(F.col("vec_id") % 13 != 0)
        return (
            qdf.select(F.col("vec_id").alias("query_id"), "embedding"),
            qdf.select(F.col("vec_id").alias("query_id"), "source"),
        )

    def exact_for(corpus, queries, route):
        out = None
        for t in ("acme", "globex"):
            t_q = queries.join(
                route.filter(F.col("source") == t).select("query_id"),
                "query_id",
            )
            part = ann_ops.brute_force_topk(
                corpus.filter(F.col("source") == t), t_q, k=10
            )
            out = part if out is None else out.unionByName(part)
        return out.localCheckpoint(eager=True)

    for label, corpus in (("uniform", base), ("clustered", clustered)):
        emb = corpus.repartition(npart).localCheckpoint(eager=True)
        evq, evr = qr(emb, 17)
        exact_ev = exact_for(emb, evq, evr)
        counts = {
            str(r[0]): int(r[1])
            for r in emb.groupBy("source").count().collect()
        }
        gcfg = {
            t: graphann.graph_config_for(n) for t, n in counts.items()
        }
        c0 = gcfg["acme"]
        from pyspark.sql.window import Window

        w = Window.partitionBy("source").orderBy("vec_id")
        nb_df = spark.createDataFrame(
            [(t, c["n_blocks"]) for t, c in gcfg.items()],
            "source string, _nb int",
        )
        bcents = (
            emb.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(nb_df), "source")
            .filter(F.col("_rn") <= F.col("_nb"))
            .select(
                "source",
                F.col("vec_id").alias("centroid_id"),
                "embedding",
            )
        )
        assigned = graphann.assign_blocks_federated(
            emb, bcents, n_assign=c0["n_assign"]
        )
        gpairs = graphann.block_pair_sims_federated(emb, assigned)
        gpairs_lr = gpairs.withColumn(
            "_lr", F.lit(False)
        ).unionByName(
            graphann.long_range_pairs(
                emb, long_range=2, partition_col="source"
            )
        )
        pre = f"es_probe_glr_{label}"
        for t in ("_pairs", "_assigned"):
            drop_table(spark, pre + t)
        graphann.save_federated_graph_index(
            gpairs_lr, assigned, pre, n_buckets=4
        )
        # structure gain from the persisted pair table alone
        g = (
            spark.table(pre + "_pairs")
            .groupBy("source")
            .agg(
                F.avg(F.when(~F.col("_lr"), F.col("cosine"))).alias("near"),
                F.avg(F.when(F.col("_lr"), F.col("cosine"))).alias("ring"),
            )
            .withColumn("gain", F.round(F.col("near") - F.col("ring"), 4))
            .orderBy("source")
            .collect()
        )
        for r in g:
            print(
                f"{label:9s} {r['source']:7s} near={r['near']:.4f} "
                f"ring={r['ring']:.4f} GAIN={r['gain']:.4f}",
                flush=True,
            )
        for beam in (20, 24, 28, 32, 40):
            out = None
            for t in sorted(counts):
                rr = evr.filter(F.col("source") == t)
                qq = evq.join(rr.select("query_id"), "query_id")
                part = graphann.graph_search_federated(
                    spark, pre, emb, qq, rr, k=10, beam=beam,
                    hops=c0["hops"], n_entry=max(8, beam // 2),
                    m=c0["m"],
                )
                out = part if out is None else out.unionByName(part)
            rec = (
                ann_ops.ann_recall(out, exact_ev, k=10)
                .join(evr, "query_id")
                .groupBy("source")
                .agg(F.round(F.avg("recall"), 4).alias("r"))
                .orderBy("source")
                .collect()
            )
            line = " ".join(f"{r['source']}={r['r']:.3f}" for r in rec)
            print(f"{label:9s} beam={beam:3d} r@10: {line}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
