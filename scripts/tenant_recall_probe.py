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




def drift_loops(sf_dir: str) -> None:
    """Quality counterpart of the three streaming tenant-drift gates
    (round-8 judge item #4): per-tenant recall@10 BEFORE drift (index
    built on the reference era), AFTER drift (a shifted era ingested
    into globex under the OLD quantizer — the degradation the monitor
    exists to catch), and AFTER the single-tenant retrain (recovery).
    Each family at its own corpus-sized config (`ivf_config_for` /
    `pq_config_for` / `graph_config_for`). acme never drifts — its
    rows double as the no-collateral-damage check."""
    from pyspark.sql.window import Window

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    npart = spark.sparkContext.defaultParallelism
    emb = (
        tables.load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .withColumn(
            "source",
            F.when(F.col("vec_id") % 2 == 0, "acme").otherwise("globex"),
        )
        .repartition(npart)
        .localCheckpoint(eager=True)
    )
    dim = len(emb.select("embedding").first()[0])

    def shift(df):
        return df.filter(F.col("vec_id") % 3 == 0).select(
            (F.col("vec_id") * 2 + 10001).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x + F.lit(0.15)
            ).alias("embedding"),
            F.lit("globex").alias("source"),
        )

    era2 = shift(emb).localCheckpoint(eager=True)
    full = emb.unionByName(era2).localCheckpoint(eager=True)
    q1df = emb.filter(F.col("vec_id") % 13 == 0)
    # post-drift query mix: the reference-era queries plus shifted-era
    # queries for the drifted tenant (the traffic that exposes the
    # stale quantizer)
    q2df = q1df.unionByName(
        era2.filter(((F.col("vec_id") - 10001) / 2) % 13 == 0)
    )

    def qr(qdf):
        return (
            qdf.select(F.col("vec_id").alias("query_id"), "embedding"),
            qdf.select(F.col("vec_id").alias("query_id"), "source"),
        )

    q1, route1 = qr(q1df)
    q2, route2 = qr(q2df)

    def exact_for(corpus, queries, route):
        out = None
        for t in ("acme", "globex"):
            t_emb = corpus.filter(F.col("source") == t)
            t_q = queries.join(
                route.filter(F.col("source") == t).select("query_id"),
                "query_id",
            )
            part = ann_ops.brute_force_topk(t_emb, t_q, k=10)
            out = part if out is None else out.unionByName(part)
        return out.localCheckpoint(eager=True)

    exact1 = exact_for(emb, q1, route1)
    exact2 = exact_for(full, q2, route2)

    def skew(pre, family, stage):
        rows = (
            spark.table(pre + "_assigned")
            .groupBy("source", "centroid_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("source")
            .agg(
                F.max("c").alias("mx"),
                F.sum("c").alias("tot"),
                F.count(F.lit(1)).alias("ncells"),
            )
            .orderBy("source")
            .collect()
        )
        for r in rows:
            s = r["mx"] * r["ncells"] / r["tot"]
            print(
                f"{family:6s} {stage:12s} {r['source']:8s} "
                f"cell_skew = {round(s, 3)}",
                flush=True,
            )

    def report(family, stage, approx, exact, route):
        r = ann_ops.ann_recall(approx, exact, k=10)
        for row in (
            r.join(route, "query_id")
            .groupBy("source")
            .agg(F.round(F.avg("recall"), 4).alias("recall"))
            .orderBy("source")
            .collect()
        ):
            print(
                f"{family:6s} {stage:12s} {row['source']:8s} "
                f"recall@10 = {row['recall']}",
                flush=True,
            )

    counts = {
        str(r[0]): int(r[1])
        for r in emb.groupBy("source").count().collect()
    }
    gx = full.filter(F.col("source") == "globex").localCheckpoint(
        eager=True
    )
    n_gx = gx.count()

    def kmeans_seeded(corpus, k, iters):
        # remap ids so the k-lowest-id init is a pseudo-random sample
        # across BOTH eras — Lloyd cannot split a drifted cone that no
        # centroid starts inside
        remapped = corpus.withColumn(
            "vec_id", F.abs(F.hash(F.col("vec_id"))).cast("long")
        )
        return (
            ann_ops.kmeans_centroids(remapped, k=k, iters=iters)
            .select(
                F.lit("globex").alias("source"), "centroid_id",
                "embedding",
            )
            .localCheckpoint(eager=True)
        )

    def topn_cents(corpus, n_by):
        nb = spark.createDataFrame(
            [(t, int(v)) for t, v in n_by.items()],
            "source string, _nc int",
        )
        w = Window.partitionBy("source").orderBy("vec_id")
        return (
            corpus.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(nb), "source")
            .filter(F.col("_rn") <= F.col("_nc"))
            .select(
                "source",
                F.col("vec_id").alias("centroid_id"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )

    # ---- IVF ----
    cfg = {t: ann_ops.ivf_config_for(n) for t, n in counts.items()}
    nprobe = {t: c["nprobe"] for t, c in cfg.items()}
    cents1 = topn_cents(emb, {t: c["n_cents"] for t, c in cfg.items()})
    pre = "es_probe_dl_ivf"
    for t in ("_assigned", "_centroids"):
        drop_table(spark, pre + t)
    ann_ops.save_federated_ivf_index(
        ann_ops.assign_centroids_federated(emb, cents1), cents1, pre,
        n_buckets=4,
    )
    report(
        "ivf", "before",
        ann_ops.ivf_federated_from_index(
            spark, pre, q1, route1, k=10, nprobe=nprobe
        ),
        exact1, route1,
    )
    skew(pre, "ivf", "before")
    ann_ops.upsert_federated_ivf_index(spark, pre, era2, n_buckets=4)
    report(
        "ivf", "drifted",
        ann_ops.ivf_federated_from_index(
            spark, pre, q2, route2, k=10, nprobe=nprobe
        ),
        exact2, route2,
    )
    skew(pre, "ivf", "drifted")
    gcfg = ann_ops.ivf_config_for(n_gx)
    new_cents = kmeans_seeded(gx, gcfg["n_cents"], 5)
    ann_ops.retrain_federated_ivf_tenants(
        spark, pre, gx, new_cents, n_buckets=4
    )
    report(
        "ivf", "retrained",
        ann_ops.ivf_federated_from_index(
            spark, pre, q2, route2, k=10,
            nprobe={**nprobe, "globex": gcfg["nprobe"]},
        ),
        exact2, route2,
    )
    skew(pre, "ivf", "retrained")

    # ---- PQ (refined serve at the pq_config_for quality config) ----
    pcfg = {
        t: pq.pq_config_for(n, dim) for t, n in counts.items()
    }
    cbs = pq.initial_codebooks_federated(
        emb,
        m_sub=pcfg["acme"]["m_sub"],
        k_codes={t: c["k_codes"] for t, c in pcfg.items()},
    )
    pre = "es_probe_dl_pq"
    for t in ("_codes", "_codebooks"):
        drop_table(spark, pre + t)
    pq.save_federated_pq_index(
        pq.encode_pq_federated(emb, cbs), cbs, pre, n_buckets=4
    )

    def pq_serve(queries, route, corpus):
        return pq.pq_federated_refined(
            spark, pre, corpus, queries, route, k=10,
            refine_factor=pcfg["acme"]["refine_factor"],
        )

    report("pq", "before", pq_serve(q1, route1, emb), exact1, route1)
    pq.upsert_federated_pq_index(spark, pre, era2, n_buckets=4)
    report("pq", "drifted", pq_serve(q2, route2, full), exact2, route2)
    gpcfg = pq.pq_config_for(n_gx, dim)
    new_cbs = {
        "globex": pq.train_codebooks(
            gx, m_sub=gpcfg["m_sub"], k_codes=gpcfg["k_codes"], iters=2
        )
    }
    pq.retrain_federated_pq_tenants(
        spark, pre, gx, new_cbs, n_buckets=4
    )
    report("pq", "retrained", pq_serve(q2, route2, full), exact2, route2)

    # ---- graph ----
    gcfg1 = {t: graphann.graph_config_for(n) for t, n in counts.items()}
    c0 = gcfg1["acme"]
    bcents = topn_cents(
        emb, {t: c["n_blocks"] for t, c in gcfg1.items()}
    )
    pre = "es_probe_dl_g"
    for t in ("_pairs", "_assigned"):
        drop_table(spark, pre + t)
    assigned = graphann.assign_blocks_federated(
        emb, bcents, n_assign=c0["n_assign"]
    )
    graphann.save_federated_graph_index(
        graphann.block_pair_sims_federated(emb, assigned), assigned,
        pre, n_buckets=4,
    )

    def g_serve(queries, route, corpus):
        return graphann.graph_search_federated(
            spark, pre, corpus, queries, route, k=10,
            beam=c0["beam"], hops=c0["hops"], n_entry=c0["n_entry"],
            m=c0["m"],
        )

    def gpairs(stage):
        for r in (
            spark.table(pre + "_pairs")
            .groupBy("source")
            .count()
            .orderBy("source")
            .collect()
        ):
            print(
                f"graph  {stage:12s} {r['source']:8s} "
                f"pairs = {r['count']}",
                flush=True,
            )

    report("graph", "before", g_serve(q1, route1, emb), exact1, route1)
    gpairs("before")
    graphann.upsert_federated_graph_index(
        spark, pre, full, era2, bcents, m=c0["m"],
        n_assign=c0["n_assign"], n_buckets=4,
    )
    report("graph", "drifted", g_serve(q2, route2, full), exact2, route2)
    gpairs("drifted")
    ggcfg = graphann.graph_config_for(n_gx)
    gcents = kmeans_seeded(gx, ggcfg["n_blocks"], 3)
    graphann.retrain_federated_graph_tenants(
        spark, pre, gx, gcents, n_assign=c0["n_assign"], n_buckets=4
    )
    report(
        "graph", "retrained", g_serve(q2, route2, full), exact2, route2
    )
    gpairs("retrained")
    spark.stop()


def calibrate_probe(sf_dir: str) -> None:
    """Calibration-vs-rule quality/cost table (round-9 judge items
    #1/#2): for each family (IVF / PQ / graph) on a UNIFORM corpus
    (the testdata embeddings — the rules' worst case, where the rule
    IS the right width) and a CLUSTERED twin (per-cluster translated
    blobs — the structure real embeddings have), report the rule
    config, the measured (`*_calibrated_*`) config, the probe cost
    each implies, and recall@10 at BOTH on held-out queries
    (calibration samples the %13 queries, evaluation uses the
    disjoint-by-construction %17 \ %13 set)."""
    from pyspark.sql.window import Window

    spark = get_spark(master="local[16]", shuffle_partitions=16)
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
        if mod == 17:  # held-out: drop overlap with the %13 sample
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

    def recall_by(approx, exact, route):
        r = ann_ops.ann_recall(approx, exact, k=10)
        return {
            row["source"]: float(row["r"])
            for row in r.join(route, "query_id")
            .groupBy("source")
            .agg(F.round(F.avg("recall"), 4).alias("r"))
            .collect()
        }

    for label, corpus in (("uniform", base), ("clustered", clustered)):
        emb = corpus.repartition(npart).localCheckpoint(eager=True)
        calq, calr = qr(emb, 13)
        evq, evr = qr(emb, 17)
        exact_ev = exact_for(emb, evq, evr)
        counts = {
            str(r[0]): int(r[1])
            for r in emb.groupBy("source").count().collect()
        }

        # ---- IVF ----
        cfg = {t: ann_ops.ivf_config_for(n) for t, n in counts.items()}
        cfg_df = spark.createDataFrame(
            [(t, c["n_cents"]) for t, c in cfg.items()],
            "source string, _nc int",
        )
        w = Window.partitionBy("source").orderBy("vec_id")
        cents = (
            emb.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(cfg_df), "source")
            .filter(F.col("_rn") <= F.col("_nc"))
            .select(
                "source",
                F.col("vec_id").alias("centroid_id"),
                "embedding",
            )
        )
        pre = f"es_probe_cal_ivf_{label}"
        for t in ("_assigned", "_centroids"):
            drop_table(spark, pre + t)
        ann_ops.save_federated_ivf_index(
            ann_ops.assign_centroids_federated(emb, cents), cents, pre,
            n_buckets=4,
        )
        rule_np = ann_ops.ivf_auto_nprobe(spark, pre)
        cal_np = ann_ops.ivf_calibrated_nprobe(spark, pre, calq, calr)
        rec_rule = recall_by(
            ann_ops.ivf_federated_from_index(
                spark, pre, evq, evr, k=10, nprobe=rule_np
            ),
            exact_ev, evr,
        )
        rec_cal = recall_by(
            ann_ops.ivf_federated_from_index(
                spark, pre, evq, evr, k=10, nprobe=cal_np
            ),
            exact_ev, evr,
        )
        for t in sorted(counts):
            nc = cfg[t]["n_cents"]
            print(
                f"ivf   {label:9s} {t:7s} n_cents={nc:3d} "
                f"rule_np={rule_np[t]:3d} ({rule_np[t]/nc:.0%} cells,"
                f" r@10={rec_rule[t]:.3f})  cal_np={cal_np[t]:3d} "
                f"({cal_np[t]/nc:.0%} cells, r@10={rec_cal[t]:.3f})",
                flush=True,
            )

        # ---- PQ ----
        kmap = {
            t: pq.pq_config_for(n, dim=dim)["k_codes"]
            for t, n in counts.items()
        }
        cbs_by = pq.initial_codebooks_federated(
            emb, m_sub=8, k_codes=kmap
        )
        coded = pq.encode_pq_federated(emb, cbs_by)
        pre = f"es_probe_cal_pq_{label}"
        for t in ("_codes", "_codebooks"):
            drop_table(spark, pre + t)
        pq.save_federated_pq_index(coded, cbs_by, pre, n_buckets=4)
        rule_f = {
            t: pq.pq_config_for(n, dim=dim)["refine_factor"]
            for t, n in counts.items()
        }
        cal_f = pq.pq_calibrated_factor(spark, pre, emb, calq, calr)
        def pq_serve(fmap):
            out = None
            for t in sorted(counts):
                rr = evr.filter(F.col("source") == t)
                qq = evq.join(rr.select("query_id"), "query_id")
                part = pq.pq_federated_refined(
                    spark, pre, emb, qq, rr, k=10,
                    refine_factor=fmap[t],
                )
                out = part if out is None else out.unionByName(part)
            return out
        rec_rule = recall_by(pq_serve(rule_f), exact_ev, evr)
        rec_cal = recall_by(pq_serve(cal_f), exact_ev, evr)
        for t in sorted(counts):
            print(
                f"pq    {label:9s} {t:7s} K={kmap[t]:3d} "
                f"rule_factor={rule_f[t]:3d} (fetch {rule_f[t]*10}/q,"
                f" r@10={rec_rule[t]:.3f})  cal_factor={cal_f[t]:3d} "
                f"(fetch {cal_f[t]*10}/q, r@10={rec_cal[t]:.3f})",
                flush=True,
            )

        # ---- graph ----
        gcfg = {
            t: graphann.graph_config_for(n) for t, n in counts.items()
        }
        gdf = spark.createDataFrame(
            [(t, c["n_blocks"]) for t, c in gcfg.items()],
            "source string, _nb int",
        )
        gcents = (
            emb.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(gdf), "source")
            .filter(F.col("_rn") <= F.col("_nb"))
            .select(
                "source",
                F.col("vec_id").alias("centroid_id"),
                "embedding",
            )
        )
        assigned = graphann.assign_blocks_federated(
            emb, gcents, n_assign=2
        )
        gpairs = graphann.block_pair_sims_federated(emb, assigned)
        pre = f"es_probe_cal_g_{label}"
        for t in ("_pairs", "_assigned"):
            drop_table(spark, pre + t)
        graphann.save_federated_graph_index(
            gpairs, assigned, pre, n_buckets=4
        )
        rule_g = graphann.graph_auto_config(spark, pre)
        cal_g = graphann.graph_calibrated_config(
            spark, pre, emb, calq, calr
        )
        def g_serve(cmap):
            out = None
            for t in sorted(counts):
                rr = evr.filter(F.col("source") == t)
                qq = evq.join(rr.select("query_id"), "query_id")
                c = cmap[t]
                part = graphann.graph_search_federated(
                    spark, pre, emb, qq, rr, k=10, beam=c["beam"],
                    hops=c["hops"], n_entry=c["n_entry"], m=c["m"],
                )
                out = part if out is None else out.unionByName(part)
            return out
        rec_rule = recall_by(g_serve(rule_g), exact_ev, evr)
        rec_cal = recall_by(g_serve(cal_g), exact_ev, evr)
        for t in sorted(counts):
            rg, cg = rule_g[t], cal_g[t]
            print(
                f"graph {label:9s} {t:7s} "
                f"rule_beam={rg['beam']:3d} (r@10={rec_rule[t]:.3f})"
                f"  cal_beam={cg['beam']:3d} (r@10={rec_cal[t]:.3f})"
                f"  hops={cg['hops']} m={cg['m']}",
                flush=True,
            )

        # ---- graph + long-range ring links (round-10) ----
        gpairs_lr = gpairs.withColumn("_lr", F.lit(False)).unionByName(
            graphann.long_range_pairs(
                emb, long_range=2, partition_col="source"
            )
        )
        pre = f"es_probe_cal_glr_{label}"
        for t in ("_pairs", "_assigned"):
            drop_table(spark, pre + t)
        graphann.save_federated_graph_index(
            gpairs_lr, assigned, pre, n_buckets=4
        )
        rule_glr = graphann.graph_auto_config(spark, pre)
        cal_glr = graphann.graph_calibrated_config(
            spark, pre, emb, calq, calr
        )

        def glr_serve(cmap):
            out = None
            for t in sorted(counts):
                rr = evr.filter(F.col("source") == t)
                qq = evq.join(rr.select("query_id"), "query_id")
                c = cmap[t]
                part = graphann.graph_search_federated(
                    spark, pre, emb, qq, rr, k=10, beam=c["beam"],
                    hops=c["hops"], n_entry=c["n_entry"], m=c["m"],
                )
                out = part if out is None else out.unionByName(part)
            return out

        rec_rule = recall_by(glr_serve(rule_glr), exact_ev, evr)
        rec_cal = recall_by(glr_serve(cal_glr), exact_ev, evr)
        for t in sorted(counts):
            rg, cg = rule_glr[t], cal_glr[t]
            print(
                f"graph+lr2 {label:7s} {t:7s} "
                f"rule_beam={rg['beam']:3d} (r@10={rec_rule[t]:.3f})"
                f"  cal_beam={cg['beam']:3d} (r@10={rec_cal[t]:.3f})"
                f"  hops={cg['hops']} m={cg['m']}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    if "calibrate" in sys.argv[2:]:
        calibrate_probe(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        )
    elif "drift" in sys.argv[2:]:
        drift_loops(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        )
    else:
        main()
