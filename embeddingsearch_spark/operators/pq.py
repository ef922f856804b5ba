"""Product quantization (PQ) for embedding similarity at memory scale.

IVF (`operators/ann.py`) shrinks the SEARCH (probe fewer candidates); PQ
shrinks the STORAGE: a d-dim vector (256 B at d=64 float32) becomes M
small integer codes (M bytes at 256 codes/subspace) — 10^9 vectors fit
in ~8 GB of codes plus a few KB of codebooks, so the compressed index
stays executor-resident at corpus scales where the raw vectors cannot.
Composes with IVF (encode per centroid bucket) exactly like FAISS's
IVFPQ; here each stage is a DataFrame op.

Pipeline:
  train_codebooks  — per-subspace Lloyd k-means; deterministic init (the
                     K lowest-id vectors' slices). Each iteration is ONE
                     scan-stage encode (no shuffle) + ONE groupBy over
                     (subspace, code) — map-side combinable, at most M*K
                     result rows.
  encode_pq        — nearest codeword per subspace, computed per Arrow
                     batch as an (n×ds)·(ds×K) GEMM per subspace. Pure
                     scan-stage map: zero shuffle, pipelines with the
                     parquet read.
  pq_topk          — asymmetric distance computation (ADC): per query,
                     an M×K lookup table of subspace dot products; each
                     scan batch scores its codes with numpy gathers and
                     emits only its per-batch top-k (the
                     brute_force_topk_numpy contract).

Determinism: subspace L2 distances and ADC cosines are rounded to
ROUND_DIGITS before argmin/ranking, ties break to the smallest code/id —
so an independent engine reproduces codes and ranking exactly (the
DuckDB oracle replays encode + ADC in SQL against iters=0 codebooks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS

Codebooks = list  # [m_sub][k_codes][ds] python floats, driver-side


def _as_matrix(rows, vec_col_idx=0):
    import numpy as np

    return np.array(
        [np.asarray(r[vec_col_idx], dtype=np.float64) for r in rows]
    )


def initial_codebooks(
    corpus: DataFrame,
    m_sub: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Deterministic seed codebooks: subspace slices of the k_codes
    lowest-id vectors (code j = j-th lowest id) — the same init rule as
    `ann.kmeans_centroids`, reproducible by any engine."""
    rows = (
        corpus.orderBy(id_col)
        .limit(k_codes)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    d = len(rows[0][0])
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    return [
        [[float(x) for x in r[0][m * ds : (m + 1) * ds]] for r in rows]
        for m in range(m_sub)
    ]


def encode_pq(
    corpus: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    err_col: str | None = None,
) -> DataFrame:
    """All input columns + ``codes`` (array<int>, one per subspace):
    argmin_j round(||x_m - c_mj||^2, ROUND_DIGITS), ties -> smallest j.

    With ``err_col`` set, also emits the per-row RECONSTRUCTION error
    Σ_m min_j round(||x_m − c_mj||², ROUND_DIGITS) — the quantization
    distortion the chosen codes leave behind, free at encode time (the
    min is the value at the argmin already computed). Mean distortion
    rising against the codebook-training era is the PQ-native signal
    that the corpus drifted away from the quantizer
    (`streaming.annindex.monitored_pq_ingest` consumes it)."""
    import numpy as np

    C = [np.array(cb, dtype=np.float64) for cb in codebooks]
    cn2 = [np.sum(c * c, axis=1) for c in C]
    m_sub = len(C)
    ds = C[0].shape[1]
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in corpus.schema
    )
    out_schema = f"{fields}, {codes_col} array<int>"
    if err_col:
        out_schema += f", {err_col} double"

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(V), m_sub), dtype=np.int32)
            errs = np.zeros(len(V))
            for m in range(m_sub):
                X = V[:, m * ds : (m + 1) * ds]
                # ||x||^2 - 2 x.c + ||c||^2, rounded before argmin so the
                # choice is reproducible cross-engine
                d2 = np.round(
                    np.sum(X * X, axis=1)[:, None]
                    - 2.0 * (X @ C[m].T)
                    + cn2[m][None, :],
                    ROUND_DIGITS,
                )
                codes[:, m] = np.argmin(d2, axis=1)  # first min = code
                errs += np.min(d2, axis=1)
            pdf = pdf.copy()
            pdf[codes_col] = [list(map(int, c)) for c in codes]
            if err_col:
                pdf[err_col] = errs
            yield pdf

    return corpus.mapInPandas(run, schema=out_schema)


def pq_distortion(
    corpus: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[float, int]:
    """(Σ reconstruction error, n rows) of ``corpus`` under
    ``codebooks`` — one scan-stage encode + a 2-scalar aggregate.
    Sum/count are associative, so distortion accumulated per micro-batch
    equals this one-shot computation (the monitored-ingest invariant)."""
    enc = encode_pq(
        corpus, codebooks, id_col=id_col, vec_col=vec_col,
        err_col="_qerr",
    )
    row = enc.agg(
        F.sum("_qerr").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return float(row["s"] or 0.0), int(row["n"])


def train_codebooks(
    corpus: DataFrame,
    m_sub: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Lloyd refinement of the seed codebooks. Update step: posexplode the
    code array -> slice the matching subvector -> groupBy (subspace, code)
    with ds avg aggregates (partial map-side; M*K output rows). Codebooks
    stay driver-side between iterations — each pass is one declarative
    plan over the corpus, lineage does not grow (the kmeans_centroids
    precedent). Empty (m, code) cells keep their previous codeword."""
    cbs = initial_codebooks(corpus, m_sub, k_codes, id_col, vec_col)
    ds = len(cbs[0][0])
    for _ in range(iters):
        coded = encode_pq(corpus, cbs, id_col, vec_col)
        sub = coded.select(
            F.posexplode("codes").alias("m", "code"),
            F.col(vec_col).alias("_v"),
        ).select(
            "m",
            "code",
            F.expr(f"slice(_v, m * {ds} + 1, {ds})").alias("_sv"),
        )
        means = sub.groupBy("m", "code").agg(
            F.array(
                *[F.avg(F.col("_sv")[i].cast("double")) for i in range(ds)]
            ).alias("_mean")
        ).collect()
        by_cell = {(r[0], r[1]): r[2] for r in means}
        cbs = [
            [
                [float(x) for x in by_cell.get((m, j), cbs[m][j])]
                for j in range(k_codes)
            ]
            for m in range(m_sub)
        ]
    return cbs


def pq_topk(
    coded: DataFrame,
    codebooks: Codebooks,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k over PQ codes: cosine(q, reconstruction(codes)) =
    (sum_m LUT_dot[m][code_m]) / (|q| * sqrt(sum_m |c_m|^2)), remapped to
    [0,1] and rounded like every similarity in this engine. The scan
    reads ONLY (id, codes) — at 10^9 rows that is ~{M+8} bytes/row; the
    original vectors never leave storage."""
    import numpy as np

    C = [np.array(cb, dtype=np.float64) for cb in codebooks]
    cn2 = [np.sum(c * c, axis=1) for c in C]  # [m][K]
    m_sub = len(C)
    ds = C[0].shape[1]

    q_rows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[0] for r in q_rows])
    Q = _as_matrix(q_rows, 1)
    qn = np.linalg.norm(Q, axis=1)
    # LUT[m]: (n_queries × K) subspace dot products
    lut = [Q[:, m * ds : (m + 1) * ds] @ C[m].T for m in range(m_sub)]

    out_schema = f"{query_id_col} long, {id_col} long, cosine double"

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(
                [np.asarray(c, dtype=np.int64) for c in pdf[codes_col]]
            )
            n = len(codes)
            dots = np.zeros((n, len(qids)))
            rn2 = np.zeros(n)
            for m in range(m_sub):
                cm = codes[:, m]
                dots += lut[m][:, cm].T  # (n × q)
                rn2 += cn2[m][cm]
            rn = np.sqrt(rn2)
            denom = rn[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = np.where(denom == 0.0, 0.0, dots / denom)
            sim = np.round((raw + 1.0) / 2.0, ROUND_DIGITS)
            ids = pdf[id_col].to_numpy()
            recs = []
            for j in range(len(qids)):
                col = sim[:, j]
                order = np.lexsort((ids, -col))[: min(k, n)]
                recs.extend(
                    (int(qids[j]), int(ids[i]), float(col[i])) for i in order
                )
            yield pd.DataFrame(
                recs, columns=[query_id_col, id_col, "cosine"]
            )

    partial = coded.select(id_col, codes_col).mapInPandas(
        part, schema=out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk_refined(
    coded: DataFrame,
    codebooks: Codebooks,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ with a refine stage (the FAISS ``IndexRefineFlat`` recipe —
    public): the ADC pass shortlists ``refine_factor·k`` candidates
    per query from the codes alone, then ONLY those ids fetch their
    raw vectors and re-score exactly; the final top-``k`` ranks by
    exact cosine. Buys back ADC's quantization error at the cost of
    reading refine_factor·k·|Q| raw vectors instead of zero — the
    read volume stays independent of corpus size, which is the whole
    point. With refine_factor·k ≥ |corpus| this degenerates to exact
    brute force (the test contract).

    Output matches the exact scorers' contract: ``(query_id, vec_id,
    cosine, rank<=k)`` with remapped rounded cosine and (score desc,
    id asc) ties."""
    shortlist = pq_topk(
        coded, codebooks, queries, k=refine_factor * k,
        id_col=id_col, codes_col=codes_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    return _exact_rescore(
        emb, queries, shortlist, k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def _exact_rescore(
    emb: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Fetch raw vectors for the (query, candidate) ``shortlist`` and
    rank by exact rounded cosine — the refine tail shared by the fixed
    and adaptive refine paths."""
    from embeddingsearch_spark.functions.vectors import dot, norm2
    from embeddingsearch_spark.operators.ann import _cosine_from_parts

    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            norm2(F.col(vec_col)).alias("_qn"),
        )
    )
    vecs = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        norm2(F.col(vec_col)).alias("_vn"),
    )
    # the shortlist is |Q|·factor·k rows — broadcast it so the
    # raw-vector fetch is a scan-side semi-join, not a corpus shuffle
    scored = (
        vecs.join(F.broadcast(shortlist), id_col)
        .join(q, query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                _cosine_from_parts(
                    dot(F.col("_v"), F.col("_qv")),
                    F.col("_vn"),
                    F.col("_qn"),
                ),
                ROUND_DIGITS,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _allocate_shortlist(
    cand: DataFrame,
    k: int,
    base_factor: int,
    deep_factor: int,
    budget_rows: int | None,
    query_id_col: str,
    id_col: str,
) -> DataFrame:
    """The distortion-budgeted depth allocation shared by the global
    and federated adaptive refines: ``cand`` carries (query_id, id,
    _adc_rank, _err); each query's signal is the rounded mean error of
    its top base_factor·k ADC candidates; queries rank by (signal
    desc, id asc) and the highest-distortion ones widen to
    deep_factor·k until ``budget_rows`` raw-vector reads are spent
    (None widens every query). All frames here are |Q|-bounded — the
    unpartitioned windows never see corpus-sized data."""
    sig = (
        cand.filter(F.col("_adc_rank") <= base_factor * k)
        .groupBy(query_id_col)
        .agg(F.round(F.avg("_err"), ROUND_DIGITS).alias("_sig"))
    )
    if budget_rows is None:
        depths = sig.select(
            query_id_col,
            F.lit(deep_factor * k).alias("_depth"),
        )
    else:
        wq = Window.orderBy(
            F.col("_sig").desc(), F.col(query_id_col).asc()
        )
        wall = Window.partitionBy(F.lit(1))
        extra = (deep_factor - base_factor) * k
        n_deep = F.greatest(
            F.lit(0),
            F.least(
                F.col("_nq"),
                F.floor(
                    (
                        F.lit(int(budget_rows))
                        - F.col("_nq") * base_factor * k
                    )
                    / extra
                ),
            ),
        )
        depths = (
            sig.withColumn("_qr", F.row_number().over(wq))
            .withColumn("_nq", F.count(F.lit(1)).over(wall))
            .select(
                query_id_col,
                F.when(
                    F.col("_qr") <= n_deep, F.lit(deep_factor * k)
                )
                .otherwise(F.lit(base_factor * k))
                .alias("_depth"),
            )
        )
    return (
        cand.join(F.broadcast(depths), query_id_col)
        .filter(F.col("_adc_rank") <= F.col("_depth"))
        .select(query_id_col, id_col)
    )


def pq_topk_refined_adaptive(
    coded: DataFrame,
    codebooks: Codebooks,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    base_factor: int = 2,
    deep_factor: int = 8,
    budget_rows: int | None = None,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    err_col: str = "qerr",
) -> DataFrame:
    """DISTORTION-BUDGETED refine: `pq_topk_refined`'s refine_factor
    is one global knob, paying the same raw-vector read volume for a
    query whose ADC candidates reconstruct almost exactly as for one
    whose candidates the quantizer mangled. The per-row quantization
    error `encode_pq(err_col=...)` already emits (free at encode time)
    says WHICH queries need the deeper look: a query whose top
    candidates carry high distortion has an untrustworthy ADC ranking.

    Allocation, all deterministic: one ADC pass shortlists
    ``deep_factor·k`` per query; each query's distortion signal is the
    rounded mean ``err_col`` over its top ``base_factor·k`` ADC
    candidates; queries rank by (signal desc, id asc); under a total
    read budget of ``budget_rows`` raw vectors, every query gets the
    ``base_factor·k`` floor and the highest-distortion queries widen
    to ``deep_factor·k`` until the budget is spent —
    n_deep = clamp(⌊(budget − nq·base·k) / ((deep−base)·k)⌋, 0, nq).
    ``budget_rows=None`` widens every query (= fixed refine at
    deep_factor). The signal/allocation frames are |Q|-bounded (the
    single-partition windows below never see corpus-sized data); the
    corpus-side work is the ADC codes scan, a column-pruned (id, err)
    re-scan for the shortlist's distortions, and the budgeted vector
    fetch — the raw-vector read volume is the knob the budget caps.

    ``coded`` must carry ``err_col`` from `encode_pq`. Output contract
    matches the exact scorers: (query_id, vec_id, cosine, rank<=k)."""
    if base_factor < 1 or deep_factor < base_factor:
        raise ValueError("need 1 <= base_factor <= deep_factor")
    short = pq_topk(
        coded, codebooks, queries, k=deep_factor * k,
        id_col=id_col, codes_col=codes_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col, F.col("rank").alias("_adc_rank"))
    # per-candidate distortion: scan-side broadcast join against the
    # codes table's err column (|Q|·deep·k rows out)
    cand = (
        coded.select(id_col, F.col(err_col).alias("_err"))
        .join(F.broadcast(short), id_col)
        .localCheckpoint(eager=False)
    )
    shortlist = _allocate_shortlist(
        cand, k, base_factor, deep_factor, budget_rows,
        query_id_col, id_col,
    )
    return _exact_rescore(
        emb, queries, shortlist, k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def save_pq_index(
    coded: DataFrame,
    codebooks: Codebooks,
    prefix: str,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> tuple[str, str]:
    """PERSIST the PQ index — the point of PQ is that the CODES are
    the index (M bytes/vector), so what gets stored is exactly what a
    query scans: ``{prefix}_codes`` (id, codes — bucketed by id so the
    incremental upsert's anti-join needs no exchange on the stored
    side) plus ``{prefix}_codebooks`` (one row per (subspace, code)
    centroid — M·K rows, the few-KB driver artifact made durable).
    Cross-session reuse needs a persistent metastore. Returns the two
    table names."""
    from embeddingsearch_spark.storage import drop_table, replace_bucketed

    spark = coded.sparkSession
    replace_bucketed(
        coded.select(id_col, codes_col),
        f"{prefix}_codes",
        [id_col],
        n_buckets=n_buckets,
    )
    rows = [
        (m, j, [float(x) for x in c])
        for m, cb in enumerate(codebooks)
        for j, c in enumerate(cb)
    ]
    cb_df = spark.createDataFrame(
        rows, "m int, code int, centroid array<double>"
    )
    drop_table(spark, f"{prefix}_codebooks")
    cb_df.write.saveAsTable(f"{prefix}_codebooks")
    return f"{prefix}_codes", f"{prefix}_codebooks"


def load_pq_codebooks(spark, prefix: str) -> Codebooks:
    """Rebuild the driver-side codebook list from the persisted table
    (M·K rows — bounded by construction, the quantizer IS small)."""
    rows = (
        spark.table(f"{prefix}_codebooks").orderBy("m", "code").collect()
    )
    m_sub = max(r["m"] for r in rows) + 1
    cbs: Codebooks = [[] for _ in range(m_sub)]
    for r in rows:
        cbs[r["m"]].append(list(r["centroid"]))
    return cbs


def pq_topk_from_index(
    spark,
    prefix: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """`pq_topk` over a persisted `save_pq_index` — identical output
    (same oracle); the scan reads only the stored (id, codes) table."""
    cbs = load_pq_codebooks(spark, prefix)
    return pq_topk(
        spark.table(f"{prefix}_codes"), cbs, queries, k=k,
        id_col=id_col, codes_col=codes_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )


def upsert_pq_index(
    spark,
    prefix: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    n_buckets: int = 8,
    deleted_ids: DataFrame | None = None,
    sink=None,
) -> str:
    """Incremental PQ maintenance: encode ONLY the batch with the
    persisted (FIXED) codebooks — codes of unchanged vectors cannot
    change under a fixed quantizer, the same invariant the graph merge
    rests on — then DELETE-INSERT the codes table through the
    MERGE-capable storage seam: delete keys are the batch's ids plus
    ``deleted_ids`` (delete wins over a conflicting batch row),
    inserts the fresh codes. Re-train codebooks offline and rebuild to
    re-center."""
    from pyspark.sql import functions as F

    from embeddingsearch_spark.sink import ParquetRewriteSink

    sink = sink or ParquetRewriteSink()
    cbs = load_pq_codebooks(spark, prefix)
    dk = new_vectors.select(id_col).distinct()
    if deleted_ids is not None:
        dd = deleted_ids.select(
            F.col(deleted_ids.columns[0]).alias(id_col)
        ).distinct()
        new_vectors = new_vectors.join(dd, id_col, "left_anti")
        dk = dk.unionByName(dd).distinct()
    new_codes = encode_pq(
        new_vectors, cbs, id_col=id_col, vec_col=vec_col,
        codes_col=codes_col,
    ).select(id_col, codes_col)
    sink.delete_insert(
        spark, f"{prefix}_codes", new_codes, [id_col],
        delete_keys=dk, bucket_cols=[id_col], n_buckets=n_buckets,
    )
    return f"{prefix}_codes"


def pq_config_for(n: int, dim: int, k: int = 10) -> dict:
    """Size the PQ quantizer + refine from the corpus — the
    `graph_config_for` convention for the compressed family, constants
    pinned by the BASELINE.md round-7 tenant recall probe (the probe's
    finding: "refine ⇒ recall≥0.9" is a QUANTIZER-QUALITY property on
    uniform-random vectors — the ADC shortlist must contain the true
    neighbors before the exact re-rank can surface them; K=16 at
    n=2500 refined to only 0.60 where K=64/factor=16 reached 0.91):

    - ``k_codes``: the smallest power of two in [16, 256] covering
      n/40 — codes grow with the (per-tenant) corpus so per-subspace
      cells stay selective (n=250 → 16, n=2500 → 64, n=10k+ → 256,
      the byte-per-subspace ceiling);
    - ``m_sub``: 8-dim subspaces (dim/8, floor 1) — the probe's
      measured config; finer subspaces raise LUT cost linearly for
      little recall on this family;
    - ``refine_factor``: 16 — with a corpus-sized quantizer this is
      the factor that clears recall@10 ≈ 0.9 (0.98 at 32; raw-vector
      reads stay factor·k·|Q|, corpus-size-independent).

    Sized per COLLECTION for the federated family — each tenant's
    quantizer grows with ITS corpus, the same per-tenant knob
    `graph_config_for` pins for blocks."""
    import math

    n = max(int(n), 2)
    k_codes = 16
    while k_codes < min(256, max(16, n / 40.0)):
        k_codes *= 2
    m_sub = max(1, int(dim) // 8)
    return {
        "m_sub": m_sub,
        "k_codes": int(k_codes),
        "refine_factor": 16,
    }


def initial_codebooks_federated(
    corpus: DataFrame,
    partition_col: str = "source",
    m_sub: int = 8,
    k_codes: int | dict = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Per-collection seed codebooks — `initial_codebooks`' rule
    applied within each collection: code j = the collection's j-th
    LOWEST id (tenant-local ranks, so any engine reproduces each
    tenant's quantizer independently of the others). One pass + one
    bounded collect (collections × k_codes rows). Returns
    {collection: Codebooks}.

    ``k_codes`` may be a ``{tenant: K}`` dict (the `pq_config_for`
    per-collection sizing — each tenant's quantizer grows with ITS
    corpus); collections missing from the dict are dropped, matching
    the no-codebooks-no-encode contract."""
    if isinstance(k_codes, dict):
        kmax = max(k_codes.values())
        kfor = {str(t): int(v) for t, v in k_codes.items()}
    else:
        kmax = int(k_codes)
        kfor = None
    w = Window.partitionBy(partition_col).orderBy(id_col)
    rows = (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= kmax)
        .select(
            partition_col,
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    by: dict = {}
    for r in sorted(rows, key=lambda r: (str(r[0]), r[1])):
        t = r[0]
        limit = kfor.get(str(t)) if kfor is not None else kmax
        if limit is None:
            continue
        if len(by.get(t, ())) < limit:
            by.setdefault(t, []).append(r["_v"])
    out = {}
    for t, vecs in by.items():
        d = len(vecs[0])
        if d % m_sub:
            raise ValueError(
                f"dim {d} not divisible by m_sub {m_sub}"
            )
        ds = d // m_sub
        out[t] = [
            [
                [float(x) for x in v[m * ds : (m + 1) * ds]]
                for v in vecs
            ]
            for m in range(m_sub)
        ]
    return out


def encode_pq_federated(
    corpus: DataFrame,
    codebooks_by: dict,
    partition_col: str = "source",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    err_col: str | None = None,
) -> DataFrame:
    """Per-collection PQ encode in ONE corpus pass: each vector encodes
    against ITS OWN collection's codebooks — the same round/argmin
    tiebreak as `encode_pq` (a single-collection corpus encodes
    identically; tested). All collections' codebooks together remain
    a driver artifact (M·K·d floats per tenant), shipped in the task
    closure keyed by collection. Vectors whose collection has no
    codebooks are dropped, not cross-encoded (the
    `assign_centroids_federated` contract). With ``err_col`` set, also
    emits `encode_pq`'s per-row reconstruction error (each under its
    own tenant's codebooks) — free at encode time, the signal the
    distortion-budgeted adaptive refine and the PQ drift monitor
    consume."""
    import numpy as np

    packs = {}
    for t, codebooks in codebooks_by.items():
        C = [np.array(cb, dtype=np.float64) for cb in codebooks]
        packs[t] = (C, [np.sum(c * c, axis=1) for c in C])
    m_sub = len(next(iter(codebooks_by.values())))
    ds = len(codebooks_by[next(iter(codebooks_by))][0][0])
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in corpus.schema
    )
    out_schema = f"{fields}, {codes_col} array<int>"
    if err_col:
        out_schema += f", {err_col} double"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True).copy()
            codes_out = [None] * len(pdf)
            errs_out = [None] * len(pdf)
            for t, grp in pdf.groupby(partition_col, sort=False):
                pack = packs.get(t)
                if pack is None:
                    continue
                C, cn2 = pack
                V = np.array(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in grp[vec_col]
                    ]
                )
                codes = np.empty((len(V), m_sub), dtype=np.int32)
                errs = np.zeros(len(V))
                for m in range(m_sub):
                    X = V[:, m * ds : (m + 1) * ds]
                    d2 = np.round(
                        np.sum(X * X, axis=1)[:, None]
                        - 2.0 * (X @ C[m].T)
                        + cn2[m][None, :],
                        ROUND_DIGITS,
                    )
                    codes[:, m] = np.argmin(d2, axis=1)
                    errs += np.min(d2, axis=1)
                for pos, c, e in zip(
                    grp.index.to_numpy(), codes, errs
                ):
                    codes_out[pos] = list(map(int, c))
                    errs_out[pos] = float(e)
            pdf[codes_col] = pd.Series(codes_out, dtype=object)
            if err_col:
                pdf[err_col] = pd.Series(errs_out, dtype="float64")
            yield pdf[pdf[codes_col].notna()]

    return corpus.mapInPandas(run, schema=out_schema)


def save_federated_pq_index(
    coded: DataFrame,
    codebooks_by: dict,
    prefix: str,
    partition_col: str = "source",
    n_buckets: int = 8,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    err_col: str | None = None,
) -> tuple[str, str]:
    """PERSIST the multi-tenant PQ index: the codes table PARTITIONED
    by collection (a routed ADC scan statically prunes to its own
    tenant's code files; a tenant's ingest rewrites only its subtree)
    and bucketed by id within; all collections' codebooks in one
    (collection, m, code, centroid) table. ``err_col`` persists the
    encode-time reconstruction error alongside the codes (one double
    per row) — the adaptive refine's serve-time distortion signal."""
    from embeddingsearch_spark.storage import drop_table, replace_bucketed

    spark = coded.sparkSession
    cols = [id_col, partition_col, codes_col] + (
        [err_col] if err_col else []
    )
    replace_bucketed(
        coded.select(*cols),
        f"{prefix}_codes",
        [id_col],
        n_buckets=n_buckets,
        partition_cols=[partition_col],
    )
    rows = [
        (t, m, j, [float(x) for x in c])
        for t, codebooks in sorted(codebooks_by.items())
        for m, cb in enumerate(codebooks)
        for j, c in enumerate(cb)
    ]
    cb_df = spark.createDataFrame(
        rows,
        f"{partition_col} string, m int, code int, "
        "centroid array<double>",
    )
    drop_table(spark, f"{prefix}_codebooks")
    cb_df.write.saveAsTable(f"{prefix}_codebooks")
    return f"{prefix}_codes", f"{prefix}_codebooks"


def load_federated_pq_codebooks(
    spark, prefix: str, partition_col: str = "source"
) -> dict:
    """Rebuild {collection: Codebooks} from the persisted table."""
    rows = (
        spark.table(f"{prefix}_codebooks")
        .orderBy(partition_col, "m", "code")
        .collect()
    )
    out: dict = {}
    for r in rows:
        cbs = out.setdefault(r[partition_col], [])
        while len(cbs) <= r["m"]:
            cbs.append([])
        cbs[r["m"]].append(list(r["centroid"]))
    return out


def pq_federated_from_index(
    spark,
    prefix: str,
    queries: DataFrame,
    route: DataFrame,
    k: int = 10,
    partition_col: str = "source",
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Tenant-routed ADC serving over `save_federated_pq_index` — the
    compressed twin of `ivf_federated_from_index`: the routed
    collections become a static partition predicate on the codes
    table (a query's scan reads ONLY its own tenant's M-byte code
    rows), and each query's LUTs derive from ITS collection's OWN
    codebooks, so scoring is per-searchdomain by construction. Equals
    per-tenant `pq_topk` inside each collection (tested); columns
    (query_id, id, cosine, rank)."""
    import numpy as np

    cbs_by = load_federated_pq_codebooks(
        spark, prefix, partition_col=partition_col
    )
    q_rows = queries.join(
        F.broadcast(route.select(query_id_col, partition_col)),
        query_id_col,
    ).select(partition_col, query_id_col, vec_col).collect()
    packs = {}
    for t in sorted({str(r[0]) for r in q_rows}):
        rows_t = [r for r in q_rows if str(r[0]) == t]
        if t not in cbs_by:
            raise ValueError(f"no codebooks for collection {t!r}")
        C = [np.array(cb, dtype=np.float64) for cb in cbs_by[t]]
        cn2 = [np.sum(c * c, axis=1) for c in C]
        m_sub = len(C)
        ds = C[0].shape[1]
        qids = np.array([r[1] for r in rows_t])
        Q = _as_matrix(rows_t, 2)
        qn = np.linalg.norm(Q, axis=1)
        lut = [
            Q[:, m * ds : (m + 1) * ds] @ C[m].T for m in range(m_sub)
        ]
        packs[t] = (qids, qn, lut, cn2, m_sub)
    pruned = spark.table(f"{prefix}_codes").filter(
        F.col(partition_col).isin(list(packs))
    )
    out_schema = f"{query_id_col} long, {id_col} long, cosine double"

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            for t, grp in pdf.groupby(partition_col, sort=False):
                pack = packs.get(t)
                if pack is None:
                    continue
                qids, qn, lut, cn2, m_sub = pack
                codes = np.array(
                    [
                        np.asarray(c, dtype=np.int64)
                        for c in grp[codes_col]
                    ]
                )
                n = len(codes)
                dots = np.zeros((n, len(qids)))
                rn2 = np.zeros(n)
                for m in range(m_sub):
                    cm = codes[:, m]
                    dots += lut[m][:, cm].T
                    rn2 += cn2[m][cm]
                rn = np.sqrt(rn2)
                denom = rn[:, None] * qn[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    raw = np.where(denom == 0.0, 0.0, dots / denom)
                sim = np.round((raw + 1.0) / 2.0, ROUND_DIGITS)
                ids = grp[id_col].to_numpy()
                recs = []
                for j in range(len(qids)):
                    col = sim[:, j]
                    order = np.lexsort((ids, -col))[: min(k, n)]
                    recs.extend(
                        (int(qids[j]), int(ids[i]), float(col[i]))
                        for i in order
                    )
                yield pd.DataFrame(
                    recs, columns=[query_id_col, id_col, "cosine"]
                )

    partial = pruned.select(
        id_col, partition_col, codes_col
    ).mapInPandas(part, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_federated_refined(
    spark,
    prefix: str,
    emb: DataFrame,
    queries: DataFrame,
    route: DataFrame,
    k: int = 10,
    refine_factor: int = 8,
    partition_col: str = "source",
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Tenant-routed PQ with the REFINE stage — `pq_topk_refined`'s
    FAISS ``IndexRefineFlat`` recipe threaded through the federated
    layout: the routed ADC serve shortlists ``refine_factor·k``
    candidates per query from the tenant's OWN code partitions (the
    `pq_federated_from_index` path, statically pruned), then ONLY
    those ids fetch their raw vectors and re-score by exact rounded
    cosine. The raw-vector frame is pruned to the ROUTED collections
    first — a static partition predicate when ``emb`` scans a
    tenant-partitioned table — so one tenant's refine never reads
    another tenant's vector files; the fetch itself is a broadcast
    semi-join of the |Q|·factor·k shortlist against the scan, read
    volume independent of corpus size. The shortlist is tenant-pure
    by construction (the ADC scan prunes per tenant), so the exact
    re-rank cannot leak cross-tenant candidates.

    Buys back the ADC-only federated path's quantization loss, but
    only as far as the quantizer allows (BASELINE.md tenant probe:
    recall@10 0.23 ADC-only → 0.60 at the K=16/refine_factor=8 gate
    config; the `pq_config_for` quality config K=64/factor=16 reaches
    0.91/0.90, 0.98 at factor=32). Output matches the exact scorers'
    contract: (query_id, vec_id, cosine, rank<=k)."""
    shortlist = pq_federated_from_index(
        spark, prefix, queries, route, k=refine_factor * k,
        partition_col=partition_col, id_col=id_col,
        codes_col=codes_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    if partition_col in emb.columns:
        routed = [
            r[0]
            for r in route.select(partition_col).distinct().collect()
        ]  # bounded: <= #collections
        emb = emb.filter(F.col(partition_col).isin(routed))
    return _exact_rescore(
        emb, queries, shortlist, k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def pq_federated_refined_adaptive(
    spark,
    prefix: str,
    emb: DataFrame,
    queries: DataFrame,
    route: DataFrame,
    k: int = 10,
    base_factor: int = 2,
    deep_factor: int = 8,
    budget_rows: int | dict | None = None,
    partition_col: str = "source",
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    err_col: str = "qerr",
) -> DataFrame:
    """DISTORTION-BUDGETED refine through the tenant layout —
    `pq_topk_refined_adaptive`'s allocation over the federated serve:
    the routed ADC pass shortlists ``deep_factor·k`` per query from
    each tenant's own code partitions; each candidate's encode-time
    reconstruction error (persisted alongside the codes —
    `save_federated_pq_index(err_col=)`, computed under the
    candidate's OWN tenant's codebooks) feeds the shared
    `_allocate_shortlist` depth allocation, so the raw-vector read
    budget flows to the queries whose tenants' quantizers mangled
    their candidates most. The distortion fetch and the exact re-rank
    both prune to the routed tenants' partitions. Requires the codes
    table to carry ``err_col``. Output: (query_id, vec_id, cosine,
    rank<=k).

    ``budget_rows`` may be an int (one GLOBAL read bound — queries
    compete across tenants), a ``{tenant: budget}`` dict (the
    reference's per-searchdomain cost model: each collection's
    queries compete only for THEIR collection's raw-vector budget —
    the allocation runs once per routed tenant, a bounded loop; every
    routed tenant must appear in the map), or None (every query
    widens to deep_factor·k)."""
    short = pq_federated_from_index(
        spark, prefix, queries, route, k=deep_factor * k,
        partition_col=partition_col, id_col=id_col,
        codes_col=codes_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(
        query_id_col, id_col, F.col("rank").alias("_adc_rank")
    )
    routed = [
        r[0]
        for r in route.select(partition_col).distinct().collect()
    ]  # bounded: <= #collections
    codes_src = spark.table(f"{prefix}_codes").filter(
        F.col(partition_col).isin(routed)
    )
    if err_col not in codes_src.columns:
        raise ValueError(
            f"codes table {prefix}_codes lacks {err_col!r} — save the "
            "index with save_federated_pq_index(err_col=...)"
        )
    cand = (
        codes_src.select(id_col, F.col(err_col).alias("_err"))
        .join(F.broadcast(short), id_col)
        .localCheckpoint(eager=False)
    )
    if isinstance(budget_rows, dict):
        budgets = {str(t): b for t, b in budget_rows.items()}
        missing = sorted(str(t) for t in routed if str(t) not in budgets)
        if missing:
            raise ValueError(
                f"no budget for routed collections: {missing}"
            )
        r = route.select(query_id_col, partition_col)
        shortlist = None
        for t in sorted(budgets):  # bounded: <= #collections
            qids_t = F.broadcast(
                r.filter(F.col(partition_col) == t).select(query_id_col)
            )
            part = _allocate_shortlist(
                cand.join(qids_t, query_id_col),
                k, base_factor, deep_factor, budgets[t],
                query_id_col, id_col,
            )
            shortlist = (
                part if shortlist is None
                else shortlist.unionByName(part)
            )
    else:
        shortlist = _allocate_shortlist(
            cand, k, base_factor, deep_factor, budget_rows,
            query_id_col, id_col,
        )
    if partition_col in emb.columns:
        emb = emb.filter(F.col(partition_col).isin(routed))
    return _exact_rescore(
        emb, queries, shortlist, k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def pq_calibrated_factor(
    spark,
    prefix: str,
    emb: DataFrame,
    sample_queries: DataFrame,
    route: DataFrame,
    k: int = 10,
    recall_target: float = 0.9,
    sample_per_tenant: int = 64,
    max_factor: int = 64,
    corpus_sample: float | None = None,
    partition_col: str = "source",
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> dict:
    """MEASURED refine factors for a persisted federated PQ index —
    the compressed twin of `ivf_calibrated_nprobe` (the rule's
    refine_factor=16 is the uniform-random worst case; an
    easy/clustered corpus clears the target at a fraction of it, and
    every unit of factor is k raw-vector fetches per query at serve
    time): per tenant, measure recall@k of the REFINED serve on a
    bounded query sample and take the SMALLEST factor that reaches
    ``recall_target``.

    One pass, every factor at once: the refined serve exact-reranks
    the top ``factor·k`` ADC candidates, and an exact-top-k member
    inside that shortlist always survives the rerank (at most k-1
    vectors outrank it anywhere), so recall@k at factor f is exactly
    the fraction of exact pairs whose ADC rank ≤ f·k. One ADC
    ranking of the sample (cut at ``max_factor·k``) plus one exact
    pass gives the full recall-vs-factor curve; the calibrated
    factor is ceil(need/k) of the ceil(target·m)-th smallest ADC
    rank. Pairs beyond the cut — and tenants with no sample
    queries — fall back to the `pq_config_for` rule factor.

    Cost: the ADC pass scans each routed tenant's code partitions
    once for ≤ ``sample_per_tenant`` queries, the exact pass scans
    their raw vectors once — bounded offline calibration, run per
    index generation; at 100-TB bound the exact pass's corpus side
    too with ``corpus_sample`` (deterministic crc32 cut — ADC ranks
    stay full-width, ground truth becomes the sampled tenant's
    top-k). Returns ``{tenant: refine_factor}``, usable as
    the per-tenant factor map the cached/aliased auto serves group
    by; ``config="calibrated"`` threads here from
    `serve_pq_federated_cached`."""
    import math

    from embeddingsearch_spark.functions.vectors import dot, norm2
    from embeddingsearch_spark.operators.ann import _cosine_from_parts

    ws = Window.partitionBy(partition_col).orderBy(
        F.col(query_id_col).asc()
    )
    qs = (
        sample_queries.join(
            F.broadcast(route.select(query_id_col, partition_col)),
            query_id_col,
        )
        .withColumn("_sr", F.row_number().over(ws))
        .filter(F.col("_sr") <= int(sample_per_tenant))
        .select(query_id_col, partition_col, vec_col)
        .localCheckpoint(eager=False)
    )
    routed = [
        r[0] for r in qs.select(partition_col).distinct().collect()
    ]
    # the rule fallback, from LIVE code counts (the auto serves' map)
    out: dict = {}
    dim_row = sample_queries.select(vec_col).head()
    if dim_row is not None:
        dim = len(dim_row[0])
        for r in (
            spark.table(f"{prefix}_codes")
            .groupBy(partition_col)
            .count()
            .collect()
        ):  # bounded: one row per collection
            out[str(r[0])] = pq_config_for(int(r[1]), dim)[
                "refine_factor"
            ]
    if not routed:
        return out
    cut = int(max_factor) * int(k)
    adc = pq_federated_from_index(
        spark, prefix,
        qs.select(query_id_col, vec_col),
        qs.select(query_id_col, partition_col),
        k=cut, partition_col=partition_col, id_col=id_col,
        codes_col=codes_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col, F.col("rank").alias("_need"))
    if partition_col in emb.columns:
        emb = emb.filter(F.col(partition_col).isin(routed))
    if corpus_sample is not None and corpus_sample < 1.0:
        from embeddingsearch_spark.operators.ann import (
            _corpus_sample_pred,
        )

        emb = emb.filter(_corpus_sample_pred(id_col, corpus_sample))
    qb = F.broadcast(
        qs.select(
            query_id_col,
            partition_col,
            F.col(vec_col).alias("_qv"),
            norm2(F.col(vec_col)).alias("_qn"),
        )
    )
    sim = _cosine_from_parts(
        dot(F.col(vec_col), F.col("_qv")),
        F.col("_vn"),
        F.col("_qn"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col(id_col).asc()
    )
    exact = (
        emb.withColumn("_vn", norm2(F.col(vec_col)))
        .join(qb, partition_col)
        .select(
            query_id_col,
            partition_col,
            F.col(id_col),
            F.round(sim, ROUND_DIGITS).alias("_sim"),
        )
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= int(k))
    )
    hist = (
        exact.join(adc, [query_id_col, id_col], "left")
        .groupBy(partition_col, "_need")
        .count()
        .collect()
    )  # bounded: <= tenants x (sample x k distinct ranks)
    dist: dict = {}
    for r in hist:
        need = int(r[1]) if r[1] is not None else cut + 1  # beyond cut
        d = dist.setdefault(str(r[0]), {})
        d[need] = d.get(need, 0) + int(r[2])
    for t, d in dist.items():
        m = sum(d.values())
        pos = max(1, math.ceil(float(recall_target) * m))
        acc = 0
        for needv in sorted(d):
            acc += d[needv]
            if acc >= pos:
                if needv <= cut:  # beyond-cut: keep the rule factor
                    out[t] = int(max(1, math.ceil(needv / float(k))))
                break
    return out


def upsert_federated_pq_index(
    spark,
    prefix: str,
    new_vectors: DataFrame,
    partition_col: str = "source",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    n_buckets: int = 8,
    deleted_ids: DataFrame | None = None,
    sink=None,
    err_col: str | None = None,
) -> str:
    """Incremental maintenance of the multi-tenant PQ index: encode
    ONLY the batch, each vector under ITS OWN collection's persisted
    (fixed) codebooks, then delete-insert through the
    partition-overwrite seam — one tenant's ingest never reads or
    writes another tenant's code files. ``deleted_ids`` wins over a
    conflicting batch row. Pass ``err_col`` when the codes table was
    saved with it (the adaptive-refine layout) so the batch's rows
    carry the same distortion column."""
    from embeddingsearch_spark.sink import PartitionOverwriteSink

    sink = sink or PartitionOverwriteSink(partition_col)
    cbs_by = load_federated_pq_codebooks(
        spark, prefix, partition_col=partition_col
    )
    dk = new_vectors.select(id_col).distinct()
    if deleted_ids is not None:
        dd = deleted_ids.select(
            F.col(deleted_ids.columns[0]).alias(id_col)
        ).distinct()
        new_vectors = new_vectors.join(dd, id_col, "left_anti")
        dk = dk.unionByName(dd).distinct()
    new_codes = encode_pq_federated(
        new_vectors, cbs_by, partition_col=partition_col,
        id_col=id_col, vec_col=vec_col, codes_col=codes_col,
        err_col=err_col,
    ).select(
        id_col, partition_col, codes_col,
        *([err_col] if err_col else []),
    )
    sink.delete_insert(
        spark, f"{prefix}_codes", new_codes, [id_col],
        delete_keys=dk, bucket_cols=[id_col], n_buckets=n_buckets,
        partition_cols=[partition_col],
    )
    return f"{prefix}_codes"


def ivfpq_topk(
    coded: DataFrame,
    codebooks: Codebooks,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF x PQ (the FAISS IVFPQ shape, one DataFrame op per stage):
    rank coarse centroids per query, keep ``nprobe`` buckets, ADC-score
    ONLY those buckets' codes. ``coded`` carries both ``centroid_id``
    (from `ann.assign_centroids`) and ``codes`` (from `encode_pq`); with
    the index written partitioned by centroid_id, the probe join prunes
    to nprobe/n_centroids of the files and each surviving row costs an
    M-gather instead of a d-dim dot. At nprobe = n_centroids this is
    exactly `pq_topk` (tested)."""
    import numpy as np

    from embeddingsearch_spark.operators.ann import brute_force_topk

    C = [np.array(cb, dtype=np.float64) for cb in codebooks]
    cn2 = [np.sum(c * c, axis=1) for c in C]
    m_sub = len(C)
    ds = C[0].shape[1]

    q_rows = queries.select(query_id_col, vec_col).collect()
    qindex = {r[0]: j for j, r in enumerate(q_rows)}
    Q = _as_matrix(q_rows, 1)
    qn = np.linalg.norm(Q, axis=1)
    lut = [Q[:, m * ds : (m + 1) * ds] @ C[m].T for m in range(m_sub)]

    probe = brute_force_topk(
        centroids, queries, k=nprobe,
        id_col=centroid_id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select(query_id_col, centroid_id_col)
    cand = coded.select(id_col, codes_col, centroid_id_col).join(
        F.broadcast(probe), centroid_id_col
    )

    out_schema = f"{query_id_col} long, {id_col} long, cosine double"

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            recs = []
            for qid_val, g in pdf.groupby(query_id_col):
                j = qindex[qid_val]
                codes = np.array(
                    [np.asarray(c, dtype=np.int64) for c in g[codes_col]]
                )
                dots = np.zeros(len(codes))
                rn2 = np.zeros(len(codes))
                for m in range(m_sub):
                    cm = codes[:, m]
                    dots += lut[m][j, cm]
                    rn2 += cn2[m][cm]
                denom = np.sqrt(rn2) * qn[j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    raw = np.where(denom == 0.0, 0.0, dots / denom)
                sim = np.round((raw + 1.0) / 2.0, ROUND_DIGITS)
                ids = g[id_col].to_numpy()
                order = np.lexsort((ids, -sim))[: min(k, len(ids))]
                recs.extend(
                    (int(qid_val), int(ids[i]), float(sim[i])) for i in order
                )
            yield pd.DataFrame(
                recs, columns=[query_id_col, id_col, "cosine"]
            )

    partial = cand.mapInPandas(part, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def retrain_federated_pq_tenants(
    spark,
    prefix: str,
    tenant_corpus: DataFrame,
    new_codebooks_by: dict,
    partition_col: str = "source",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    n_buckets: int = 8,
    err_col: str | None = None,
) -> str:
    """Single-collection quantizer retrain for the multi-tenant PQ
    index — `retrain_federated_ivf_tenants`' shape for the compressed
    family: swap ONLY the flagged collection(s)' codebook rows, then
    re-encode ONLY their vectors through the partitioned upsert —
    every other collection's codebooks, codes, and partition files
    stay byte-identical (tested). ``new_codebooks_by`` ({tenant:
    Codebooks}) defines which tenants retrain; ``tenant_corpus`` is
    those collections' FULL current corpus. The fixed-codebooks
    invariant the incremental encode relies on is intentionally
    broken HERE AND ONLY HERE, for the tenants being retrained."""
    from embeddingsearch_spark.sink import PartitionOverwriteSink
    from embeddingsearch_spark.storage import drop_table

    cbs = spark.table(f"{prefix}_codebooks").localCheckpoint(
        eager=True
    )
    tenants = sorted(str(t) for t in new_codebooks_by)
    rows = [
        (str(t), m, j, [float(x) for x in c])
        for t, cb in sorted(new_codebooks_by.items())
        for m, sub in enumerate(cb)
        for j, c in enumerate(sub)
    ]
    add = spark.createDataFrame(
        rows,
        f"{partition_col} string, m int, code int, "
        "centroid array<double>",
    )
    merged = cbs.filter(
        ~F.col(partition_col).isin(tenants)
    ).unionByName(add.select(*cbs.columns)).localCheckpoint(eager=True)
    drop_table(spark, f"{prefix}_codebooks")
    merged.write.saveAsTable(f"{prefix}_codebooks")
    new_codes = encode_pq_federated(
        tenant_corpus, new_codebooks_by, partition_col=partition_col,
        id_col=id_col, vec_col=vec_col, codes_col=codes_col,
        err_col=err_col,
    ).select(
        id_col, partition_col, codes_col,
        *([err_col] if err_col else []),
    )
    PartitionOverwriteSink(partition_col).delete_insert(
        spark, f"{prefix}_codes", new_codes, [id_col],
        delete_keys=tenant_corpus.select(id_col).distinct(),
        bucket_cols=[id_col], n_buckets=n_buckets,
        partition_cols=[partition_col],
    )
    return f"{prefix}_codes"


def pq_federated_serve_aliased(
    spark,
    alias: str,
    queries: DataFrame,
    route: DataFrame,
    k: int = 10,
    partition_col: str = "source",
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    emb: DataFrame | None = None,
    config: str | None = None,
) -> DataFrame:
    """Per-tenant blue/green for the compressed serve: each routed
    collection's ADC runs against the codes+codebooks GENERATION its
    `set_tenant_index_alias` row points at (a re-quantized tenant
    flips to its new codebooks while others keep their current ones).
    Grouping via `storage.federated_serve_aliased` — the same helper
    as the IVF and BM25 aliased serves.

    ``config="auto"`` runs each generation's misses through the
    REFINED serve at the `pq_config_for` factor derived from that
    generation's LIVE per-tenant code counts (requires ``emb``) — the
    production path picks up the rule instead of a hand-carried
    k/factor pair."""
    from embeddingsearch_spark.storage import federated_serve_aliased

    if config not in (None, "auto", "calibrated", "stored"):
        raise ValueError(
            f"unknown config {config!r} "
            "(use 'auto', 'calibrated', or 'stored')"
        )
    if config in ("auto", "calibrated", "stored") and emb is None:
        raise ValueError(
            f'config="{config}" refines by exact re-rank — pass emb'
        )

    def serve(prefix, q, r):
        if config not in ("auto", "calibrated", "stored"):
            return pq_federated_from_index(
                spark, prefix, q, r, k=k, partition_col=partition_col,
                id_col=id_col, codes_col=codes_col, vec_col=vec_col,
                query_id_col=query_id_col,
            )
        qrow = q.select(vec_col).head()
        factor_by = {}
        if qrow is None:
            pass  # empty query group: correctly-schemaed ADC serve
        elif config == "stored":
            # each GENERATION reads its own persisted calibration —
            # a retrain→recalibrate→flip atomically switches widths
            from embeddingsearch_spark.operators.calibration import (
                pq_stored_factor,
            )

            factor_by = pq_stored_factor(
                spark, prefix, q, partition_col, vec_col
            )
        elif config == "calibrated":
            # measured factors per GENERATION on its own query group
            # (rule as the fallback)
            factor_by = pq_calibrated_factor(
                spark, prefix, emb, q, r, k=k,
                partition_col=partition_col, id_col=id_col,
                codes_col=codes_col, vec_col=vec_col,
                query_id_col=query_id_col,
            )
        else:
            dim = len(qrow[0])
            factor_by = {
                str(row[0]): pq_config_for(int(row[1]), dim)[
                    "refine_factor"
                ]
                for row in spark.table(f"{prefix}_codes")
                .groupBy(partition_col)
                .count()
                .collect()
            }  # bounded: one row per collection in this generation
        groups: dict = {}
        for t, f_val in factor_by.items():
            groups.setdefault(f_val, []).append(t)
        if not groups:
            return pq_federated_from_index(
                spark, prefix, q, r, k=k, partition_col=partition_col,
                id_col=id_col, codes_col=codes_col, vec_col=vec_col,
                query_id_col=query_id_col,
            )
        out = None
        for f_val, tenants in sorted(groups.items()):
            rr = r.filter(F.col(partition_col).isin(tenants))
            qq = q.join(
                rr.select(query_id_col).distinct(), query_id_col
            )
            part = pq_federated_refined(
                spark, prefix, emb, qq, rr, k=k,
                refine_factor=f_val, partition_col=partition_col,
                id_col=id_col, codes_col=codes_col, vec_col=vec_col,
                query_id_col=query_id_col,
            )
            out = part if out is None else out.unionByName(part)
        return out

    return federated_serve_aliased(
        spark, alias, queries, route, serve,
        partition_col=partition_col, query_id_col=query_id_col,
    )
