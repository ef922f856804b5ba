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


def _strata_case(strata_col: str, values: Mapping[str, int], default: int):
    expr = F.lit(default)
    for name, v in values.items():
        expr = F.when(F.col(strata_col) == name, F.lit(v)).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its hash
    bucket falls under its stratum's rate (rates in [0, 1]). The rate map
    inlines as a CASE literal — no join, no shuffle; the filter fuses into
    the scan. Same-id rows keep/drop together across runs and engines."""
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    cuts = {k: int(round(r * N_BUCKETS)) for k, r in rates.items()}
    cut = _strata_case(strata_col, cuts, int(round(default_rate * N_BUCKETS)))
    return df.filter(split_bucket(F.col(id_col), salt) < cut)


def stratified_fixed_n(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n_per_stratum: int,
    salt: str = "sample",
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample (eval/holdout set
    construction): rows ranked inside each stratum by md5(salt, id) —
    a reproducible pseudo-random order any engine can replay — and the
    first N kept. One exchange on the stratum key; strata are bounded
    in number, so the window never single-partitions the data. For
    fraction-based thinning use `stratified_sample` (zero-shuffle)."""
    from pyspark.sql import Window

    hk = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(hk.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: Mapping[str, float],
    default_weight: float = 0.0,
    salt: str = "mix",
    copy_col: str = "copy",
) -> DataFrame:
    """Corpus mixing with weights as EXPECTED COPIES per row — the
    epoch-mixing primitive (e.g. wiki×2.5, crawl×0.3): floor(w) full
    copies plus one more iff the row's hash bucket is under frac(w).
    Deterministic, engine-reproducible, and exact in expectation per
    stratum. Emits ``copy_col`` (1..n) so downstream shuffling can spread
    copies. Scan-stage explode — rows with 0 copies drop without a
    shuffle."""
    w10k = {k: int(round(w * N_BUCKETS)) for k, w in weights.items()}
    for name, w in w10k.items():
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0")
    wcol = _strata_case(
        strata_col, w10k, int(round(default_weight * N_BUCKETS))
    )
    bucket = split_bucket(F.col(id_col), salt)
    copies = F.floor(wcol / N_BUCKETS).cast("int") + F.when(
        bucket < wcol % N_BUCKETS, 1
    ).otherwise(0)
    # sequence(1, 0) would count DOWN in Spark — guard empty explicitly
    arr = F.when(
        copies >= 1, F.sequence(F.lit(1), copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(arr))


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int = 0,
    n_shards: int = 256,
    salt: str = "shuffle",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for a training epoch: every row gets
    ``(shard, pos)`` from md5(salt, epoch, id) — a fresh permutation per
    epoch, reproducible on any engine and independent of partition
    layout (unlike orderBy(rand())). The dataloader reads shards in
    shard/pos order.

    Plan: ONE hash exchange on the shard + a per-shard sort for the
    row_number — exactly the shape a sharded training-set writer needs
    (repartition(n_shards) + sortWithinPartitions). No global sort: the
    permutation's randomness lives in the hash, so shards don't need to
    be globally ordered against each other."""
    h = F.md5(
        F.concat_ws(
            "_",
            F.lit(salt),
            F.lit(int(epoch)).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("_h")
    )


def mixture_weights_temperature(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled corpus mixture weights (the multilingual-LM
    sampling rule, mT5/UNIMAX family): p_g ∝ n_g^alpha. alpha=1
    reproduces natural proportions; alpha→0 approaches uniform; 0.3 is
    the common low-resource-boosting setting. The output feeds
    ``weighted_mix`` (weight per row = upsample_factor).

    One corpus-sized map-side-combinable count per group, then all math
    on the tiny per-group table with the two scalars (Z, N) broadcast —
    nothing corpus-sized shuffles twice.

    Returns (group, n_docs, weight, upsample_factor) where
    upsample_factor = weight * N_total / n_g (expected copies per row of
    group g under the target distribution).
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.pow("n_docs", F.lit(alpha))).alias("_z"),
        F.sum("n_docs").alias("_n"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.col("n_docs").cast("bigint").alias("n_docs"),
            (F.pow("n_docs", F.lit(alpha)) / F.col("_z")).alias("weight"),
            (
                F.pow("n_docs", F.lit(alpha))
                / F.col("_z")
                * F.col("_n")
                / F.col("n_docs")
            ).alias("upsample_factor"),
        )
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    size_col: str | None = None,
    budget: float | None = None,
    budget_frac: float = 0.5,
    max_epochs: float = 3.0,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151 —
    public): split a total token budget across groups (languages/sources)
    as UNIFORMLY as possible subject to a per-group repeat cap of
    ``max_epochs`` epochs — small groups get all their data up to the
    cap, the remainder is shared equally among groups big enough to
    absorb it. The sequential waterfilling of the paper has a closed
    form: find the water level t with Σ min(cap_g, t) = budget, then
    alloc_g = min(cap_g, t) — expressible as prefix sums over the
    size-sorted group table, no iteration.

    ``size_col=None`` counts rows; otherwise sizes are summed (pass
    per-doc token counts for token budgets). ``budget=None`` uses
    ``budget_frac`` × total size. Returns
    ``(group, n, cap, alloc, epochs)`` with epochs = alloc / n ≤
    max_epochs.

    Scale: one corpus-sized map-side-combinable groupBy; everything
    after runs on the group table — dozens to hundreds of rows, so its
    single-partition prefix-sum window is bounded by construction (the
    group count, never the corpus).
    """
    from pyspark.sql import Window

    size = F.lit(1) if size_col is None else F.col(size_col)
    counts = df.groupBy(group_col).agg(
        F.sum(size).cast("double").alias("n")
    )
    if budget is None:
        total = counts.agg(F.sum("n")).collect()[0][0] or 0.0
        budget = budget_frac * float(total)
    counts = counts.withColumn("cap", F.col("n") * F.lit(max_epochs))
    w = Window.orderBy(F.col("cap").asc(), F.col(group_col).asc())
    n_groups = counts.agg(F.count(F.lit(1)).alias("_L"))
    staged = counts.select(
        group_col,
        "n",
        "cap",
        F.row_number().over(w).alias("_i"),
        F.sum("cap").over(w).alias("_prefix"),  # includes own cap
    ).crossJoin(F.broadcast(n_groups))
    b = F.lit(float(budget))
    # group i is fully capped iff the water level clears its cap:
    # prefix_{i-1} + cap_i * (L - i + 1) <= B
    feasible = (
        F.col("_prefix") - F.col("cap")
        + F.col("cap") * (F.col("_L") - F.col("_i") + 1)
    ) <= b
    lvl = staged.agg(
        F.max(F.when(feasible, F.col("_i"))).alias("_istar"),
        F.max(F.when(feasible, F.col("_prefix"))).alias("_pstar"),
    ).select(
        F.coalesce("_istar", F.lit(0)).alias("_istar"),
        F.coalesce("_pstar", F.lit(0.0)).alias("_pstar"),
    )
    out = staged.crossJoin(F.broadcast(lvl)).withColumn(
        "_t",
        F.when(
            F.col("_istar") < F.col("_L"),
            (b - F.col("_pstar")) / (F.col("_L") - F.col("_istar")),
        ),
    )
    alloc = F.when(
        F.col("_t").isNull() | (F.col("cap") <= F.col("_t")), F.col("cap")
    ).otherwise(F.col("_t"))
    return out.select(
        group_col,
        "n",
        "cap",
        alloc.alias("alloc"),
        F.when(F.col("n") > 0, alloc / F.col("n")).alias("epochs"),
    )
