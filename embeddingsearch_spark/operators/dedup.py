"""Deduplication operators for the LLM-data-pipeline surface
(BASELINE.json north star): exact, MinHash+LSH near-dup, SimHash,
n-gram Jaccard — all as shuffle-conscious DataFrame pipelines.

Scale notes (100 TB):
  - exact dedup is one hash-partitioned groupBy on the fingerprint — the
    minimum possible shuffle (the fingerprint is computed in the scan stage);
  - MinHash signatures are computed scan-side (K static min-aggregates over
    exploded shingles, partial-agg'd map-side); LSH banding turns the
    quadratic all-pairs problem into an equi-join on (band, band_hash) —
    only bucket collisions shuffle;
  - candidate verification joins exploded distinct shingles — bounded by
    candidate count, not corpus size;
  - signature hashes default to sha256 windows so independent engines (the
    DuckDB oracle) reproduce signatures bit-for-bit; an xxhash64 fast path
    (~1.7× at 1M docs) is available where cross-engine reproducibility
    isn't needed — exact Jaccard verification makes the final pairs
    hash-independent either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import (
    fingerprint,
    tokens,
    word_shingles_of,
)


def _hash60(c: Column) -> Column:
    """First 60 bits of sha256 as a bigint (engine-portable hash)."""
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("bigint")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup over normalized text: every doc mapped to
    its group's canonical (min) id + group size."""
    fp = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        fp.join(groups, "fp")
        .select(
            id_col,
            "canonical_id",
            "group_size",
            (F.col("group_size") > 1).alias("is_duplicate"),
        )
    )


def incremental_new_docs(
    incoming: DataFrame,
    indexed: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Batch-ingest dedup gate: rows of ``incoming`` whose normalized
    content fingerprint is NOT already present in ``indexed`` — the
    first check every re-crawl/re-ingest runs before embedding anything.

    One fingerprint-keyed left_anti join. Both fingerprints are computed
    scan-side; the join shuffles only ``(id, fp)`` pairs, never text.
    Typical shape at scale: indexed corpus huge, incoming batch small —
    AQE converts to a broadcast of the incoming side's build table; if
    the batch is large too, it's a plain co-partitioned shuffle join with
    no skew (fingerprints are uniform sha256)."""
    inc = incoming.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    idx = indexed.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    return inc.join(idx, "fp", "left_anti")


def _bloom_sizing(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits and k hashes for n items at fpp."""
    import math

    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)  # whole 64-bit words
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 8)


def bloom_words(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """Distributed Bloom-filter build as a DataFrame: k xxhash64 seeds per
    key -> bit positions in an m-bit space -> packed into 64-bit words via
    bit_or aggregation. Result is ``(w, bits)`` with at most m/64 rows —
    a compressed, broadcastable representation (~16 bytes/word) whose
    build is one map-side-combinable groupBy; the corpus itself never
    moves. Unlike df.stat.bloomFilter, the result stays a DataFrame usable
    in JVM-side joins (no driver object, no Python UDF at probe time)."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m_bits))
                    for s in range(k)
                ]
            )
        ).alias("pos")
    )
    return pos.select(
        F.expr("pos div 64").alias("w"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("bits"))


def build_bloom_index(
    indexed: DataFrame,
    text_col: str,
    n_indexed: int | None = None,
    fpp: float = 0.01,
) -> tuple[DataFrame, int, int]:
    """Build-once Bloom index over an indexed corpus's fingerprints:
    returns (words, m_bits, k). Persist/cache ``words`` and hand it to
    `incremental_new_docs_bloom` for every subsequent ingest batch — the
    build scans the corpus ONCE, while the plain anti-join re-shuffles
    the full indexed fingerprint set per batch. That amortization (plus
    bits-not-strings transfer) is where the Bloom path wins; a single
    cold batch pays build + probe and measures slower at small scale
    (BASELINE.md scale-probe table)."""
    if n_indexed is None:
        n_indexed = indexed.count()
    m, k = _bloom_sizing(n_indexed, fpp)
    idx = indexed.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    return bloom_words(idx, "fp", m, k), m, k


def incremental_new_docs_bloom(
    incoming: DataFrame,
    indexed: DataFrame,
    id_col: str,
    text_col: str,
    n_indexed: int | None = None,
    fpp: float = 0.01,
    bloom: tuple[DataFrame, int, int] | None = None,
) -> DataFrame:
    """`incremental_new_docs` with a Bloom prefilter — the 100 TB shape.

    The plain gate anti-joins the full incoming batch against the full
    indexed fingerprint set: at 10^9+ indexed docs that join shuffles both
    sides. Here the indexed set is first compressed to an m-bit Bloom
    bitmap (~1.2 GB at 10^9 docs / 1% fpp vs ~45 GB of fingerprint
    strings), broadcast as a (word, bits) table, and probed map-side:

      definite-new rows (any of the k probed bits clear) pass through with
      NO shuffle against the indexed corpus; only Bloom hits — true dups
      plus ~fpp false positives — reach the exact fingerprint anti-join.

    False positives are removed by that exact verify, and the gate
    decision (per distinct fingerprint) is joined back onto the incoming
    rows, so the result is row-identical to `incremental_new_docs` —
    including batches where the same (id, text) appears more than once
    (the driver gate runs both against the same oracle). At a re-crawl's
    typical 90%+ new-content ratio this cuts the anti-join's probe
    volume ~10x and its build side ships as bits, not strings.

    Pass a persisted `build_bloom_index` result as ``bloom`` to amortize
    the build across ingest batches — the dominant win at scale.
    CONTRACT: ``bloom`` must cover every fingerprint in ``indexed``. A
    bitmap built before docs were added to ``indexed`` misses their
    fingerprints, so matching incoming rows would be classified
    definite-new and skip the exact verify — silently returning dups as
    new. After each accepted batch is indexed, OR its fingerprints into
    the bitmap with `augment_bloom_index` (one scan of the BATCH, not
    the corpus) before reusing it."""
    idx = indexed.select(
        fingerprint(F.col(text_col)).alias("fp")
    ).distinct()
    if bloom is not None:
        words, m, k = bloom
    else:
        words, m, k = build_bloom_index(indexed, text_col, n_indexed, fpp)

    inc = incoming.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    probe = inc.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("fp"), F.lit(s)), F.lit(m))
                    for s in range(k)
                ]
            )
        ).alias("pos"),
    ).withColumn("w", F.expr("pos div 64"))
    # bit clear (or word absent entirely) => the key is DEFINITELY not
    # indexed; all k bits set => Bloom hit, needs exact verification
    bit_set = (
        F.col("bits").bitwiseAND(
            F.expr("shiftleft(1L, cast(pos % 64 as int))")
        )
        != 0
    )
    flags = (
        probe.join(F.broadcast(words), "w", "left")
        .withColumn("bit_set", F.coalesce(bit_set, F.lit(False)))
        .groupBy(id_col, "fp")
        .agg(F.min("bit_set").alias("might_contain"))
    )
    definite_new = flags.filter(~F.col("might_contain")).select(id_col, "fp")
    candidates = flags.filter(F.col("might_contain")).select(id_col, "fp")
    verified_new = candidates.join(idx, "fp", "left_anti")
    # Decisions are per distinct (id, fp); semi-join back onto the raw
    # incoming rows so duplicate rows within one batch survive with
    # their multiplicity — exactly incremental_new_docs' row contract.
    new_keys = definite_new.unionByName(verified_new)
    return inc.join(new_keys, [id_col, "fp"], "left_semi")


def merge_bloom_words(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two (w, bits) bitmaps built with the SAME (m_bits, k)."""
    return (
        a.unionByName(b).groupBy("w").agg(F.bit_or("bits").alias("bits"))
    )


def augment_bloom_index(
    bloom: tuple[DataFrame, int, int], accepted: DataFrame, text_col: str
) -> tuple[DataFrame, int, int]:
    """OR an accepted batch's fingerprints into a persisted Bloom index
    (the maintenance half of `incremental_new_docs_bloom`'s coverage
    contract): scans only the batch, returns the refreshed
    (words, m_bits, k)."""
    words, m, k = bloom
    batch_words = bloom_words(
        accepted.select(fingerprint(F.col(text_col)).alias("fp")).distinct(),
        "fp",
        m,
        k,
    )
    return merge_bloom_words(words, batch_words), m, k


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "sha256",
) -> DataFrame:
    """K MinHash values per doc over distinct word n-gram shingles.

    hash_fn="sha256" (default): sig_i = min of the i-th 32-bit window of
    sha256(shingle). One sha256 per shingle serves all K hash functions
    (disjoint 8-hex-char windows are independent 32-bit hashes) — and any
    engine can reproduce the signatures bit-for-bit (the DuckDB oracle
    does). Requires k <= 8 (64 hex chars / 8).

    hash_fn="xxhash64": sig_i = min of xxhash64(seed=i, shingle) — ~1.7×
    faster at 1M docs (BASELINE.md; the signature stage is hash-bound).
    Spark-specific signatures, so no cross-engine oracle; the downstream
    LSH pipeline still ends in EXACT Jaccard verification, so final
    near-dup pairs remain hash-independent (recall shifts only).
    """
    # tokens pre-projected: inlining them makes the shingle transform
    # re-run split(trim(text)) once per shingle index (see word_shingles_of)
    sh = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(word_shingles_of(F.col("_toks"), shingle_n)).alias(
            "shingle"
        ),
    )
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(k)
        ]
    elif hash_fn == "sha256":
        if k > 8:
            raise ValueError(
                "k <= 8: one sha256 digest provides 8 32-bit windows"
            )
        sh = sh.withColumn("_digest", F.sha2(F.col("shingle"), 256))
        # Fixed-width lowercase hex orders lexicographically == numerically,
        # so the min can run on the 8-char hex window directly; hex→bigint
        # then converts only the k winners per doc, not every shingle row.
        aggs = [
            F.conv(F.min(F.substring("_digest", 8 * i + 1, 8)), 16, 10)
            .cast("bigint")
            .alias(f"mh{i}")
            for i in range(k)
        ]
    else:
        raise ValueError("hash_fn must be 'sha256' or 'xxhash64'")
    return sh.groupBy(id_col).agg(*aggs)


def minhash_config_for(
    threshold: float, k: int = 128, recall: float = 0.9
) -> tuple[int, int]:
    """Size (k, bands) for a target Jaccard ``threshold`` — the MinHash
    twin of :func:`ann.srp_config_for`. A (b bands × r rows) scheme
    collides a pair of Jaccard s with prob 1 - (1 - s^r)^b; pick, among
    the divisor splits of ``k``, the most selective r (fewest false
    candidates) that still catches a true pair at ``threshold`` with
    prob ≥ ``recall``. The suite's pinned 8×4 stays for the oracled query
    (tiny corpus, weak near-dup band); this is the scale default — call
    it with the corpus-appropriate k (more hashes → sharper s-curve →
    fewer candidate verifications, THE cost at 100 TB).
    Returns (k_used, bands)."""
    import math

    t = min(1.0 - 1e-9, max(1e-9, threshold))
    best = None
    for bands in range(1, k + 1):
        if k % bands:
            continue
        rows = k // bands
        p = 1.0 - (1.0 - t**rows) ** bands
        if p >= recall:
            # feasible; prefer the largest rows (most selective bands)
            if best is None or rows > best[1]:
                best = (bands, rows)
    if best is None:
        # threshold too high for k hashes at this recall — fall back to
        # the sharpest feasible curve (max bands = max collision prob)
        best = (k, 1)
    return best[0] * best[1], best[0]


def lsh_bands(
    sigs: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """(id, band, bh): the K signature values grouped into ``bands`` band
    hashes — the LSH bucket table. Persist the indexed corpus's band
    table once and every ingest batch joins against it (the near-dup
    analogue of `build_bloom_index`)."""
    rows = k // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.sha2(F.concat_ws("_", *parts), 256).alias("bh"),
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bh")


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Band the K signature values into ``bands`` groups; docs colliding on
    any full band become candidate pairs (a < b)."""
    banded = lsh_bands(sigs, id_col, k, bands)
    left = banded.withColumnRenamed(id_col, "id_a")
    right = banded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs via distinct-shingle join."""
    sh = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        word_shingles_of(F.col("_toks"), shingle_n).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    return (
        j.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def near_duplicates_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "sha256",
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → banded candidate
    pairs → exact Jaccard verification ≥ threshold. The verify stage makes
    the output exact for any ``hash_fn`` (see `minhash_signatures`)."""
    sigs = minhash_signatures(df, id_col, text_col, k, shingle_n, hash_fn)
    pairs = lsh_candidate_pairs(sigs, id_col, k, bands)
    return jaccard_verify(df, pairs, id_col, text_col, shingle_n, threshold)


def incremental_neardup(
    incoming: DataFrame,
    indexed: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "sha256",
    exact_first: bool = False,
) -> DataFrame:
    """NEAR-dup ingest gate — the fuzzy complement of
    `incremental_new_docs`: per incoming doc, its best Jaccard-verified
    match in the INDEXED corpus, or nothing -> is_new. A re-crawl's
    lightly-edited re-deliveries (timestamps, footers) slip through the
    exact-fingerprint gate and land here.

    Shape: band the incoming batch's MinHash signatures and equi-join
    the indexed corpus's band table (persist it across batches via
    `lsh_bands` — only new bands are computed per batch); only bucket
    collisions get the exact cross-Jaccard verify; best match = highest
    jaccard, ties -> smallest indexed id. Returns
    ``(id, match_id, jaccard, is_new)`` for every incoming row.

    ``exact_first=True`` resolves byte-identical re-deliveries with a
    fingerprint join (match_id = the smallest indexed id with the same
    fingerprint, jaccard 1.0) so they never reach signature/verify. It
    pays one fingerprint aggregation over the indexed side, so it wins
    only when the batch is dominated by EXACT dups; when most of the
    batch still needs LSH (the scale probe's pathological data, where
    even "fresh" docs near-match a 17-replica original) it measured
    neutral-to-slower (BASELINE.md) — measure on your dup mix. Tie
    selection can differ from the pure mode only for docs whose
    distinct-shingle SET equals a non-identical doc's (both orders are
    valid best matches at jaccard 1.0)."""
    if exact_first:
        inc_fp = incoming.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
        )
        idx_fp = (
            indexed.select(
                fingerprint(F.col(text_col)).alias("_fp"),
                F.col(id_col).alias("_idx_id"),
            )
            .groupBy("_fp")
            .agg(F.min("_idx_id").alias("_idx_id"))
        )
        exact_hits = inc_fp.join(idx_fp, "_fp").select(
            id_col,
            F.col("_idx_id").alias("match_id"),
            F.lit(1.0).alias("jaccard"),
            F.lit(False).alias("is_new"),
        )
        rest = incoming.join(
            exact_hits.select(id_col), id_col, "left_anti"
        )
        fuzzy = incremental_neardup(
            rest, indexed, id_col, text_col, k, bands, shingle_n,
            threshold, hash_fn, exact_first=False,
        )
        return exact_hits.unionByName(fuzzy)
    sig_in = minhash_signatures(incoming, id_col, text_col, k, shingle_n, hash_fn)
    sig_ix = minhash_signatures(indexed, id_col, text_col, k, shingle_n, hash_fn)
    b_in = lsh_bands(sig_in, id_col, k, bands).withColumnRenamed(
        id_col, "_inc_id"
    )
    b_ix = lsh_bands(sig_ix, id_col, k, bands).withColumnRenamed(
        id_col, "_idx_id"
    )
    cand = (
        b_in.join(b_ix, ["band", "bh"]).select("_inc_id", "_idx_id").distinct()
    )

    def shingles(df):
        return df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_toks")
        ).select(
            F.col(id_col),
            word_shingles_of(F.col("_toks"), shingle_n).alias("sh"),
        )

    a = shingles(incoming).select(
        F.col(id_col).alias("_inc_id"), F.col("sh").alias("sh_a")
    )
    b = shingles(indexed).select(
        F.col(id_col).alias("_idx_id"), F.col("sh").alias("sh_b")
    )
    j = cand.join(a, "_inc_id").join(b, "_idx_id")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    verified = j.select(
        "_inc_id", "_idx_id", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
    w = Window.partitionBy("_inc_id").orderBy(
        F.col("jaccard").desc(), F.col("_idx_id").asc()
    )
    best = (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_inc_id", "_idx_id", "jaccard")
    )
    return (
        incoming.select(F.col(id_col))
        .join(best, F.col(id_col) == F.col("_inc_id"), "left_outer")
        .select(
            id_col,
            F.col("_idx_id").alias("match_id"),
            "jaccard",
            F.col("_idx_id").isNull().alias("is_new"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint over whitespace tokens: bit j is set when the
    sum over tokens of ±1 (sign = bit j of the token's hash60) is >= 0.
    Near-dup docs differ in few bits (compare with hamming distance).

    Perf: the token hash is PROJECTED once per token row before the
    aggregation — aggregate expressions don't share subexpressions, so
    referencing the conv() inside each of the ``bits`` sums would hash
    every token ``bits`` times. And since only the low ``bits`` bits of
    the 60-bit hash are used, the hex→bigint conversion covers just the
    ceil(bits/4) hex chars that carry them (low bits of the 15-char
    window == the value of its last chars, so sha256-derived signatures
    stay bit-identical to the full-width definition the oracle uses).
    """
    if bits > 60:
        raise ValueError("bits <= 60: hash60 provides 60 sign bits")
    nhex = (bits + 3) // 4
    # last nhex chars of the 15-char window: positions 16-nhex .. 15
    h = F.conv(
        F.substring(F.sha2(F.col("tok"), 256), 16 - nhex, nhex), 16, 10
    ).cast("bigint")
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sig = F.lit(0).cast("bigint")
    for j in range(bits):
        sig = sig + F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(0)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a duplicate-pair graph → ``(id, cluster_id)``
    where cluster_id is the minimum node id reachable from ``id``. This is
    the grouping step real dedup needs after pair generation: keep ONE
    representative per component, not per pair (pairwise keep-min drops too
    much when a < b and b < c but a ~ c was never a candidate pair).

    Min-label propagation WITH pointer jumping: every round each node
    takes the min of its own label and its neighbors' labels (one
    hash-partitioned groupBy + join on the node id), then shortcuts
    label := label(label) (one more id-keyed join). The shortcut doubles
    the propagation distance per round, so convergence is O(log diameter)
    — a chain of 10^6 nodes converges in ~20 rounds where plain
    propagation would need 10^6 (and would silently return unmerged
    components at any round cap). Near-dup graphs are unions of small
    dense cliques that converge in 2-3 rounds either way; the shortcut is
    what makes pathological shapes (URL redirect chains, transitive
    similarity paths) safe at scale. Each round's plan is cut with
    localCheckpoint so lineage stays flat; the driver sees one scalar
    (changed-count) per round — no per-node collect.

    Reference parity: the reference dedups by exact hash equality only
    (SearchdomainHelper change detection); component-grouped near-dedup is
    part of the training-data-pipeline surface beyond it.
    """
    e = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    edges = (
        e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        # lazy: round 1's convergence count materializes pair generation
        # exactly once; every later round reuses the checkpointed blocks
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(max_iters):
        neigh_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("dst", "id")
        )
        relaxed = labels.join(neigh_min, "id", "left_outer").select(
            "id",
            F.col("label").alias("_prev"),
            F.least(
                F.col("label"), F.coalesce("nlabel", "label")
            ).alias("label"),
        )
        # pointer jumping: label := label(label). label(x) <= x for every
        # node, so the shortcut only ever lowers labels, and it doubles
        # the distance a min has travelled — O(log diameter) rounds.
        shortcut = relaxed.select(
            F.col("id").alias("_lid"), F.col("label").alias("_llabel")
        )
        stepped = (
            relaxed.join(
                shortcut, relaxed["label"] == shortcut["_lid"], "left_outer"
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("_llabel", "label")
                ).alias("label"),
                "_prev",
            )
            .select(
                "id",
                "label",
                (F.col("label") < F.col("_prev")).alias("_changed"),
            )
            # lazy: the convergence count below materializes the
            # checkpoint, so each round is ONE job, not two
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("_changed")).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def neardup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dedup decision per document: MinHash+LSH candidate pairs →
    exact-Jaccard verify → connected components → per-doc
    ``(cluster_id, cluster_size, is_representative)``. Downstream keeps
    ``is_representative`` rows only. Docs with no near-dup are their own
    singleton cluster (left join + coalesce, no shuffle of the full corpus
    beyond one id-keyed join)."""
    prs = near_duplicates_minhash(
        df, id_col, text_col,
        k=k, bands=bands, shingle_n=shingle_n, threshold=threshold,
    )
    comp = connected_components(prs, "id_a", "id_b").withColumnRenamed(
        "id", id_col
    )
    asg = (
        df.select(id_col)
        .join(comp, id_col, "left_outer")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col))
            .cast("long")
            .alias("cluster_id"),
        )
    )
    sizes = asg.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return asg.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
    )


def select_representatives(
    assignments: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """Quality-aware keep decision per near-dup cluster: real pipelines
    keep the BEST document of each duplicate cluster, not the lowest id
    (Lee et al. keep-longest; quality-classifier scores work too).
    ``assignments`` is `connected_components`/`neardup_clusters` output
    (id, cluster_id); quality defaults to text length. Returns
    ``(id, cluster_id, rep_id, keep)`` — one window rank over the
    cluster key, ties -> smallest id."""
    q = (
        F.length(F.col(text_col))
        if quality_col is None
        else F.col(quality_col)
    )
    joined = assignments.select(id_col, "cluster_id").join(
        docs.select(F.col(id_col), q.alias("_q")), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col(id_col).alias("rep_id"))
    )
    return (
        assignments.select(id_col, "cluster_id")
        .join(best, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            "rep_id",
            (F.col(id_col) == F.col("rep_id")).alias("keep"),
        )
    )


def duplicate_span_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-document duplicated-span coverage (the exact-substring dedup
    metric of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better" — arXiv:2107.06499): for each doc, the fraction of its
    word ``n``-gram positions whose gram also occurs in ANOTHER document.

    Plan: grams are keyed by a fixed-width md5 prefix (16 hex chars ≈ 64
    bits — engine-portable, and at 100 TB a fixed 16-byte key shuffles far
    less than variable-length gram strings). The span stream is
    pre-aggregated to one row per (doc, key) so the shared-key detection
    is a plain partial-agg'd count (skew-safe for boilerplate grams that
    occur in millions of docs — no count_distinct expansion), and the
    shared set carries bare keys only, small enough for AQE to broadcast
    the semi-join (the per-doc occurrence table then never shuffles by
    gram). Per-doc totals come from the token count scan-side. The (doc,
    key) aggregate feeds two consumers and is recomputed rather than
    persisted: at corpus scale, re-running a scan-stage explode is cheaper
    and safer than materializing a corpus-sized intermediate. Docs shorter
    than ``n`` tokens have zero spans and fraction 0.0.

    Returns (id, n_spans, n_dup_spans, dup_fraction).
    """
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    idx = F.when(
        F.size("_toks") >= n,
        F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    spans = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.substring(
                    F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i, n))),
                    1,
                    16,
                ),
            )
        ).alias("key"),
    )
    occ = spans.groupBy(id_col, "key").agg(F.count(F.lit(1)).alias("occ"))
    shared = (
        occ.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("key")
    )
    dup = (
        occ.join(shared, "key")
        .groupBy(id_col)
        .agg(F.sum("occ").alias("n_dup_spans"))
    )
    totals = toks.select(
        F.col(id_col),
        F.greatest(F.size("_toks") - (n - 1), F.lit(0))
        .cast("bigint")
        .alias("n_spans"),
    )
    return (
        totals.join(dup, id_col, "left_outer")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias(
                "n_dup_spans"
            ),
            F.when(F.col("n_spans") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans")
            )
            .alias("dup_fraction"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact-substring dedup REMOVAL (the Lee et al. 2022 'Deduplicating
    Training Data' cleanup): every word ``n``-gram occurring more than
    once in the corpus keeps only its canonical occurrence (lowest
    (doc, pos)); all other occurrences have their token range cut from
    the document. Overlapping cut ranges are merged per doc before
    removal, and surviving tokens are re-joined in original order.

    Plan shape (what survives 100 TB):
      1. span keys (md5-prefix, fixed width) explode scan-side — one row
         per token position, text itself never leaves the scan;
      2. ONE shuffle by key computes (occurrences, canonical) per key —
         canonical as min(doc * 2^POS_BITS + pos), a single primitive
         min, no struct compare;
      3. only duplicated occurrences become (doc, start, end) ranges;
         gaps-and-islands merging per doc is a window over those ranges
         (range volume = dup occurrences, not corpus size);
      4. islands are collected per doc (array of small structs) and
         joined back to the docs table, where surviving tokens are
         rebuilt in ONE scan-side array expression — the cleaned text is
         never shuffled token-by-token.

    Single-pass semantics: grams created by the removal's splice points
    are not re-examined (matches the paper's one-shot removal).
    Packed-key bounds: positions use POS_BITS=20 (docs beyond 1M tokens
    must be chunked upstream — the winnow module's contract) and ids
    must stay under 2^43 so id * 2^POS_BITS + pos fits a bigint.
    Returns (id, n_tokens, n_removed, text_clean) for EVERY input doc.
    """
    from pyspark.sql.window import Window

    from embeddingsearch_spark.operators.winnow import POS_BITS

    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    idx = F.when(
        F.size("_toks") >= n,
        F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    spans = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.substring(
                        F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i, n))),
                        1,
                        16,
                    ).alias("key"),
                ),
            )
        ).alias("sp"),
    ).select(id_col, F.col("sp.pos").alias("pos"), F.col("sp.key").alias("key"))
    packed = F.col(id_col) * F.lit(1 << POS_BITS) + F.col("pos")
    stats = (
        spans.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.col(id_col) * F.lit(1 << POS_BITS) + F.col("pos")).alias(
                "canon"
            ),
        )
        .filter(F.col("cnt") >= 2)
    )
    cuts = (
        spans.join(stats, "key")
        .filter(packed != F.col("canon"))
        .select(
            F.col(id_col),
            F.col("pos").cast("bigint").alias("s"),
            (F.col("pos") + (n - 1)).cast("bigint").alias("e"),
        )
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        cuts.withColumn("_prev_e", F.max("e").over(w_prev))
        .withColumn(
            "_new",
            F.when(
                F.col("s") > F.coalesce(F.col("_prev_e"), F.lit(-1)), 1
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w_run))
        .groupBy(id_col, "_isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("s"), F.col("e"))).alias("_cuts")
        )
    )
    joined = toks.join(islands, id_col, "left_outer").withColumn(
        "_cuts",
        F.coalesce(
            "_cuts", F.array().cast("array<struct<s:bigint,e:bigint>>")
        ),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_cuts"),
            lambda c: (i + 1 >= c["s"]) & (i + 1 <= c["e"]),
        ),
    )
    return joined.select(
        id_col,
        F.size("_toks").cast("bigint").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.concat_ws(" ", kept).alias("text_clean"),
    )


def minhash_jaccard_estimate(
    sigs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Signature-space Jaccard ESTIMATE for candidate pairs (Broder's
    classic resemblance estimator — public): Ĵ(a,b) = fraction of the k
    MinHash components that agree; unbiased with stderr ≈ √(J(1−J)/k).

    This is the verify tier between banding and `jaccard_verify`: exact
    shingle-set intersection re-joins the SHINGLE stream per pair (the
    dominant cost at 100 TB), while this joins only the signature table
    — k×8 bytes per doc — twice on the pair ids. Use it to rank/filter
    candidates cheaply and reserve the exact verify for pairs near the
    decision threshold (or skip the exact tier entirely when the ~1/√k
    error is acceptable). Returns ``(id_a, id_b, jaccard_est)``.
    """
    a = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)],
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(k)],
    )
    agree = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("int") for i in range(k)
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / F.lit(float(k))).alias("jaccard_est"),
        )
    )


def editdist_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    prefix_chars: int = 512,
    threshold: float = 0.0,
) -> DataFrame:
    """Character-level edit-distance verification for candidate pairs:
    ``(id_a, id_b, edit_dist, edit_sim)`` with
    edit_sim = 1 − lev(a, b) / max(len a, len b) over the first
    ``prefix_chars`` characters. The classic fuzzy-dup arbiter when
    token-level Jaccard is too coarse (small edits inside tokens,
    OCR/transcription noise).

    Levenshtein is O(n²) PER PAIR — ``prefix_chars`` is the guard that
    keeps a pair's cost bounded (512² char ops) no matter how large the
    documents are; candidates must already be banded/blocked (LSH,
    simhash, dhash) so the pair count is linear-ish. Runs entirely
    JVM-side (built-in levenshtein), and the join ships only the capped
    prefixes.

    CAVEAT: because only the first ``prefix_chars`` characters are
    compared, a pair identical in that prefix scores edit_sim = 1.0 even
    if the documents diverge afterwards. That is the intended contract —
    a bounded-cost arbiter AFTER banding, where candidates already share
    most content — not a standalone full-document equality check; for
    exact equality use the fingerprint (hash) dedup operators."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("_ta"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("_tb"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    mx = F.greatest(F.length("_ta"), F.length("_tb"))
    sim = F.when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - dist.cast("double") / mx
    )
    out = j.select(
        "id_a",
        "id_b",
        dist.alias("edit_dist"),
        sim.alias("edit_sim"),
    )
    # filter only when a positive threshold was asked for: edit_sim is
    # always in [0, 1], so at the default the filter would be a no-op.
    # NULL-text pairs (NULL sim) must pass through as NULL rows rather
    # than silently vanish from the verify tier AT ANY threshold — a
    # bare `>=` drops NULLs, so admit them explicitly.
    if threshold > 0.0:
        out = out.filter(
            (F.col("edit_sim") >= threshold) | F.col("edit_sim").isNull()
        )
    return out
