"""`curate(docs, policy)` — the composed curation pipeline behind one
entry point.

`examples/training_prep.py` used to wire ~10 stages by hand; this module
is the API a real user reaches for first: extract → normalize → dedup
tiers (exact / paragraph / near) → quality gates (Gopher / perplexity)
→ decontaminate → mix → pack, each stage toggleable through a
serializable `CurationPolicy`, with `funnel_stats` accounting built in.

Every stage delegates to the existing single-purpose operators — this
module adds composition and bookkeeping, never new semantics — so each
stage's scale properties (scan-stage gates, fingerprint-only shuffles,
banded near-dup, broadcast decontamination) are exactly the documented
ones. Stage chaining is id-based: a stage produces surviving
(id [, rewritten text]) and the next stage reads the survivor frame, so
dropped docs never re-enter later shuffles.

Beyond-reference (the reference has no pipeline surface — SURVEY.md §2);
part of the training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationPolicy:
    """Serializable per-stage toggles + parameters. Stage order is
    fixed (the canonical curation order); a disabled stage is skipped
    and does not appear in the funnel."""

    # extraction / normalization (scan-stage)
    html_extract: bool = False
    normalize: bool = False  # clean_web_text + fix_mojibake
    # dedup tiers
    exact_dedup: bool = True
    paragraph_dedup: bool = False
    paragraph_sep: str = "\n\n"
    neardup: bool = True
    minhash_k: int = 8
    bands: int = 4
    shingle_n: int = 3
    neardup_threshold: float = 0.5
    hash_fn: str = "sha256"
    # quality gates
    lang_allow: tuple[str, ...] = ()  # empty = no language gate
    gopher: bool = True
    min_words: int = 25
    gopher_rules: tuple[str, ...] = ("r_words", "r_alpha")
    perplexity: bool = True
    max_ppl: float | None = 30.1
    ppl_vocab: int = 100
    ppl_smoothing: float = 1.0
    # decontamination (active when a benchmark frame is passed)
    decontaminate: bool = True
    contam_ngram: int = 5
    contam_min_shared: int = 1
    # assembly (optional; run only when configured)
    mix_weights: dict[str, float] = field(default_factory=dict)
    mix_strata_col: str = "source"
    pack_budget: int | None = None


@dataclass
class CurationResult:
    """`docs` = surviving documents (id, text [+ passthrough columns]);
    `funnel` = one row per executed stage (stage_idx, stage, n,
    n_dropped, drop_pct); `stages` = the per-stage survivor frames for
    inspection / persistence.

    Funnel counts are ROWS, not distinct ids: after a `mix` stage the
    count includes epoch copies, so n can rise and n_dropped go
    negative — that reads as "rows added", which is exactly what mixing
    does."""

    docs: DataFrame
    funnel: DataFrame
    stages: list[tuple[str, DataFrame]]


def curate(
    docs: DataFrame,
    policy: CurationPolicy | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark: DataFrame | None = None,
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> CurationResult:
    """Run the policy's enabled stages in canonical order over ``docs``
    and return survivors + funnel accounting.

    The perplexity gate's LM trains on the pipeline INPUT corpus
    (post-normalize, pre-dedup) — the CCNet convention, and the choice
    that keeps the gate's scores independent of which dedup tiers are
    toggled. Docs the LM cannot score (empty/NULL text → NULL
    perplexity) PASS the perplexity gate — abstain, not veto; enable
    the Gopher stage to drop empty docs. ``benchmark`` activates the
    decontamination stage (word ``contam_ngram``-gram overlap,
    benchmark side broadcast)."""
    from embeddingsearch_spark.functions import text as T
    from embeddingsearch_spark.operators import (
        boilerplate,
        contamination,
        dedup as dd_ops,
        funnel,
        lmscore,
        packing,
        repetition,
        splits,
    )

    policy = policy or CurationPolicy()
    stages: list[tuple[str, DataFrame]] = []

    def _pin(df: DataFrame) -> DataFrame:
        # Every stage's SURVIVOR id frame (ids only, ~8 bytes/doc,
        # corpus-bounded) is lazily checkpointed. Without this the plan
        # grows EXPONENTIALLY: stage k's lineage re-embeds stages
        # 0..k-1, the funnel unions every stage, and Spark does no
        # cross-join common-subexpression reuse — measured 6,948
        # parquet scans for the 6-stage pipeline at sf0.01. Pinning the
        # surviving ids (not just each stage's keep/drop DECISION)
        # makes every stage's lineage `input ⋈ (one materialized id
        # frame)` — one corpus pass and ONE semi-join per stage however
        # deep the funnel, and the funnel counts read the pinned id
        # frames alone instead of re-scanning the corpus per stage.
        # Measured: the driver-side planning gaps between the ~50 jobs
        # of the 6-stage pipeline were 4x the executor task time under
        # the chained shape; this is the only shape that survives
        # 100 TB.
        return df.localCheckpoint(eager=False)

    # --- extraction / normalization: rewrite text in place, no drops
    base = docs
    if policy.html_extract:
        base = base.withColumn(
            text_col, T.html_to_text(F.col(text_col))
        )
    if policy.normalize:
        base = base.withColumn(
            text_col,
            T.clean_web_text(T.fix_mojibake(F.col(text_col))),
        )
    input_frame = base
    stages.append(("input", base))
    # funnel frames: (name, id frame) — for id-gated stages the PINNED
    # survivor ids (row-count-identical to the survivor corpus frame:
    # every gate's ids derive from the current corpus), so the funnel
    # never re-scans the corpus; mix/pack count their own row frames.
    funnel_frames: list[tuple[str, DataFrame]] = [
        ("input", base.select(id_col))
    ]
    ids: DataFrame | None = None  # None = every base row survives

    def _cur() -> DataFrame:
        return (
            base
            if ids is None
            else base.join(ids, id_col, "left_semi")
        )

    def _ids() -> DataFrame:
        return ids if ids is not None else base.select(id_col)

    def _gate(name: str, new_ids: DataFrame) -> None:
        nonlocal ids
        ids = _pin(new_ids)
        stages.append((name, _cur()))
        funnel_frames.append((name, ids))

    # --- exact dedup: keep each fingerprint group's canonical doc
    if policy.exact_dedup:
        ex = dd_ops.exact_duplicates(_cur(), id_col, text_col)
        _gate(
            "exact_dedup",
            ex.filter(F.col(id_col) == F.col("canonical_id")).select(
                id_col
            ),
        )

    # --- paragraph dedup: rewrites text, never drops whole docs
    if policy.paragraph_dedup:
        # the rewrite carries text — pinning it materializes the
        # rewritten corpus once instead of replaying the election in
        # every downstream stage's lineage
        rewritten = _pin(
            boilerplate.dedup_paragraphs(
                _cur(), id_col, text_col, sep=policy.paragraph_sep
            ).select(id_col, text_col)
        )
        # the rewritten frame holds exactly the current survivors, so
        # it becomes the new base and the id cut resets
        base = base.drop(text_col).join(rewritten, id_col)
        ids = None
        stages.append(("paragraph_dedup", base))
        funnel_frames.append(
            ("paragraph_dedup", rewritten.select(id_col))
        )

    # --- near-dup (MinHash+LSH, exact-Jaccard verified): drop the
    # higher id of each surviving pair
    if policy.neardup:
        pairs = dd_ops.near_duplicates_minhash(
            _cur(),
            id_col,
            text_col,
            k=policy.minhash_k,
            bands=policy.bands,
            shingle_n=policy.shingle_n,
            threshold=policy.neardup_threshold,
            hash_fn=policy.hash_fn,
        )
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        _gate("neardup", _ids().join(drop, id_col, "left_anti"))

    # --- language gate (scan-stage heuristic lang_id; for trained
    # labels run operators/langid upstream and filter before curate,
    # or pass its predictions through a custom gate)
    if policy.lang_allow:
        _gate(
            "lang",
            _cur()
            .filter(T.lang_id(F.col(text_col)).isin(*policy.lang_allow))
            .select(id_col),
        )

    # --- Gopher document rules (scan-stage projection)
    if policy.gopher:
        gop = repetition.gopher_rules(
            _cur(), id_col, text_col, min_words=policy.min_words
        )
        cond = F.lit(True)
        for r in policy.gopher_rules:
            cond = cond & F.col(r)
        _gate("gopher", gop.filter(cond).select(id_col))

    # --- perplexity gate (LM trained on the pipeline input)
    if policy.perplexity and policy.max_ppl is not None:
        lm = lmscore.unigram_scores(
            input_frame,
            id_col,
            text_col,
            vocab_size=policy.ppl_vocab,
            smoothing=policy.ppl_smoothing,
        )
        # Unscorable docs (empty/NULL text: no row, or NULL perplexity)
        # are NOT a quality verdict — the LM abstains, it does not veto,
        # so the gate drops only docs it POSITIVELY scored above the
        # cut (anti-join on failures; Gopher's min_words is the gate
        # that drops empty docs when enabled). The old keep-list
        # left_semi silently dropped them even at max_ppl = +inf.
        fails = lm.filter(
            F.col("perplexity") > policy.max_ppl
        ).select(id_col)
        _gate("ppl", _ids().join(fails, id_col, "left_anti"))

    # --- decontamination vs a benchmark frame (broadcast gram join)
    if policy.decontaminate and benchmark is not None:
        # inline `contamination.decontaminate` so the hits frame (the
        # decision ids) folds into the stage's survivor pin like every
        # other gate's
        hits = (
            contamination.ngram_overlap(
                _cur(),
                benchmark,
                id_col=id_col,
                text_col=text_col,
                bench_id_col=bench_id_col,
                bench_text_col=bench_text_col,
                n=policy.contam_ngram,
                # 8-byte gram hashes on the wire, never gram strings —
                # decontaminate()'s default, which the inline version
                # must keep (review catch: it was silently dropped)
                hash_grams=True,
            )
            .groupBy(id_col)
            .agg(F.sum("n_shared").alias("_tot"))
            .filter(F.col("_tot") >= policy.contam_min_shared)
            .select(id_col)
        )
        _gate(
            "decontaminate",
            _ids().join(F.broadcast(hits), id_col, "left_anti"),
        )

    # --- optional assembly: mixing (expected-copies) and packing —
    # row-multiplying stages, so from here funnel counts come from the
    # stage frames themselves (epoch copies must count)
    cur = _cur()
    if policy.mix_weights:
        cur = splits.weighted_mix(
            cur, id_col, policy.mix_strata_col, policy.mix_weights
        )
        stages.append(("mix", cur))
        funnel_frames.append(("mix", cur.select(id_col)))
    if policy.pack_budget is not None:
        with_tokens = cur.withColumn(
            "n_tokens", T.token_count(F.col(text_col))
        )
        # after mixing, (id, copy) — not id — is the packing unit: each
        # epoch copy is its own training instance. Derive a deterministic
        # unique long key for the packer via xxhash64 in BOTH branches —
        # it accepts any id type (a cast('long') would NULL out string
        # ids and the inner join would silently drop every row);
        # collision odds ~n²/2⁶⁴.
        if "copy" in with_tokens.columns:
            with_tokens = with_tokens.withColumn(
                "_pack_key", F.xxhash64(F.col(id_col), F.col("copy"))
            )
        else:
            with_tokens = with_tokens.withColumn(
                "_pack_key", F.xxhash64(F.col(id_col))
            )
        cur = with_tokens.join(
            packing.pack_sequences(
                with_tokens,
                id_col="_pack_key",
                token_col="n_tokens",
                budget=policy.pack_budget,
            ).select("_pack_key", "shard", "pack_id", "pack_pos"),
            "_pack_key",
        ).drop("_pack_key")
        stages.append(("pack", cur))
        funnel_frames.append(("pack", cur.select(id_col)))

    return CurationResult(
        docs=cur,
        funnel=funnel.funnel_stats(funnel_frames),
        stages=stages,
    )


def curate_incremental(
    batch: DataFrame,
    indexed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 25,
    gopher_rules: tuple[str, ...] = ("r_words", "r_alpha"),
    neardup_threshold: float = 0.5,
    hash_fn: str = "sha256",
) -> CurationResult:
    """Per-batch ingest curation AGAINST an indexed corpus — the
    incremental twin of `curate`: exact-fingerprint gate (anti-join
    against the index), near-dup gate (banded MinHash vs the index,
    Jaccard-verified), then the scan-stage Gopher rules on what
    survives. Same funnel accounting and decision-frame pinning as the
    batch pipeline; the indexed corpus is only ever joined against —
    never rewritten — so ingest cost scales with the batch."""
    from embeddingsearch_spark.operators import (
        dedup as dd_ops,
        funnel,
        repetition,
    )

    def _pin(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    stages: list[tuple[str, DataFrame]] = [("batch", batch)]
    # every gate's keep-list derives from the current survivor frame,
    # so the pinned survivor ids ARE each stage's row count — the
    # funnel reads the pins, never the batch (same shape as `curate`)
    funnel_frames: list[tuple[str, DataFrame]] = [
        ("batch", batch.select(id_col))
    ]

    def _cur(ids: DataFrame) -> DataFrame:
        return batch.join(ids, id_col, "left_semi")

    # exact gate: only fingerprints absent from the index survive
    ids = _pin(
        dd_ops.incremental_new_docs(
            batch, indexed, id_col, text_col
        ).select(id_col)
    )
    stages.append(("exact_gate", _cur(ids)))
    funnel_frames.append(("exact_gate", ids))

    # near-dup gate: survivors without a Jaccard-verified indexed match
    flags = dd_ops.incremental_neardup(
        _cur(ids),
        indexed,
        id_col,
        text_col,
        threshold=neardup_threshold,
        hash_fn=hash_fn,
    )
    ids = _pin(flags.filter(F.col("is_new")).select(id_col))
    stages.append(("neardup_gate", _cur(ids)))
    funnel_frames.append(("neardup_gate", ids))

    # quality gate on what's genuinely new
    gop = repetition.gopher_rules(
        _cur(ids), id_col, text_col, min_words=min_words
    )
    cond = F.lit(True)
    for r in gopher_rules:
        cond = cond & F.col(r)
    ids = _pin(gop.filter(cond).select(id_col))
    cur = _cur(ids)
    stages.append(("gopher", cur))
    funnel_frames.append(("gopher", ids))

    return CurationResult(
        docs=cur,
        funnel=funnel.funnel_stats(funnel_frames),
        stages=stages,
    )
