"""Search-result snippet extraction: the best query-term window per
document.

Every search surface shows a snippet; the classic algorithm (public) is
"the fixed-width token window containing the most query-term hits,
earliest such window on ties". Fully declarative:

- token positions explode scan-side; only positions whose token matches
  a (broadcast) query term survive — the hit stream is bounded by
  query-term frequency, not corpus size;
- per (query, doc), each hit anchors a candidate window [pos, pos+w)
  and a RANGE-frame window function counts the hits inside it — no
  self-join, no per-pair quadratic work;
- the argmax (hit count desc, position asc) picks one window per
  (query, doc), and the snippet text is a scan-side slice of the
  original token array.

Integer-only semantics — no float rounding anywhere — so any engine
reproduces the exact snippet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_snippets(
    docs: DataFrame,
    queries: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """``(query_id, doc_id, start, n_hits, snippet)`` for every
    (query, doc) pair with at least one term hit. ``start`` is the
    0-based token index of the window; matching is lowercase, the
    snippet preserves original token case."""
    from embeddingsearch_spark.functions.text import tokens
    from embeddingsearch_spark.operators.retrieval import query_terms

    if window < 1:
        raise ValueError("window must be >= 1")
    qterms = query_terms(queries, query_id_col, query_text_col)
    staged = docs.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_orig"),
    ).withColumn(
        "_low", F.transform(F.col("_orig"), F.lower)
    )
    pos = staged.select(
        F.col(id_col),
        F.posexplode("_low").alias("pos", "term"),
    )
    hits = pos.join(F.broadcast(qterms), "term").select(
        query_id_col, id_col, "pos"
    )
    # hits inside [pos, pos+window): a RANGE frame over the ordered hit
    # positions — per (query, doc) state only, no self-join
    wf = (
        Window.partitionBy(query_id_col, id_col)
        .orderBy("pos")
        .rangeBetween(0, window - 1)
    )
    counted = hits.withColumn("n_hits", F.count(F.lit(1)).over(wf))
    rank = Window.partitionBy(query_id_col, id_col).orderBy(
        F.col("n_hits").desc(), F.col("pos").asc()
    )
    best = (
        counted.withColumn("_rn", F.row_number().over(rank))
        .filter(F.col("_rn") == 1)
        .select(
            query_id_col,
            id_col,
            F.col("pos").alias("start"),
            "n_hits",
        )
    )
    return best.join(staged.select(id_col, "_orig"), id_col).select(
        query_id_col,
        id_col,
        "start",
        "n_hits",
        F.concat_ws(
            " ", F.slice(F.col("_orig"), F.col("start") + 1, window)
        ).alias("snippet"),
    )


def best_snippets_from_index(
    spark,
    positions_table: str,
    docs: DataFrame,
    queries: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """`best_snippets` served from the PERSISTED positional index
    (`retrieval.build_positions_index`): the hit stream comes from a
    term-bucketed equi-join against stored (doc, pos, term) rows — no
    corpus-wide posexplode — and the corpus is touched exactly once,
    SEMI-JOINED down to the matched docs, solely to slice the
    original-case snippet text (positions store lowered terms, which
    is also the matching semantics). On selective queries the
    tokenize-for-text pass is matched-docs-sized, not corpus-sized.
    Identical output to `best_snippets` — shared oracle."""
    from embeddingsearch_spark.functions.text import tokens
    from embeddingsearch_spark.operators.retrieval import query_terms

    if window < 1:
        raise ValueError("window must be >= 1")
    qterms = query_terms(queries, query_id_col, query_text_col)
    pos = spark.table(positions_table)
    hits = pos.join(F.broadcast(qterms), "term").select(
        query_id_col, id_col, "pos"
    )
    wf = (
        Window.partitionBy(query_id_col, id_col)
        .orderBy("pos")
        .rangeBetween(0, window - 1)
    )
    counted = hits.withColumn("n_hits", F.count(F.lit(1)).over(wf))
    rank = Window.partitionBy(query_id_col, id_col).orderBy(
        F.col("n_hits").desc(), F.col("pos").asc()
    )
    best = (
        counted.withColumn("_rn", F.row_number().over(rank))
        .filter(F.col("_rn") == 1)
        .select(
            query_id_col,
            id_col,
            F.col("pos").alias("start"),
            "n_hits",
        )
        .localCheckpoint(eager=False)
    )
    staged = docs.join(
        best.select(id_col).distinct(), id_col, "left_semi"
    ).select(F.col(id_col), tokens(F.col(text_col)).alias("_orig"))
    return best.join(staged, id_col).select(
        query_id_col,
        id_col,
        "start",
        "n_hits",
        F.concat_ws(
            " ", F.slice(F.col("_orig"), F.col("start") + 1, window)
        ).alias("snippet"),
    )


def top_snippets(
    docs: DataFrame,
    queries: DataFrame,
    window: int = 10,
    s: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Top-``s`` NON-OVERLAPPING query-term windows per (query, doc):
    ``(query_id, doc_id, start, n_hits, snip_rank, snippet)`` — the
    multi-passage variant every result page shows (Lucene's unified
    highlighter shape). Greedy selection, declared exactly: round i
    picks the best remaining window (hits desc, position asc), then
    every candidate start within ``window`` tokens of a picked start is
    suppressed; ``s`` is fixed and small, so the loop is a finite CTE
    chain the oracle replays round by round. Hit counts are computed
    ONCE over the full hit stream (suppression removes candidate
    STARTS, not hits) and the candidate frame is pinned per round —
    round i's lineage never replays rounds 0..i-1."""
    from embeddingsearch_spark.functions.text import tokens
    from embeddingsearch_spark.operators.retrieval import query_terms

    if window < 1 or s < 1:
        raise ValueError("window and s must be >= 1")
    qterms = query_terms(queries, query_id_col, query_text_col)
    staged = docs.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_orig"),
    ).withColumn("_low", F.transform(F.col("_orig"), F.lower))
    pos = staged.select(
        F.col(id_col), F.posexplode("_low").alias("pos", "term")
    )
    hits = pos.join(F.broadcast(qterms), "term").select(
        query_id_col, id_col, "pos"
    )
    sel = _greedy_windows(hits, window, s, id_col, query_id_col)
    return sel.join(staged.select(id_col, "_orig"), id_col).select(
        query_id_col,
        id_col,
        "start",
        "n_hits",
        "snip_rank",
        F.concat_ws(
            " ", F.slice(F.col("_orig"), F.col("start") + 1, window)
        ).alias("snippet"),
    )


def _greedy_windows(
    hits: DataFrame,
    window: int,
    s: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """The greedy non-overlapping window selection over a
    (query, doc, pos) hit stream — shared by the scan path and the
    positional-index serve. Hit counts computed once; each round's
    candidate frame pinned so round i never replays rounds 0..i-1."""
    wf = (
        Window.partitionBy(query_id_col, id_col)
        .orderBy("pos")
        .rangeBetween(0, window - 1)
    )
    remaining = hits.withColumn(
        "n_hits", F.count(F.lit(1)).over(wf)
    ).localCheckpoint(eager=False)
    rank = Window.partitionBy(query_id_col, id_col).orderBy(
        F.col("n_hits").desc(), F.col("pos").asc()
    )
    picks = []
    for i in range(1, s + 1):
        pick = (
            remaining.withColumn("_rn", F.row_number().over(rank))
            .filter(F.col("_rn") == 1)
            .select(
                query_id_col,
                id_col,
                F.col("pos").alias("start"),
                "n_hits",
                F.lit(i).alias("snip_rank"),
            )
        )
        picks.append(pick)
        if i < s:
            remaining = (
                remaining.join(
                    pick.select(
                        query_id_col,
                        id_col,
                        F.col("start").alias("_p"),
                    ),
                    [query_id_col, id_col],
                    "left",
                )
                .filter(
                    F.col("_p").isNull()
                    | (F.abs(F.col("pos") - F.col("_p")) >= window)
                )
                .drop("_p")
                .localCheckpoint(eager=False)
            )
    sel = picks[0]
    for p in picks[1:]:
        sel = sel.unionByName(p)
    return sel


def top_snippets_from_index(
    spark,
    positions_table: str,
    docs: DataFrame,
    queries: DataFrame,
    window: int = 10,
    s: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """`top_snippets` served from the persisted positional index —
    the `best_snippets_from_index` composition applied to the greedy
    multi-passage rounds: hit stream from stored (doc, pos, term)
    rows, corpus tokenized once semi-joined to matched docs for the
    original-case text. Identical output — shared oracle."""
    from embeddingsearch_spark.functions.text import tokens
    from embeddingsearch_spark.operators.retrieval import query_terms

    if window < 1 or s < 1:
        raise ValueError("window and s must be >= 1")
    qterms = query_terms(queries, query_id_col, query_text_col)
    pos = spark.table(positions_table)
    hits = pos.join(F.broadcast(qterms), "term").select(
        query_id_col, id_col, "pos"
    )
    sel = _greedy_windows(
        hits, window, s, id_col, query_id_col
    ).localCheckpoint(eager=False)
    staged = docs.join(
        sel.select(id_col).distinct(), id_col, "left_semi"
    ).select(F.col(id_col), tokens(F.col(text_col)).alias("_orig"))
    return sel.join(staged, id_col).select(
        query_id_col,
        id_col,
        "start",
        "n_hits",
        "snip_rank",
        F.concat_ws(
            " ", F.slice(F.col("_orig"), F.col("start") + 1, window)
        ).alias("snippet"),
    )
