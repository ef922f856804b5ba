"""Materialized query results + incremental maintenance (SURVEY.md §4
X1/X2): the reference's in-memory LRU query cache with per-entity
reconciliation (Searchdomain.cs:22,298-348) becomes a materialized
`query_results` table refreshed incrementally.

The reconciliation insight is the reference's own: when an entity changes,
every cached ranking can be repaired by re-scoring JUST that entity and
re-inserting it — the other entities' scores are unaffected. In Spark:

    kept     = query_results ⟕anti touched          (drop stale rows)
    rescored = cascade(index ⋉ touched, queries)    (score ONLY touched)
    refresh  = rank(kept ∪ rescored)                (window re-rank)

At 100 TB the expensive stage — similarity + two-level aggregation over
the corpus — runs over only the touched entities' rows (semi-join prunes
the scan; with the index partitioned by searchdomain, untouched domains
are never read). The final window re-rank is one exchange over the result
table, which is orders of magnitude smaller than the corpus.

topN semantics: rankings are materialized in FULL; topN is applied at
read time (declared deviation from the reference's truncated-cache quirk,
SURVEY.md §2.6 — `read_results` below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import search as search_op


def materialize(
    index: DataFrame, queries: DataFrame, searchdomain: str | None = None
) -> DataFrame:
    """Full refresh: the complete ranking per (searchdomain, query)."""
    return search_op.search(index, queries, searchdomain=searchdomain)


def incremental_refresh(
    query_results: DataFrame,
    index: DataFrame,
    queries: DataFrame,
    touched: DataFrame,
) -> DataFrame:
    """Repair materialized rankings after the entities in ``touched``
    (searchdomain, entity) changed in ``index``: re-score only those
    entities, splice into the kept rows, re-rank. Equals a full
    `materialize` over the updated index (tested)."""
    keys = ["searchdomain", "entity"]
    touched_keys = touched.select(keys).distinct()
    kept = query_results.join(touched_keys, keys, "left_anti").select(
        "searchdomain", "query", "entity", "score"
    )
    touched_index = index.join(touched_keys, keys, "left_semi")
    rescored = search_op.entity_scores(
        search_op.datapoint_scores(
            search_op.score_pairs(touched_index, queries)
        )
    ).select("searchdomain", "query", "entity", "score")
    return search_op.rank_results(kept.unionByName(rescored))


def read_results(
    query_results: DataFrame,
    query: str | None = None,
    searchdomain: str | None = None,
    topn: int | None = None,
) -> DataFrame:
    """Read-time projection of the materialized rankings; topN applies
    over the full ranking (never a stale truncation)."""
    df = query_results
    if searchdomain is not None:
        df = df.filter(F.col("searchdomain") == searchdomain)
    if query is not None:
        df = df.filter(F.col("query") == query)
    if topn is not None:
        df = df.filter(F.col("rank") <= topn)
    return df
