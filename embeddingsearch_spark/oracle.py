"""DuckDB-SQL mirrors of the engine's queries for the driver's correctness
gate (CORRECTNESS_r{N}.json): for each entry in ``__spark_entry__.queries()``
an equivalent SQL string over the pre-registered testdata views.

These implement the engine's *declared* semantics (constants.py) — float64,
EPS-tolerant short-circuits, sign-aware log-space GeometricMean, rounded
scores, deterministic tiebreaks — NOT the reference's float32 bit patterns
(SURVEY.md §2.4: hash-matching is against our declared semantics).

The oracle may specialize to the fixture (e.g. the DictionaryWeightedAverage
weight dictionaries are inlined as CASE expressions rather than parsed from
JSON) — it only needs to be correct for the derived fixture tables, while
the engine stays generic.
"""

from __future__ import annotations

from embeddingsearch_spark.constants import EPS, ROUND_DIGITS

# ---------------------------------------------------------------------------
# Fixture derivation (SQL mirror of tables.derive_corpus / derive_queries)
# ---------------------------------------------------------------------------

_ENT_PM_CASE = """CASE ((vec_id // 6) % 8)
      WHEN 0 THEN 'Mean' WHEN 1 THEN 'HarmonicMean' WHEN 2 THEN 'QuadraticMean'
      WHEN 3 THEN 'GeometricMean' WHEN 4 THEN 'EVEWAvg' WHEN 5 THEN 'HVEWAvg'
      WHEN 6 THEN 'LVEWAvg'
      ELSE 'DictionaryWeightedAverage:{"title":2.0,"filename":0.1,"text":0.25}' END"""

_DP_PM_CASE = """CASE (((vec_id // 6) + (vec_id % 6) // 2) % 8)
      WHEN 0 THEN 'Mean' WHEN 1 THEN 'HarmonicMean' WHEN 2 THEN 'QuadraticMean'
      WHEN 3 THEN 'GeometricMean' WHEN 4 THEN 'EVEWAvg' WHEN 5 THEN 'HVEWAvg'
      WHEN 6 THEN 'LVEWAvg'
      ELSE 'DictionaryWeightedAverage:{"mock:modelA":4.0,"mock:modelB":1.0}' END"""

CORPUS_CTE = f"""corpus AS (
  SELECT
    'sd_' || CAST((vec_id // 6) % 2 AS VARCHAR) AS searchdomain,
    'ent_' || lpad(CAST(vec_id // 6 AS VARCHAR), 6, '0') AS entity,
    {_ENT_PM_CASE} AS entity_probmethod,
    CASE ((vec_id % 6) // 2) WHEN 0 THEN 'title' WHEN 1 THEN 'text'
      ELSE 'filename' END AS datapoint,
    {_DP_PM_CASE} AS dp_probmethod,
    CASE (((vec_id // 6) * 3 + (vec_id % 6) // 2) % 4)
      WHEN 0 THEN 'Cosine' WHEN 1 THEN 'Euclidian' WHEN 2 THEN 'Manhattan'
      ELSE 'Pearson' END AS simmethod,
    CASE (vec_id % 2) WHEN 0 THEN 'mock:modelA' ELSE 'mock:modelB' END AS model,
    CASE (vec_id % 2) WHEN 0 THEN embedding
      ELSE list_reverse(embedding) END AS vector
  FROM embeddings
)"""

QUERIES_CTE = """queries AS (
  SELECT 'q' || CAST(vec_id AS VARCHAR) AS query, 'mock:modelA' AS model,
         embedding AS qvec
  FROM embeddings WHERE vec_id < 4
  UNION ALL
  SELECT 'q' || CAST(vec_id AS VARCHAR), 'mock:modelB', list_reverse(embedding)
  FROM embeddings WHERE vec_id < 4
)"""


# ---------------------------------------------------------------------------
# Probmethod fold (SQL mirror of functions/probmethods.py)
# ---------------------------------------------------------------------------

def pm_fold(x: str, method: str, weight: str) -> str:
    """Aggregate CASE expression folding column ``x`` per the group's
    ``method`` (a grouping column), with per-row ``weight`` for DWA."""
    nz = f"abs({x}) > {EPS}"
    zero = f"abs({x}) <= {EPS}"
    one = f"abs(({x}) - 1.0) <= {EPS}"
    not_one = f"abs(({x}) - 1.0) > {EPS}"
    n_t = "CAST(count(*) AS DOUBLE)"
    n_nz = f"CAST(sum(CASE WHEN {nz} THEN 1 ELSE 0 END) AS DOUBLE)"
    inv_sum = f"sum(CASE WHEN {nz} THEN 1.0/({x}) ELSE 0.0 END)"
    harmonic = (
        f"CASE WHEN {n_nz} = 0 THEN 0.0 WHEN {inv_sum} = 0 THEN 0.0 "
        f"ELSE {n_nz}/({inv_sum}) * {n_nz}/{n_t} END"
    )
    has_zero = f"max(CASE WHEN {zero} THEN 1 ELSE 0 END) = 1"
    has_one = f"max(CASE WHEN {one} THEN 1 ELSE 0 END) = 1"
    neg_odd = f"(sum(CASE WHEN ({x}) < -{EPS} THEN 1 ELSE 0 END) % 2) = 1"
    log_mean = f"avg(CASE WHEN {nz} THEN ln(abs({x})) END)"
    geometric = (
        f"CASE WHEN {has_zero} THEN 0.0 ELSE "
        f"(CASE WHEN {neg_odd} THEN -1.0 ELSE 1.0 END) * exp({log_mean}) END"
    )
    v_eo = f"({nz} AND {not_one})"
    evew_f = f"sum(CASE WHEN {v_eo} THEN ({x})/(({x})*(1.0-({x}))) ELSE 0.0 END)"
    evew_fm = f"sum(CASE WHEN {v_eo} THEN 1.0/(({x})*(1.0-({x}))) ELSE 0.0 END)"
    evew = (
        f"CASE WHEN {has_one} THEN 1.0 WHEN {has_zero} THEN 0.0 "
        f"WHEN {evew_fm} = 0 THEN 0.0 ELSE ({evew_f})/({evew_fm}) END"
    )
    hvew_f = f"sum(CASE WHEN {not_one} THEN ({x})/(1.0-({x})) ELSE 0.0 END)"
    hvew_fm = f"sum(CASE WHEN {not_one} THEN 1.0/(1.0-({x})) ELSE 0.0 END)"
    hvew = (
        f"CASE WHEN {has_one} THEN 1.0 WHEN {hvew_fm} = 0 THEN 0.0 "
        f"ELSE ({hvew_f})/({hvew_fm}) END"
    )
    lvew_f = f"sum(CASE WHEN {nz} THEN 1.0 ELSE 0.0 END)"
    lvew_fm = f"sum(CASE WHEN {nz} THEN 1.0/({x}) ELSE 0.0 END)"
    lvew = (
        f"CASE WHEN {has_zero} THEN 0.0 WHEN {lvew_fm} = 0 THEN 0.0 "
        f"ELSE ({lvew_f})/({lvew_fm}) END"
    )
    dwa = (
        f"CASE WHEN sum({weight}) = 0 THEN 0.0 "
        f"ELSE sum(({weight})*({x}))/sum({weight}) END"
    )
    return f"""CASE split_part({method}, ':', 1)
      WHEN 'Mean' THEN avg({x})
      WHEN 'HarmonicMean' THEN {harmonic}
      WHEN 'QuadraticMean' THEN sqrt(avg(({x})*({x})))
      WHEN 'GeometricMean' THEN {geometric}
      WHEN 'EVEWAvg' THEN {evew}
      WHEN 'HVEWAvg' THEN {hvew}
      WHEN 'LVEWAvg' THEN {lvew}
      ELSE {dwa}
    END"""


# Fixture-specialized DWA weights (the engine parses these from the method
# string generically; the oracle inlines the fixed fixture dictionaries).
DP_WEIGHT = (
    "CASE WHEN dp_probmethod LIKE 'DictionaryWeightedAverage%' THEN "
    "CASE model WHEN 'mock:modelA' THEN 4.0 WHEN 'mock:modelB' THEN 1.0 "
    "ELSE 1.0 END ELSE 1.0 END"
)
ENT_WEIGHT = (
    "CASE WHEN entity_probmethod LIKE 'DictionaryWeightedAverage%' THEN "
    "CASE datapoint WHEN 'title' THEN 2.0 WHEN 'filename' THEN 0.1 "
    "WHEN 'text' THEN 0.25 ELSE 1.0 END ELSE 1.0 END"
)

# Similarity over parallel-unnested vector elements (DuckDB zips unnests).
_SIM_CASE = """CASE simmethod
      WHEN 'Cosine' THEN CASE WHEN sqrt(sum(x*x))*sqrt(sum(y*y)) = 0 THEN 0.5
        ELSE (sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) + 1.0)/2.0 END
      WHEN 'Euclidian' THEN 1.0/(1.0+sqrt(sum((x-y)*(x-y))))
      WHEN 'Manhattan' THEN 1.0/(1.0+sum(abs(x-y)))
      ELSE CASE WHEN (sum(x*x)-sum(x)*sum(x)/count(*))
                   * (sum(y*y)-sum(y)*sum(y)/count(*)) <= 0 THEN 0.0
        ELSE (sum(x*y)-sum(x)*sum(y)/count(*))
             / sqrt((sum(x*x)-sum(x)*sum(x)/count(*))
                  * (sum(y*y)-sum(y)*sum(y)/count(*))) END
    END"""


def sims_ctes(corpus_cte: str | None = None) -> str:
    """CTE chain: corpus + queries joined on model, elementwise-exploded,
    re-aggregated to one similarity per (corpus row, query).
    ``corpus_cte`` overrides the default corpus derivation (must define a
    CTE named ``corpus``) — used for modified-index scenarios."""
    return f"""{corpus_cte or CORPUS_CTE},
{QUERIES_CTE},
elems AS (
  SELECT c.searchdomain, c.entity, c.entity_probmethod, c.datapoint,
         c.dp_probmethod, c.simmethod, c.model, q.query,
         CAST(unnest(c.vector) AS DOUBLE) AS x,
         CAST(unnest(q.qvec) AS DOUBLE) AS y
  FROM corpus c JOIN queries q ON c.model = q.model
),
sims AS (
  SELECT searchdomain, entity, entity_probmethod, datapoint, dp_probmethod,
         simmethod, model, query,
         {_SIM_CASE} AS sim
  FROM elems
  GROUP BY searchdomain, entity, entity_probmethod, datapoint, dp_probmethod,
           simmethod, model, query
)"""


def search_cascade_sql(
    topn: int | None = None, corpus_cte: str | None = None
) -> str:
    """Full two-level cascade + ranking — mirror of operators/search.py."""
    dp_fold = pm_fold("sim", "dp_probmethod", DP_WEIGHT)
    ent_fold = pm_fold("dp_score", "entity_probmethod", ENT_WEIGHT)
    limit = f"WHERE rank <= {topn}" if topn is not None else ""
    return f"""WITH {sims_ctes(corpus_cte)},
dp_scores AS (
  SELECT searchdomain, entity, entity_probmethod, query, datapoint,
         dp_probmethod,
         {dp_fold} AS dp_score
  FROM sims
  GROUP BY searchdomain, entity, entity_probmethod, query, datapoint,
           dp_probmethod
),
scores AS (
  SELECT searchdomain, entity, query,
         {ent_fold} AS score
  FROM dp_scores
  GROUP BY searchdomain, entity, query, entity_probmethod
),
ranked AS (
  SELECT searchdomain, query, entity,
         round(score, {ROUND_DIGITS}) AS score,
         row_number() OVER (
           PARTITION BY searchdomain, query
           ORDER BY round(score, {ROUND_DIGITS}) DESC, entity ASC) AS rank
  FROM scores
)
SELECT searchdomain, query, entity, score, CAST(rank AS INT) AS rank
FROM ranked {limit}"""
