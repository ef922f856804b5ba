"""Index-maintenance queries: the upsert diff taxonomy (J7/Q4), session
finalize anti-join (J6/Q5), and embedding-cache hit/miss split (J8/Q6) —
over two deterministically-derived document-index versions.

Derivation (mirrored in the oracle SQL below):
  v1 (existing index): documents where doc_id % 17 != 3
      method = M[doc_id % 4]
  v2 (uploaded set):   documents where doc_id % 13 != 5
      text  : doc_id % 10 == 0 → text || ' v2marker'   (text change)
      method: doc_id % 11 == 0 → M[(doc_id + 1) % 4]   (method-only change)
Cache fixture: hashes of v1 texts of docs with doc_id % 3 == 0, modelA only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.functions.text import text_hash
from embeddingsearch_spark.operators import upsert

_METHODS = ["Mean", "HarmonicMean", "QuadraticMean", "GeometricMean"]

_M_CASE_V1 = (
    "CASE (doc_id % 4) WHEN 0 THEN 'Mean' WHEN 1 THEN 'HarmonicMean' "
    "WHEN 2 THEN 'QuadraticMean' ELSE 'GeometricMean' END"
)
_M_CASE_V2 = (
    "CASE ((doc_id + CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) % 4) "
    "WHEN 0 THEN 'Mean' WHEN 1 THEN 'HarmonicMean' "
    "WHEN 2 THEN 'QuadraticMean' ELSE 'GeometricMean' END"
)

V1_SQL = f"""v1 AS (
  SELECT doc_id, text, sha256(text) AS text_hash, {_M_CASE_V1} AS probmethod
  FROM documents WHERE doc_id % 17 != 3
)"""
V2_SQL = f"""v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' v2marker' ELSE text END AS text,
         sha256(CASE WHEN doc_id % 10 = 0 THEN text || ' v2marker' ELSE text END)
           AS text_hash,
         {_M_CASE_V2} AS probmethod
  FROM documents WHERE doc_id % 13 != 5
)"""


def _pick_method(idx):
    expr = F.lit(_METHODS[-1])
    for i, m in enumerate(_METHODS[:-1]):
        expr = F.when(idx == i, F.lit(m)).otherwise(expr)
    return expr


def derive_v1(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        "text",
        text_hash(F.col("text")).alias("text_hash"),
        _pick_method(F.col("doc_id") % 4).alias("probmethod"),
    )


def derive_v2(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    new_text = F.when(
        F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2marker"))
    ).otherwise(F.col("text"))
    shift = F.when(F.col("doc_id") % 11 == 0, 1).otherwise(0)
    return docs.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id",
        new_text.alias("text"),
        text_hash(new_text).alias("text_hash"),
        _pick_method((F.col("doc_id") + shift) % 4).alias("probmethod"),
    )


def q_upsert_classify(spark, sf_dir):
    """Reference upsert diff taxonomy (SearchdomainHelper.cs:148-343):
    insert / delete / update_text / update_method / unchanged per doc."""
    return upsert.classify_changes(
        derive_v1(spark, sf_dir),
        derive_v2(spark, sf_dir),
        keys=["doc_id"],
        hash_col="text_hash",
        method_cols=("probmethod",),
    )


UPSERT_CLASSIFY_SQL = f"""WITH {V1_SQL}, {V2_SQL}
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
  CASE
    WHEN v1.doc_id IS NULL THEN 'insert'
    WHEN v2.doc_id IS NULL THEN 'delete'
    WHEN v1.text_hash != v2.text_hash THEN 'update_text'
    WHEN v1.probmethod != v2.probmethod THEN 'update_method'
    ELSE 'unchanged'
  END AS change_type
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id"""


def q_session_finalize(spark, sf_dir):
    """Session-complete delete list: in the index but absent from the
    uploaded set (reference EntityController.cs:163-199)."""
    return upsert.session_finalize_deletes(
        derive_v1(spark, sf_dir), derive_v2(spark, sf_dir), keys=["doc_id"]
    )


SESSION_FINALIZE_SQL = f"""WITH {V1_SQL}, {V2_SQL}
SELECT DISTINCT v1.doc_id FROM v1
WHERE v1.doc_id NOT IN (SELECT doc_id FROM v2)"""


def q_cache_hit_miss(spark, sf_dir):
    """Embedding-cache probe: requested (text_hash, model) pairs of v2 × 2
    models vs cached set → hit/miss counts per model (reference
    Datapoint.cs:67-110)."""
    v2 = derive_v2(spark, sf_dir)
    requested = v2.select("doc_id", "text_hash").crossJoin(
        spark.createDataFrame(
            [("mock:modelA",), ("mock:modelB",)], "model string"
        )
    )
    cache = (
        derive_v1(spark, sf_dir)
        .filter(F.col("doc_id") % 3 == 0)
        .select("text_hash", F.lit("mock:modelA").alias("model"))
    )
    tagged = upsert.cache_split(requested, cache)
    return tagged.groupBy("model", "cache_status").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.countDistinct("text_hash").alias("n_distinct_texts"),
    )


CACHE_HIT_MISS_SQL = f"""WITH {V1_SQL}, {V2_SQL},
requested AS (
  SELECT v2.doc_id, v2.text_hash, m.model
  FROM v2, (SELECT 'mock:modelA' AS model UNION ALL SELECT 'mock:modelB') m
),
cache AS (
  SELECT DISTINCT text_hash, 'mock:modelA' AS model FROM v1 WHERE doc_id % 3 = 0
)
SELECT r.model,
       CASE WHEN c.text_hash IS NOT NULL THEN 'hit' ELSE 'miss' END AS cache_status,
       count(*) AS n_requests,
       count(DISTINCT r.text_hash) AS n_distinct_texts
FROM requested r LEFT JOIN cache c
  ON r.text_hash = c.text_hash AND r.model = c.model
GROUP BY r.model, CASE WHEN c.text_hash IS NOT NULL THEN 'hit' ELSE 'miss' END"""


def q_store_reconcile(spark, sf_dir):
    """Persistent-store reconciliation (E1-E3) WITH the reference's
    StoreTopN capacity semantics (CacheHelper.cs:44-49,
    docs/Server.md:78-81): on-disk store = v1 texts of doc_id % 3 == 0
    (modelA); desired state = v2 texts of doc_id % 2 == 0 (modelA),
    capped to the 150 most-recently-used entries (last_access =
    doc_id). Entries beyond the cap are evicted — store-resident ones
    classify as 'delete', absent ones produce no row — exactly the
    truncated-LRU enumeration the reference persists."""
    store = (
        derive_v1(spark, sf_dir)
        .filter(F.col("doc_id") % 3 == 0)
        .select("text_hash", F.lit("mock:modelA").alias("model"))
    )
    desired = (
        derive_v2(spark, sf_dir)
        .filter(F.col("doc_id") % 2 == 0)
        .select(
            "text_hash",
            F.lit("mock:modelA").alias("model"),
            F.col("doc_id").alias("last_access"),
        )
    )
    return upsert.reconcile_store(
        store, desired, capacity=150, recency_col="last_access"
    )


STORE_RECONCILE_SQL = f"""WITH {V1_SQL}, {V2_SQL},
store AS (
  SELECT DISTINCT text_hash, 'mock:modelA' AS model
  FROM v1 WHERE doc_id % 3 = 0
),
desired_all AS (
  SELECT text_hash, 'mock:modelA' AS model, max(doc_id) AS last_access
  FROM v2 WHERE doc_id % 2 = 0
  GROUP BY text_hash
),
desired AS (
  SELECT text_hash, model FROM (
    SELECT text_hash, model,
           row_number() OVER (ORDER BY last_access DESC,
                              text_hash ASC, model ASC) AS rn
    FROM desired_all)
  WHERE rn <= 150
)
SELECT coalesce(s.text_hash, d.text_hash) AS text_hash,
       coalesce(s.model, d.model) AS model,
       CASE WHEN d.text_hash IS NULL THEN 'delete'
            WHEN s.text_hash IS NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM store s FULL OUTER JOIN desired d
  ON s.text_hash = d.text_hash AND s.model = d.model"""


QUERIES = {
    "upsert_classify": (q_upsert_classify, UPSERT_CLASSIFY_SQL),
    "session_finalize": (q_session_finalize, SESSION_FINALIZE_SQL),
    "cache_hit_miss": (q_cache_hit_miss, CACHE_HIT_MISS_SQL),
    "store_reconcile": (q_store_reconcile, STORE_RECONCILE_SQL),
}
