"""Admin/maintenance queries: per-table size accounting (F11, reference
DatabaseHelper.cs:291-397) and snapshot-diff reindex classification (T4
Changed/Deleted, reference Calls.cs:313-435) — both as driver-gated
queries with DuckDB twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.api import database_size_breakdown
from embeddingsearch_spark.operators.reindex import snapshot_diff
from embeddingsearch_spark.oracle import CORPUS_CTE


def q_database_size(spark, sf_dir):
    """Per-table stored-bytes breakdown over the derived corpus (the
    reference's SUM(LENGTH(...)) accounting re-expressed as map-side
    aggregations). text_hash is derived deterministically so both engines
    agree on the datapoint payload."""
    corpus = tables.derive_corpus(spark, sf_dir).withColumn(
        "text_hash",
        F.sha2(F.concat_ws("/", F.col("entity"), F.col("datapoint")), 256),
    )
    return database_size_breakdown(corpus)


DATABASE_SIZE_SQL = f"""WITH {CORPUS_CTE},
hashed AS (
  SELECT *, sha256(entity || '/' || datapoint) AS text_hash FROM corpus
),
entity_t AS (
  SELECT 'entity' AS "table",
         CAST(coalesce(sum(strlen(searchdomain) + strlen(entity)
                           + strlen(entity_probmethod)), 0) AS BIGINT)
           AS n_bytes
  FROM (SELECT DISTINCT searchdomain, entity, entity_probmethod FROM hashed)
),
datapoint_t AS (
  SELECT 'datapoint' AS "table",
         CAST(coalesce(sum(strlen(datapoint) + strlen(dp_probmethod)
                           + strlen(simmethod) + strlen(text_hash)),
                       0) AS BIGINT) AS n_bytes
  FROM (SELECT DISTINCT searchdomain, entity, datapoint, dp_probmethod,
               simmethod, text_hash FROM hashed)
),
embedding_t AS (
  SELECT 'embedding' AS "table",
         CAST(coalesce(sum(strlen(model) + len(vector) * 4), 0) AS BIGINT)
           AS n_bytes
  FROM hashed
)
SELECT * FROM entity_t UNION ALL
SELECT * FROM datapoint_t UNION ALL
SELECT * FROM embedding_t"""


def _snapshots(spark, sf_dir):
    """Planted create/modify/delete over documents:
      deleted  : doc_id % 7 == 3 removed from the current snapshot
      changed  : doc_id % 10 == 0 gets ' v2' appended
      new      : doc_id % 13 == 0 re-added as doc_id + 500000
    """
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    cur = (
        docs.filter(F.col("doc_id") % 7 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" v2"))
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 500000).alias("doc_id"), "text"
            )
        )
    )
    return cur, docs


def _keys(df):
    return df.select(
        F.lit("default").alias("searchdomain"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("entity"),
        F.lit("text").alias("datapoint"),
        F.sha2(F.col("text"), 256).alias("text_hash"),
    )


def q_reindex_diff(spark, sf_dir):
    """Snapshot-diff classification: every entity labeled new / changed /
    deleted / unchanged by stored-hash comparison — the batch equivalent
    of the reference's file-watcher event stream."""
    cur, idx = _snapshots(spark, sf_dir)
    return snapshot_diff(_keys(cur), _keys(idx))


REINDEX_DIFF_SQL = """WITH cur AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 3
  UNION ALL
  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 13 = 0
)
SELECT 'default' AS searchdomain,
       'doc_' || CAST(coalesce(c.doc_id, i.doc_id) AS VARCHAR) AS entity,
       CASE WHEN i.doc_id IS NULL THEN 'new'
            WHEN c.doc_id IS NULL THEN 'deleted'
            WHEN sha256(c.text) <> sha256(i.text) THEN 'changed'
            ELSE 'unchanged' END AS status
FROM cur c FULL JOIN documents i USING (doc_id)"""


def q_zorder_key(spark, sf_dir):
    """Morton z-value over (user_id, value) buckets for the z-order
    layout rewrite (`operators/zorder.zorder_write`): per-file min/max
    stays tight on BOTH columns once the write is range-partitioned by
    this key, so parquet footer stats skip files for selective filters
    on either. Buckets here are integer-exact expressions (pmod /
    half-unit floor) so the interleave arithmetic is reproducible
    bit-for-bit by the DuckDB oracle; `zorder_write` itself derives
    uniform buckets from data bounds (tests/test_zorder.py pins the
    file-stat quality)."""
    from embeddingsearch_spark.operators import zorder

    ev = tables.load(spark, sf_dir, "events")
    ub = F.pmod(F.col("user_id"), F.lit(256)).cast("bigint")
    vb = F.least(
        F.greatest(F.floor(F.col("value") * 2), F.lit(0)), F.lit(255)
    ).cast("bigint")
    return ev.select(
        "event_id", zorder.z_value([ub, vb], bits=8).alias("z")
    )


def _zorder_sql() -> str:
    terms = []
    for i in range(8):
        for j, b in enumerate(["ub", "vb"]):
            terms.append(f"((({b} >> {i}) & 1) << {i * 2 + j})")
    z = " | ".join(terms)
    return f"""WITH b AS (
  SELECT event_id,
         user_id % 256 AS ub,
         least(greatest(CAST(floor(value * 2) AS BIGINT), 0), 255) AS vb
  FROM events
)
SELECT event_id, CAST({z} AS BIGINT) AS z FROM b"""


ZORDER_KEY_SQL = _zorder_sql()


def q_global_ids(spark, sf_dir):
    """Dense 0-based global ids in doc_id order WITHOUT a global-sort
    single-partition window (`operators/ids.assign_global_ids`):
    range-partition + per-partition offsets, two passes, no task holds
    more than its partition. The id every sharded training-data writer
    needs."""
    from embeddingsearch_spark.operators import ids

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    return ids.assign_global_ids(docs, ["doc_id"])


GLOBAL_IDS_SQL = """
SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_id
FROM documents"""


QUERIES = {
    "database_size": (q_database_size, DATABASE_SIZE_SQL),
    "reindex_diff": (q_reindex_diff, REINDEX_DIFF_SQL),
    "zorder_key": (q_zorder_key, ZORDER_KEY_SQL),
    "global_ids": (q_global_ids, GLOBAL_IDS_SQL),
}
