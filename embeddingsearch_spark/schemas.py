"""Canonical table schemas of the engine (SURVEY.md §1.6 Spark mapping).

The reference's MySQL row store (reference DatabaseMigrations.cs:81-96) maps
to columnar tables partitioned by `searchdomain`; its own migrations 7-9
denormalized `embedding` toward a pre-joined layout, which argues for the
wide `index_flat` scan table below as the serving layout at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

# searchdomain settings (reference SearchdomainModels.cs:98-106).
SEARCHDOMAINS = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("cache_reconciliation", T.BooleanType(), True),
        T.StructField("query_cache_size", T.IntegerType(), True),
    ]
)

# entity + attributes as MAP (replaces the reference's `attribute` table,
# reference Entity.cs:5-14).
ENTITIES = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("probmethod", T.StringType(), False),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# datapoint: named text field of an entity; raw text is NOT stored, only its
# hash (reference Datapoint.cs:7-34, SearchdomainHelper.cs:455-458).
DATAPOINTS = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("datapoint", T.StringType(), False),
        T.StructField("probmethod", T.StringType(), False),
        T.StructField("simmethod", T.StringType(), False),
        T.StructField("text_hash", T.StringType(), False),
    ]
)

# one vector per (datapoint, model); ARRAY<FLOAT> replaces the BLOB encoding
# (reference SearchdomainHelper.cs:18-31 — byte packing not needed in parquet).
EMBEDDINGS = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("datapoint", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

# pre-joined scan-optimal layout (reference's own denormalization endpoint,
# DatabaseMigrations.cs:117-157): one row per (entity, datapoint, model).
INDEX_FLAT = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("entity_probmethod", T.StringType(), False),
        T.StructField("datapoint", T.StringType(), False),
        T.StructField("dp_probmethod", T.StringType(), False),
        T.StructField("simmethod", T.StringType(), False),
        T.StructField("text_hash", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

# content-addressed embedding cache (replaces LRU + SQLite store,
# reference CacheHelper.cs:12-137).
EMBEDDING_CACHE = T.StructType(
    [
        T.StructField("text_hash", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

# materialized query results (replaces the reference's in-memory LRU query
# cache, Searchdomain.cs:22 — a table, not an eviction cache).
QUERY_RESULTS = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("query", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("computed_at", T.TimestampType(), True),
    ]
)

# ingest wire format (reference JSONModels.cs:3-19), flattened one row per
# datapoint; `text` present at ingest, dropped after hashing+embedding.
INGEST_DATAPOINTS = T.StructType(
    [
        T.StructField("searchdomain", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("entity_probmethod", T.StringType(), False),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("datapoint", T.StringType(), False),
        T.StructField("dp_probmethod", T.StringType(), False),
        T.StructField("simmethod", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("models", T.ArrayType(T.StringType()), False),
    ]
)
