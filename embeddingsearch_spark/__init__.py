"""embeddingsearch_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of LD-Reborn/embeddingsearch.

The reference (`/root/reference/`, C#/.NET) is an online semantic-search
server over vector embeddings: a four-level data model
(searchdomain > entity > datapoint > per-model embedding) queried by a
two-level aggregation cascade (per-model vector similarity folded by a
configurable "probmethod" per datapoint, folded again per entity, ranked
top-N).  This package re-expresses those semantics as idiomatic Spark
DataFrame pipelines designed for 100-TB batch scale, plus the
LLM-training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) that a large corpus engine needs.

Layout:
    session      — tuned SparkSession builder
    schemas      — canonical StructTypes for the engine's tables
    tables       — testdata loaders + deterministic fixture derivation
    constants    — declared numeric semantics (EPS, rounding)
    functions/   — similarity kernels, probmethod aggregates, text functions
    operators/   — search cascade, top-k, upsert/diff, dedup, ANN, stats
    sources/     — file/document sources, deterministic embedder, providers
    streaming/   — Structured Streaming ingest (file-watch equivalent)
    api          — library-level equivalent of the reference's Client API
"""

__version__ = "0.1.0"
