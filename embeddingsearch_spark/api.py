"""Library-level equivalent of the reference's Client API
(reference Client.cs:39-241 — Entities list/index/delete, Searchdomain
query, Server models/stats) as calls over DataFrames/tables instead of HTTP.

State is two tables (kept as DataFrames; persist with ``save``/``load`` for
cross-session use): ``index_flat`` and ``embedding_cache``. On a cluster
these would be Delta/parquet tables partitioned by ``searchdomain``; the
operators underneath are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embeddingsearch_spark import schemas
from embeddingsearch_spark.operators import index_build, search as search_op
from embeddingsearch_spark.sources.embedder import (
    DEFAULT_DIM,
    deterministic_embedding,
)


class Engine:
    def __init__(self, spark: SparkSession, dim: int = DEFAULT_DIM):
        self.spark = spark
        self.dim = dim
        self.index_flat = spark.createDataFrame([], schemas.INDEX_FLAT)
        self.embedding_cache = spark.createDataFrame([], schemas.EMBEDDING_CACHE)
        self.query_results = spark.createDataFrame(
            [],
            "searchdomain string, query string, entity string, "
            "score double, rank int",
        )

    # -- indexing (PUT /Entities equivalent) --------------------------------

    def index_entities(self, ingest: DataFrame) -> index_build.BuildResult:
        """Upsert entities from INGEST_DATAPOINTS-shaped rows; re-embeds
        only cache misses (hash change detection). Materialized query
        results are repaired incrementally for the touched entities
        (reference cache reconciliation, Searchdomain.cs:298-326)."""
        cache = self.embedding_cache.withColumn(
            "vector", F.col("vector").cast("array<double>")
        )
        result = index_build.build_index(
            ingest, cache, self.dim, materialize_embedded=True
        )
        # Materialize before self-referential reassignment.
        new_index = index_build.merge_index(
            self.index_flat.withColumn(
                "vector", F.col("vector").cast("array<double>")
            ),
            result.index_flat,
        ).localCheckpoint(eager=True)
        new_cache = cache.unionByName(
            result.new_cache_entries.drop("text")
        ).localCheckpoint(eager=True)
        self.index_flat = new_index
        self.embedding_cache = new_cache
        touched = result.index_flat.select("searchdomain", "entity").distinct()
        self._reconcile_query_results(touched)
        return result

    def finalize_session(self, uploaded: DataFrame) -> None:
        """Delete entities absent from the uploaded set (session complete)."""
        self.index_flat = index_build.finalize_session(
            self.index_flat, uploaded
        ).localCheckpoint(eager=True)
        self._drop_deleted_from_results()

    def delete_entities(self, names: DataFrame) -> None:
        self.index_flat = index_build.delete_entities(
            self.index_flat, names
        ).localCheckpoint(eager=True)
        self._drop_deleted_from_results()

    def _drop_deleted_from_results(self) -> None:
        """Remove rankings rows for entities no longer indexed, re-rank."""
        if not self.query_results.head(1):
            return
        remaining = self.query_results.join(
            self.index_flat.select("searchdomain", "entity").distinct(),
            ["searchdomain", "entity"],
            "left_semi",
        ).select("searchdomain", "query", "entity", "score")
        self.query_results = search_op.rank_results(
            remaining
        ).localCheckpoint(eager=True)

    # -- querying (POST /Searchdomain/Query equivalent) ---------------------

    def search(
        self,
        query: str,
        searchdomain: str | None = None,
        topn: int | None = None,
    ) -> DataFrame:
        """Score every entity against the query text (embedded per model in
        use) and rank (reference Searchdomain.cs:183-210)."""
        models = self.models_in_use()
        queries = models.select(
            F.lit(query).alias("query"),
            "model",
            deterministic_embedding(F.lit(query), F.col("model"), self.dim).alias(
                "vector"
            ),
        )
        return search_op.search(self.index_flat, queries, searchdomain, topn)

    # -- materialized query results (X1/X2) ---------------------------------

    def materialize_query(
        self, query: str, searchdomain: str | None = None
    ) -> None:
        """Materialize the full ranking for ``query`` (the reference's
        query-cache entry, as a table row-set — X1). Idempotent: an
        existing materialization for the same query is replaced."""
        fresh = self.search(query, searchdomain=searchdomain).withColumn(
            "query", F.lit(query)
        ).select("searchdomain", "query", "entity", "score", "rank")
        kept = self.query_results.join(
            fresh.select("searchdomain", "query").distinct(),
            ["searchdomain", "query"],
            "left_anti",
        )
        self.query_results = kept.unionByName(fresh).localCheckpoint(
            eager=True
        )

    def cached_queries(self) -> DataFrame:
        """Distinct materialized (searchdomain, query) pairs (the
        reference's GetQueries listing)."""
        return self.query_results.select("searchdomain", "query").distinct()

    def read_results(
        self, query: str, searchdomain: str | None = None, topn: int | None = None
    ) -> DataFrame:
        """Read a materialized ranking; topN over the FULL ranking
        (declared deviation from the reference's truncated cache)."""
        from embeddingsearch_spark.operators import query_cache

        return query_cache.read_results(
            self.query_results, query=query, searchdomain=searchdomain, topn=topn
        )

    def _reconcile_query_results(self, touched: DataFrame) -> None:
        """X2: re-score ONLY touched entities for every materialized
        query and splice into the kept rankings.

        Fully set-based: query vectors are derived from the cached-query
        DataFrame itself (deterministic_embedding is a Column expression),
        models broadcast onto it — no ``collect()`` of query strings, no
        per-query plan growth. At the reference's default cache size
        (1M queries/domain, SearchdomainModels.cs:98) the old driver-side
        loop would OOM the driver and build a million-way union plan."""
        from embeddingsearch_spark.operators import query_cache

        if not self.query_results.head(1):
            return
        qvecs = (
            self.cached_queries()
            .select("query")
            .distinct()
            .crossJoin(F.broadcast(self.models_in_use()))
            .select(
                "query",
                "model",
                deterministic_embedding(
                    F.col("query"), F.col("model"), self.dim
                ).alias("vector"),
            )
        )
        self.query_results = query_cache.incremental_refresh(
            self.query_results,
            self.index_flat.withColumn(
                "vector", F.col("vector").cast("array<double>")
            ),
            qvecs,
            touched,
        ).localCheckpoint(eager=True)

    # -- surface parity with the reference Client ---------------------------

    def list_entities(self, searchdomain: str | None = None) -> DataFrame:
        """/Entities list shape (reference EntityController.cs:42-86)."""
        df = self.index_flat
        if searchdomain is not None:
            df = df.filter(F.col("searchdomain") == searchdomain)
        return df.groupBy("searchdomain", "entity", "entity_probmethod").agg(
            F.countDistinct("datapoint").alias("n_datapoints"),
            F.count(F.lit(1)).alias("n_embeddings"),
            F.array_sort(F.collect_set("model")).alias("models"),
        )

    def models_in_use(self) -> DataFrame:
        """Distinct models (reference Searchdomain.cs:260-282)."""
        return self.index_flat.select("model").distinct()

    def stats(self) -> DataFrame:
        """Per-domain size stats (reference ServerController stats)."""
        return self.index_flat.groupBy("searchdomain").agg(
            F.countDistinct("entity").alias("n_entities"),
            F.count(F.lit(1)).alias("n_embeddings"),
            F.sum(F.size("vector")).alias("total_floats"),
        )

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        """Write both tables partitioned by searchdomain (the 100-TB layout:
        partition pruning replaces the reference's per-domain caches)."""
        self.index_flat.write.partitionBy("searchdomain").mode(
            "overwrite"
        ).parquet(f"{path}/index_flat")
        self.embedding_cache.write.mode("overwrite").parquet(
            f"{path}/embedding_cache"
        )

    def load(self, path: str) -> None:
        self.index_flat = self.spark.read.parquet(f"{path}/index_flat")
        self.embedding_cache = self.spark.read.parquet(f"{path}/embedding_cache")
