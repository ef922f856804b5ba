"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (full scoring cascade) at sf0.001;
`queries()` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; `oracle_sql()` provides the DuckDB
twin for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from embeddingsearch_spark import oracle, tables
from embeddingsearch_spark.operators import search as search_op


def _q_search_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full two-level scoring cascade, per-row simmethod +
    probmethod dispatch, all queries × all domains (SURVEY.md §2.4 A13)."""
    corpus = tables.derive_corpus(spark, sf_dir)
    queries = tables.derive_queries(spark, sf_dir)
    return search_op.search(corpus, queries)


def _q_search_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade with topN=5 applied at read time (O1/O2)."""
    corpus = tables.derive_corpus(spark, sf_dir)
    queries = tables.derive_queries(spark, sf_dir)
    return search_op.search(corpus, queries, topn=5)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_search_cascade(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "search_cascade": _q_search_cascade,
        "search_top5": _q_search_top5,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "search_cascade": oracle.search_cascade_sql(),
        "search_top5": oracle.search_cascade_sql(topn=5),
    }
