"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (full scoring cascade) at sf0.001;
`queries()` maps every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) to a (spark, sf_dir) -> DataFrame callable;
`oracle_sql()` provides each one's DuckDB twin for the correctness gate.
The registry lives in embeddingsearch_spark/suite/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from embeddingsearch_spark.suite import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = all_queries()["search_cascade"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in all_queries().items() if sql is not None
    }
