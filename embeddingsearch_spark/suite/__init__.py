"""Query suite: every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) as a (spark_fn, oracle_sql) pair.

Each module exposes ``QUERIES: dict[name, (fn, sql | None)]`` where ``fn``
takes (spark, sf_dir) → DataFrame and ``sql`` is the DuckDB twin (None for
non-SQL-expressible ops → driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from embeddingsearch_spark.suite import (
        adminops,
        ann,
        cleanops,
        dedup,
        maintenance,
        multimodalops,
        reference_surface,
        relational,
        retrievalops,
        scoring,
        streamingops,
        textops,
        webops,
        windowops,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        scoring,
        reference_surface,
        relational,
        maintenance,
        dedup,
        textops,
        ann,
        streamingops,
        multimodalops,
        windowops,
        adminops,
        webops,
        cleanops,
        retrievalops,
    ):
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    return out
