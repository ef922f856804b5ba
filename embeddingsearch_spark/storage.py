"""Bucketed table layout — co-located joins without exchanges.

At 100 TB the recurring joins (index_flat ⋈ entities on (searchdomain,
entity); embeddings ⋈ datapoints on ids; fact ⋈ fact) shuffle both sides
every query unless the storage layout already agrees with the join key.
Writing both sides bucketed by the join key into the catalog lets Spark
plan a SortMergeJoin with ZERO Exchange operators (plan-tested): each
bucket pair joins in place, forever, for every downstream query.

Partitioning (searchdomain) prunes; bucketing (entity / key) co-locates.
The two compose: `partitionBy("searchdomain").bucketBy(n, "entity")`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Write ``df`` as a catalog table bucketed (and sorted) by
    ``bucket_cols``; joins/aggregations on those columns then need no
    exchange. ``n_buckets`` sets max join parallelism — size it to the
    cluster (buckets ≈ 2-4x total cores at target scale)."""
    writer = df.write.format(file_format).mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.bucketBy(n_buckets, *bucket_cols).sortBy(*bucket_cols).saveAsTable(
        table
    )
