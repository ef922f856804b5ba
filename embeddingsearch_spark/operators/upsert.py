"""Index-maintenance operators: the reference's upsert diff taxonomy,
session finalize, and embedding-cache hit/miss split — as set-operation
DataFrame pipelines (SURVEY.md §2.3 J6-J8, §2.7 E1-E3).

At scale these are the MERGE building blocks: `classify_changes` is the
WHEN MATCHED/NOT MATCHED classification of a Delta MERGE, computed
explicitly so it can be tested and so re-embedding is limited to rows whose
text hash actually changed (reference SearchdomainHelper.cs:209-343).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_changes(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    hash_col: str = "text_hash",
    method_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Full-outer diff of two datapoint sets keyed by ``keys``:

      insert        — key only in ``new``              (:355-401)
      delete        — key only in ``old``              (J5/J6)
      update_text   — hash differs → re-embed          (:229-245)
      update_method — hash same, a method col differs  (:330-343)
      unchanged     — everything matches

    (cites into reference SearchdomainHelper.cs). Returns keys +
    ``change_type``.
    """
    o = old.select(
        *keys,
        F.col(hash_col).alias("_old_hash"),
        *[F.col(c).alias(f"_old_{c}") for c in method_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys,
        F.col(hash_col).alias("_new_hash"),
        *[F.col(c).alias(f"_new_{c}") for c in method_cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    method_changed = F.lit(False)
    for c in method_cols:
        method_changed = method_changed | (
            F.coalesce(F.col(f"_old_{c}") != F.col(f"_new_{c}"), F.lit(False))
        )
    change = (
        F.when(F.col("_in_old").isNull(), "insert")
        .when(F.col("_in_new").isNull(), "delete")
        .when(F.col("_old_hash") != F.col("_new_hash"), "update_text")
        .when(method_changed, "update_method")
        .otherwise("unchanged")
    )
    return j.select(*keys, change.alias("change_type"))


def session_finalize_deletes(
    existing: DataFrame, uploaded: DataFrame, keys: list[str]
) -> DataFrame:
    """Entities present before but absent from the accumulated upload set —
    the session-complete delete list (reference EntityController.cs:163-199,
    the in-memory anti-join at :177-180)."""
    return existing.join(uploaded, keys, "left_anti").select(*keys).distinct()


def reconcile_store(
    store: DataFrame,
    desired: DataFrame,
    keys: list[str] | None = None,
    capacity: int | None = None,
    recency_col: str | None = None,
) -> DataFrame:
    """Persistent-store reconciliation (E1-E3, reference
    CacheHelper.cs:44-137): classify every key between the on-disk store
    and the desired (in-memory) state —

      delete — in store, not desired   (store−cache, :64-75)
      insert — desired, not in store   (cache−store, :82-96)
      keep   — present in both

    All three of the reference's loops collapse into one full-outer join:
    the WHEN MATCHED / NOT MATCHED [BY SOURCE] arms of a MERGE.

    ``capacity`` reproduces the reference's StoreTopN semantics
    (CacheHelper.UpdateEmbeddingStore sets the LRU capacity to
    ``options.Cache.StoreTopN`` before reconciling, :44-49;
    docs/Server.md:78-81): only the ``capacity`` most-recently-used
    desired entries persist — recency = max(``recency_col``) per key,
    ties broken by the keys ascending. Evicted entries behave exactly
    as not-desired (store-resident → 'delete'; absent → no row), which
    is what the reference's truncated LRU enumeration produces.
    Capacity is config-scale (10k default in the reference), so the cap
    is a TakeOrdered (per-partition top-N + driver merge), never a
    global sort."""
    keys = keys or ["text_hash", "model"]
    s = store.select(*keys).distinct().withColumn("_in_store", F.lit(True))
    if capacity is not None:
        if recency_col is None:
            raise ValueError("capacity requires recency_col")
        d = (
            desired.groupBy(*keys)
            .agg(F.max(recency_col).alias("_recency"))
            .orderBy(
                F.col("_recency").desc(),
                *[F.col(k).asc() for k in keys],
            )
            .limit(capacity)
            .select(*keys)
        )
    else:
        d = desired.select(*keys).distinct()
    d = d.withColumn("_in_desired", F.lit(True))
    j = s.join(d, keys, "full_outer")
    action = (
        F.when(F.col("_in_desired").isNull(), "delete")
        .when(F.col("_in_store").isNull(), "insert")
        .otherwise("keep")
    )
    return j.select(*keys, action.alias("action"))


def cache_split(
    requested: DataFrame, cache: DataFrame, keys: list[str] = None
) -> DataFrame:
    """Tag each requested (text_hash, model) as cache 'hit' or 'miss'
    (reference Datapoint.cs:67-110: hits skip embedding generation).
    Returns ``requested`` + ``cache_status``."""
    keys = keys or ["text_hash", "model"]
    c = cache.select(*keys).distinct().withColumn("_cached", F.lit(True))
    j = requested.join(c, keys, "left_outer")
    return j.withColumn(
        "cache_status",
        F.when(F.col("_cached").isNotNull(), "hit").otherwise("miss"),
    ).drop("_cached")
