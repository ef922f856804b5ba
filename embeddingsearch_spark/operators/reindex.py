"""Snapshot-diff classification (T4 Changed/Deleted, reference
Calls.cs:313-435): given the CURRENT snapshot's datapoint hash keys and
the INDEXED ones, classify every entity as new / changed / deleted /
unchanged using the reference's own change predicate — stored text-hash
comparison (SearchdomainHelper.cs:229-245).

All set operations run on (searchdomain, entity, datapoint, text_hash)
key columns only — vectors and raw text never join the diff, so at 100 TB
the diff costs a few co-partitioned joins over narrow key rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENT = ["searchdomain", "entity"]
KEY = ["searchdomain", "entity", "datapoint", "text_hash"]


def snapshot_diff(current_keys: DataFrame, indexed_keys: DataFrame) -> DataFrame:
    """(searchdomain, entity, status) for every entity in either snapshot.

    ``current_keys`` / ``indexed_keys``: rows of KEY shape (one per
    datapoint). Status: 'new' (current only), 'deleted' (indexed only),
    'changed' (both, any hash drift in either direction — covers edited
    AND removed datapoints), 'unchanged'.
    """
    cur = current_keys.select(*KEY).distinct()
    idx = indexed_keys.select(*KEY).distinct()
    cur_ents = cur.select(*ENT).distinct()
    idx_ents = idx.select(*ENT).distinct()

    new = cur_ents.join(idx_ents, ENT, "left_anti").withColumn(
        "status", F.lit("new")
    )
    deleted = idx_ents.join(cur_ents, ENT, "left_anti").withColumn(
        "status", F.lit("deleted")
    )
    both = cur_ents.join(idx_ents, ENT, "left_semi")
    drift = (
        cur.join(idx, KEY, "left_anti")
        .select(*ENT)
        .unionByName(idx.join(cur, KEY, "left_anti").select(*ENT))
        .distinct()
        .join(both, ENT, "left_semi")
    )
    changed = drift.withColumn("status", F.lit("changed"))
    unchanged = both.join(drift, ENT, "left_anti").withColumn(
        "status", F.lit("unchanged")
    )
    return new.unionByName(changed).unionByName(unchanged).unionByName(deleted)
