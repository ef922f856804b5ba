"""Engine searchdomain-management parity (reference
SearchdomainController.cs:54-265, DatabaseHelper.cs:291-397): settings
round-trip, cache policy, rename/delete, size accounting, and the nested
/Entities projection with returnModels/returnEmbeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.api import Engine, SearchdomainSettings

INGEST_SCHEMA = (
    "searchdomain string, entity string, entity_probmethod string, "
    "attributes map<string,string>, datapoint string, dp_probmethod string, "
    "simmethod string, text string, models array<string>"
)


def _ingest(spark, domain, ents):
    return spark.createDataFrame(
        [
            (domain, e, "Mean", None, dp, "Mean", "Cosine", f"{e} {dp} text",
             ["mock:modelA", "mock:modelB"])
            for e in ents
            for dp in ("title", "text")
        ],
        INGEST_SCHEMA,
    )


@pytest.fixture()
def eng(spark):
    e = Engine(spark, dim=8)
    e.index_entities(_ingest(spark, "sd1", ["e1", "e2"]))
    return e


def test_settings_roundtrip_and_defaults(eng):
    s = eng.create_searchdomain("sd1", SearchdomainSettings(query_cache_size=-5))
    assert s.query_cache_size == 1_000_000  # reference default on <=0
    assert eng.get_settings("sd1").query_cache_size == 1_000_000
    eng.update_settings(
        "sd1", SearchdomainSettings(cache_reconciliation=False,
                                    query_cache_size=7)
    )
    got = eng.get_settings("sd1")
    assert (got.cache_reconciliation, got.query_cache_size) == (False, 7)
    with pytest.raises(ValueError):
        eng.create_searchdomain("sd1")
    with pytest.raises(KeyError):
        eng.get_settings("nope")


def test_cache_capacity_evicts_materialized_queries(eng):
    eng.create_searchdomain("sd1")
    for q in ("qa", "qb", "qc"):
        eng.materialize_query(q)
    eng.update_settings("sd1", SearchdomainSettings(query_cache_size=2))
    assert eng.query_cache_stats("sd1")["element_count"] == 2


def test_reconciliation_policy_invalidate(eng, spark):
    eng.create_searchdomain(
        "sd1", SearchdomainSettings(cache_reconciliation=False)
    )
    eng.materialize_query("probe")
    assert eng.query_cache_stats("sd1")["element_count"] == 1
    eng.index_entities(_ingest(spark, "sd1", ["e9"]))
    # policy False → invalidated, not repaired
    assert eng.query_cache_stats("sd1")["element_count"] == 0


def test_rename_and_delete_searchdomain(eng):
    eng.create_searchdomain("sd1")
    eng.materialize_query("probe")
    eng.rename_searchdomain("sd1", "sd_rn")
    domains = {r[0] for r in eng.list_searchdomains().collect()}
    assert domains == {"sd_rn"}
    assert eng.query_cache_stats("sd_rn")["element_count"] == 1
    n = eng.delete_searchdomain("sd_rn")
    assert n == 2
    assert eng.index_flat.count() == 0
    assert eng.query_results.count() == 0


def test_database_size_breakdown(eng):
    rows = {r["table"]: r["n_bytes"] for r in eng.database_size("sd1").collect()}
    assert set(rows) == {"entity", "datapoint", "embedding", "query_results"}
    # 2 entities × (sd1=3 + eN=2 + Mean=4) bytes
    assert rows["entity"] == 2 * (3 + 2 + 4)
    # 4 (entity, datapoint) rows; embedding = 8 rows × (model 11B + 8d×4B)
    assert rows["embedding"] == 8 * (11 + 32)
    assert rows["datapoint"] > 0 and rows["query_results"] == 0


def test_list_entities_full_projection(eng):
    flat = eng.list_entities_full("sd1").collect()
    assert len(flat) == 2
    assert all(r["datapoints"][0]["embeddings"] is None for r in flat)

    with_models = {
        r["entity"]: r for r in eng.list_entities_full(
            "sd1", return_models=True
        ).collect()
    }
    dps = with_models["e1"]["datapoints"]
    assert [d["datapoint"] for d in dps] == ["text", "title"]
    assert [e["model"] for e in dps[0]["embeddings"]] == [
        "mock:modelA", "mock:modelB"
    ]
    assert all(
        e["vector"] is None for d in dps for e in d["embeddings"]
    )

    with_vecs = eng.list_entities_full(
        "sd1", return_models=True, return_embeddings=True
    ).collect()
    vec = with_vecs[0]["datapoints"][0]["embeddings"][0]["vector"]
    assert vec is not None and len(vec) == 8

    with pytest.raises(ValueError):
        eng.list_entities_full("sd1", return_embeddings=True)
