"""Reference API surface as queries: models-in-use (A15), entity projection
(P2/P3, the /Entities list shape), per-domain stats (A14/F11 — the
Client API's database-size/stats calls, reference DatabaseHelper.cs:291-397).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.oracle import CORPUS_CTE


def q_models_in_use(spark, sf_dir):
    """Distinct model ids per searchdomain (reference Searchdomain.cs:260-282)."""
    corpus = tables.derive_corpus(spark, sf_dir)
    return corpus.select("searchdomain", "model").distinct()


MODELS_IN_USE_SQL = f"""WITH {CORPUS_CTE}
SELECT DISTINCT searchdomain, model FROM corpus"""


def q_entity_projection(spark, sf_dir):
    """/Entities list shape: per entity, probmethod + datapoint/model
    counts + sorted model list (reference EntityController.cs:42-86).
    The model list is rendered as a comma-joined string: the comparison
    harness canonicalizes results via pandas, which cannot hash ARRAY
    cells — scalar columns only in gated query outputs."""
    corpus = tables.derive_corpus(spark, sf_dir)
    return corpus.groupBy("searchdomain", "entity", "entity_probmethod").agg(
        F.countDistinct("datapoint").alias("n_datapoints"),
        F.count(F.lit(1)).alias("n_embeddings"),
        F.array_join(F.array_sort(F.collect_set("model")), ",").alias("models"),
    )


ENTITY_PROJECTION_SQL = f"""WITH {CORPUS_CTE}
SELECT searchdomain, entity, entity_probmethod,
       count(DISTINCT datapoint) AS n_datapoints,
       count(*) AS n_embeddings,
       array_to_string(list_sort(list(DISTINCT model)), ',') AS models
FROM corpus
GROUP BY searchdomain, entity, entity_probmethod"""


def q_domain_stats(spark, sf_dir):
    """Per-domain entity/datapoint/embedding counts + stored vector floats
    (reference ServerController stats + database-size accounting)."""
    corpus = tables.derive_corpus(spark, sf_dir)
    return corpus.groupBy("searchdomain").agg(
        F.countDistinct("entity").alias("n_entities"),
        F.countDistinct("entity", "datapoint").alias("n_datapoints"),
        F.count(F.lit(1)).alias("n_embeddings"),
        F.sum(F.size("vector")).alias("total_floats"),
    )


DOMAIN_STATS_SQL = f"""WITH {CORPUS_CTE}
SELECT searchdomain,
       count(DISTINCT entity) AS n_entities,
       count(DISTINCT entity || '/' || datapoint) AS n_datapoints,
       count(*) AS n_embeddings,
       CAST(sum(len(vector)) AS BIGINT) AS total_floats
FROM corpus
GROUP BY searchdomain"""


_EXTRA_CATALOG = [
    "mock:modelC",
    "other:alpha",
    "other:beta-old",
    "mock:legacy-old",
]


def q_model_catalog_filter(spark, sf_dir):
    """Model catalog + regex allow/deny filter (S7/P5, reference
    AIProvider.cs:135-216): models in use unioned with a static catalog,
    allowlist '^mock:', denylist '-old$', scheme/path split (F3)."""
    corpus = tables.derive_corpus(spark, sf_dir)
    catalog = corpus.select("model").distinct().unionByName(
        spark.createDataFrame([(m,) for m in _EXTRA_CATALOG], "model string")
    )
    return (
        catalog.filter(F.col("model").rlike("^mock:"))
        .filter(~F.col("model").rlike("-old$"))
        .select(
            "model",
            F.split("model", ":", 2).getItem(0).alias("provider"),
            F.split("model", ":", 2).getItem(1).alias("model_name"),
        )
    )


MODEL_CATALOG_FILTER_SQL = f"""WITH {CORPUS_CTE},
catalog AS (
  SELECT DISTINCT model FROM corpus
  UNION ALL
  SELECT * FROM (VALUES ('mock:modelC'), ('other:alpha'),
                        ('other:beta-old'), ('mock:legacy-old')) t(model)
)
SELECT model,
       split_part(model, ':', 1) AS provider,
       split_part(model, ':', 2) AS model_name
FROM catalog
WHERE regexp_matches(model, '^mock:')
  AND NOT regexp_matches(model, '-old$')"""


_FETCH_CATALOG = {
    "local": {
        "models": [
            {"name": "modelA"},
            {"name": "modelB"},
            {"name": "legacy-old"},
            {},
        ]
    },
    "oai": {
        "data": [{"id": "embed-3"}, {"id": "embed-2-old"}, {"id": "chat-x"}]
    },
}


def q_model_catalog_fetch(spark, sf_dir):
    """S7 end-to-end: the HTTP model-catalog FETCH (GET /api/tags and
    /v1/models, reference AIProvider.cs:135-211) through the injectable
    transport with a deterministic in-process catalog, then the same
    regex allow/deny + scheme-split surface as model_catalog_filter.
    The oracle replays the fixed catalog as VALUES — the wire plumbing
    is covered by mocked-transport tests (tests/test_model_catalog.py);
    here the driver gate pins the fetch→filter→split composition."""
    from embeddingsearch_spark.sources.catalog import (
        ProviderConfig,
        catalog_df,
    )

    providers = [
        ProviderConfig(
            "local", "ollama", "http://catalog.test:11434",
            allowlist=(".*",), denylist=("-old$",),
        ),
        ProviderConfig(
            "oai", "openai", "http://catalog.test", api_key="sk-test",
            allowlist=("^embed-",), denylist=("-old$",),
        ),
    ]

    def transport(url, headers, timeout):
        return _FETCH_CATALOG["local" if "/api/tags" in url else "oai"]

    df = catalog_df(spark, providers, transport=transport)
    return df.select(
        "model",
        F.split("model", ":", 2).getItem(0).alias("provider"),
        F.split("model", ":", 2).getItem(1).alias("model_name"),
    )


MODEL_CATALOG_FETCH_SQL = """WITH catalog AS (
  SELECT * FROM (VALUES ('local:modelA'), ('local:modelB'),
                        ('oai:embed-3')) t(model)
)
SELECT model,
       split_part(model, ':', 1) AS provider,
       split_part(model, ':', 2) AS model_name
FROM catalog"""


def q_search_attributes(spark, sf_dir):
    """Search with returnAttributes=true (P2/J2, reference
    SearchdomainController.cs:159-169): top-5 ranking joined to the
    entities' attribute MAP, rendered as a sorted 'k=v;...' string so two
    independent engines compare map contents deterministically."""
    from embeddingsearch_spark.suite.scoring import cascade_shared

    # top-5 read over the shared materialized ranking (rank_results
    # applies topn as exactly this filter), then the attribute join —
    # only the join is this query's own work
    ranked = cascade_shared(spark, sf_dir).filter(F.col("rank") <= 5)
    ents = tables.derive_entity_attrs(spark, sf_dir)
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.map_entries("attributes")),
            lambda kv: F.concat(kv["key"], F.lit("="), kv["value"]),
        ),
        ";",
    )
    return ranked.join(ents.select("searchdomain", "entity", "attributes"),
                       ["searchdomain", "entity"]).select(
        "searchdomain", "query", "entity", "score", "rank",
        rendered.alias("attrs"),
    )


def _search_attributes_sql() -> str:
    from embeddingsearch_spark.oracle import search_cascade_sql

    return f"""WITH res AS ({search_cascade_sql(topn=5)}),
attrs AS (
  SELECT DISTINCT
    'sd_' || CAST((vec_id // 6) % 2 AS VARCHAR) AS searchdomain,
    'ent_' || lpad(CAST(vec_id // 6 AS VARCHAR), 6, '0') AS entity,
    'k' || CAST((vec_id // 6) % 3 AS VARCHAR) || '=v'
        || CAST((vec_id // 6) % 5 AS VARCHAR)
        || ';lang=' || (CASE ((vec_id // 6) % 4) WHEN 0 THEN 'de'
             WHEN 1 THEN 'en' WHEN 2 THEN 'es' ELSE 'fr' END)
        || ';source=ent_' || lpad(CAST(vec_id // 6 AS VARCHAR), 6, '0')
      AS attrs
  FROM embeddings
)
SELECT r.searchdomain, r.query, r.entity, r.score, r.rank, a.attrs
FROM res r JOIN attrs a
  ON r.searchdomain = a.searchdomain AND r.entity = a.entity"""


QUERIES = {
    "models_in_use": (q_models_in_use, MODELS_IN_USE_SQL),
    "entity_projection": (q_entity_projection, ENTITY_PROJECTION_SQL),
    "domain_stats": (q_domain_stats, DOMAIN_STATS_SQL),
    "model_catalog_filter": (q_model_catalog_filter, MODEL_CATALOG_FILTER_SQL),
    "model_catalog_fetch": (q_model_catalog_fetch, MODEL_CATALOG_FETCH_SQL),
    "search_attributes": (q_search_attributes, _search_attributes_sql()),
}
