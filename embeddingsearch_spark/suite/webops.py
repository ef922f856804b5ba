"""Web-corpus queries: URL canonicalization/dedup and domain blocklist
filtering over deterministically planted URLs (the documents table has no
URL column, so each doc gets a synthetic URL that exercises every
canonicalization rule: case, default ports, www, trailing slash,
tracking params, param order, fragments).

Planted shape (doc_id % 4):
  0: https://WWW.Example{k}.com:443/a/b/?utm_source=feed&b=2&a=1
  1: https://example{k}.com/a/b?b=2&a=1          (same canon as case 0!)
  2: http://news.site{j}.org/x/{doc_id}/index.html#frag  (unique)
  3: https://cdn.example{k}.com/assets/img{m}.png?gclid=abc
with k = doc_id % 5, j = doc_id % 3, m = doc_id % 11 — so cases 0 and 1
collapse into 5 big canonical groups and the rest form smaller ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.functions.urls import TRACKING_PARAM_RE
from embeddingsearch_spark.operators import urldedup

_BLOCKED_DOMAINS = ["cdn.example0.com", "cdn.example3.com"]
_BLOCKED_SUFFIXES = [".org"]


def _planted_urls(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("https://WWW.Example"), s(d % 5),
                F.lit(".com:443/a/b/?utm_source=feed&b=2&a=1"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("https://example"), s(d % 5), F.lit(".com/a/b?b=2&a=1")
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("http://news.site"), s(d % 3), F.lit(".org/x/"),
                s(d), F.lit("/index.html#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn.example"), s(d % 5), F.lit(".com/assets/img"),
                s(d % 11), F.lit(".png?gclid=abc"),
            )
        )
    )
    return docs.select("doc_id", url.alias("url"))


_URL_CASE_SQL = """CASE doc_id % 4
      WHEN 0 THEN 'https://WWW.Example' || (doc_id % 5)
                  || '.com:443/a/b/?utm_source=feed&b=2&a=1'
      WHEN 1 THEN 'https://example' || (doc_id % 5) || '.com/a/b?b=2&a=1'
      WHEN 2 THEN 'http://news.site' || (doc_id % 3) || '.org/x/'
                  || doc_id || '/index.html#frag'
      ELSE 'https://cdn.example' || (doc_id % 5) || '.com/assets/img'
           || (doc_id % 11) || '.png?gclid=abc'
    END"""

# DuckDB twin of functions/urls.py (RE2-compatible patterns, same steps).
_Q_KEPT_SQL = (
    "list_sort(list_filter(string_split("
    r"regexp_extract(url, '\?([^#]*)', 1), '&'), "
    f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
)

_PARTS_SQL = rf"""parts AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      '^www\.', ''), ':(80|443)$', '') AS host,
    regexp_replace(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
      '/+$', '') AS path,
    coalesce(array_to_string({_Q_KEPT_SQL}, '&'), '') AS q
  FROM u
),
canon AS (
  SELECT doc_id, host AS domain,
         host || path
         || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon_url
  FROM parts
)"""


def q_url_normalize(spark, sf_dir):
    """Canonical-URL dedup over the planted corpus: every canonicalization
    rule collapses somewhere (cases 0 and 1 become one group per k).
    Scan-stage regexes; one (id, canon)-only groupBy — content never
    shuffles."""
    return urldedup.url_duplicates(_planted_urls(spark, sf_dir), "doc_id", "url")


URL_NORMALIZE_SQL = f"""WITH u AS (
  SELECT doc_id, {_URL_CASE_SQL} AS url FROM documents
),
{_PARTS_SQL},
g AS (
  SELECT canon_url, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM canon GROUP BY canon_url
)
SELECT c.doc_id, c.domain, c.canon_url, g.canonical_id, g.group_size,
       g.group_size > 1 AS is_duplicate
FROM canon c JOIN g USING (canon_url)"""


def q_domain_blocklist(spark, sf_dir):
    """Blocklist filter over the planted URLs: two exact cdn domains
    (broadcast anti-join) plus the '.org' suffix rule (scan-stage
    endswith) — returns surviving (doc_id, domain)."""
    kept = urldedup.filter_blocked_domains(
        _planted_urls(spark, sf_dir),
        "url",
        blocked=_BLOCKED_DOMAINS,
        blocked_suffixes=_BLOCKED_SUFFIXES,
    )
    from embeddingsearch_spark.functions.urls import url_host

    return kept.select("doc_id", url_host(F.col("url")).alias("domain"))


_BLOCKED_IN = ", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)

DOMAIN_BLOCKLIST_SQL = f"""WITH u AS (
  SELECT doc_id, {_URL_CASE_SQL} AS url FROM documents
),
{_PARTS_SQL}
SELECT doc_id, domain FROM canon
WHERE domain NOT IN ({_BLOCKED_IN})
  AND NOT suffix(domain, '.org')"""


def q_pagerank(spark, sf_dir):
    """PageRank over a planted hub/authority link graph (each doc links
    to its decade hub and century hub — power-law-ish in-degree, the
    domain-authority signal web curation gates on): 3 power iterations,
    damping 0.85, one declarative pass per iteration with the rank
    frame checkpointed (the k-means lineage discipline). The oracle
    replays every iteration as chained CTEs."""
    from embeddingsearch_spark.operators.graph import pagerank

    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    decade = docs.select(
        d.alias("src"), (d - d % 10).alias("dst")
    )
    century = docs.select(
        d.alias("src"), (d - d % 100).alias("dst")
    )
    edges = (
        decade.union(century)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pagerank(edges, iters=3, damping=0.85).select(
        F.col("node").alias("doc_id"), "rank"
    )


def _pagerank_iter_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""c{i} AS (
  SELECT e.dst AS node, sum({prev}.rank / deg.deg) AS m
  FROM e JOIN {prev} ON {prev}.node = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node, 0.15 + 0.85 * coalesce(c{i}.m, 0) AS rank
  FROM nodes n LEFT JOIN c{i} USING (node)
)"""


PAGERANK_SQL = f"""WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, doc_id - doc_id % 10 AS dst FROM documents
    UNION ALL
    SELECT doc_id, doc_id - doc_id % 100 FROM documents
  ) WHERE src != dst
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 AS rank FROM nodes),
{_pagerank_iter_sql(1)},
{_pagerank_iter_sql(2)},
{_pagerank_iter_sql(3)}
SELECT node AS doc_id, round(rank, 6) AS rank FROM r3"""


QUERIES = {
    "url_normalize": (q_url_normalize, URL_NORMALIZE_SQL),
    "domain_blocklist": (q_domain_blocklist, DOMAIN_BLOCKLIST_SQL),
    "pagerank": (q_pagerank, PAGERANK_SQL),
}
