"""URL canonicalization for web-corpus pipelines: host extraction,
tracking-parameter stripping, canonical-form dedup keys.

Web-crawl training data dedups first by URL (exact, after
canonicalization) before any content hashing — it's free (no content
read) and catches the bulk of recrawl duplicates. All pure Catalyst
regexp/array expressions (codegen'd, scan-stage, zero shuffle), and every
pattern stays in the common Java-regex/RE2 subset (no lookaround) so the
DuckDB oracle reproduces canonical forms byte-for-byte.

The reference engine has no URL surface (SURVEY.md §2); this is part of
the training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never change page identity (analytics/click ids).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)="

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus default ports), ``www.`` stripped;
    '' for scheme-less strings."""
    host = F.lower(F.regexp_extract(url, _SCHEME_RE + r"([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def url_path(url: Column) -> Column:
    """Path component with trailing slashes stripped ('' for bare host)."""
    p = F.regexp_extract(url, _SCHEME_RE + r"[^/?#]+([^?#]*)", 1)
    return F.regexp_replace(p, r"/+$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking params removed and the rest sorted
    (param order never changes page identity); '' when nothing is left."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.array_join(kept, "&")


def canonical_url(url: Column) -> Column:
    """Canonical dedup key: host + path + surviving sorted query params.
    Scheme and fragment never distinguish documents; case-insensitive
    host, default ports, trailing slashes, tracking params all collapse."""
    q = url_query_canonical(url)
    return F.concat(
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
