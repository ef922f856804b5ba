"""Derived realistic corpus: Zipfian vocabulary + per-language
character distributions, deterministically synthesized from the
driver's documents table.

The driver's synthetic `documents.text` has a ~100-word shared
vocabulary and a `lang` column uncorrelated with the text. That shape
makes every retrieval query match nearly every document (the dense
|Q|·|D| worst case recorded in BASELINE.md) and leaves the trained
language-ID nothing real to discriminate. This module derives — at
query time, from (doc_id, lang) only — a corpus whose text actually
has the two properties web text has:

- **Zipfian token frequencies.** Token ranks come from the classic
  inverse-CDF trick: with u ~ U[0,1), rank = floor(V^u) is ≈ Zipf(1)
  over a V=2000-word vocabulary (P(rank≈r) ∝ 1/r). A handful of
  high-rank words dominate (the BM25 non-essential tail) while most of
  the vocabulary is rare (the discriminative head) — so retrieval
  queries have realistic mixed selectivity instead of matching
  everything.
- **Per-language character distributions.** Each word is the md5 of
  its (lang, rank) key transliterated onto a 16-letter per-language
  alphabet (hex digit -> letter). Languages therefore share NO tokens,
  have distinct letter statistics (umlauts/ß for de, accents for
  fr/es, ñ for es, hanzi for zh), and correlate exactly with the
  `lang` label — what a char-n-gram language model needs to
  demonstrate real held-out accuracy.

Everything is hash arithmetic over (doc_id, lang): both engines build
the identical corpus independently (md5, substr, translate, power —
the established oracle-portable subset), so gated queries over the
derived corpus remain fully value-oracled. The only cross-engine risk
is floor(pow(..)) at an exact integer boundary, which needs the true
value within 1 ulp of an integer — probability ~1e-13 per token.

Word length varies 3..7 chars by rank (3 + rank % 5); doc length
varies 30..119 words by doc hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables

# Zipf vocabulary size per language.
VOCAB = 2000

_HEX = "0123456789abcdef"

# hex-digit -> letter transliteration alphabets: 16 letters each,
# ordered roughly by the language's letter frequency, with
# language-distinctive characters included.
ALPHAS = {
    "de": "enisratdhulcgmöß",
    "en": "etaoinshrdlucmfw",
    "es": "eaosrnidltcmupñé",
    "fr": "esaitnrulodcpémè",
    "zh": "的一是不了人我在有他这中大来上国",
}


def _h32(col):
    """First 8 hex chars of md5 as a non-negative long (the
    engine-portable uniform hash used across the splits/mixing ops)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def derive_realistic_docs(spark, sf_dir):
    """(doc_id, lang, source, text): the derived corpus, one row per
    document of the driver's documents table. Pure scan-stage column
    arithmetic — no shuffle of text, no UDF; ~2 md5 evaluations per
    token.

    The ~75-md5-pairs-per-doc synthesis is the expensive part, so the
    narrow (doc_id, lang, source) base rows are spread across the
    cluster BEFORE the text columns exist (guide §2.5 input skew:
    documents.parquet is a single row group, so deriving first would
    run the whole synthesis in ONE task — measured 1.2-1.8 s
    single-threaded per materialization at sf0.1 vs ~0.1 s spread).
    Shuffling 3 small columns costs ~KBs; the synthesized text never
    shuffles. Text values are per-row deterministic, so the result is
    identical under any partitioning."""
    return realistic_text(
        tables.load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def realistic_text(docs):
    """Apply the derivation to any (doc_id, lang, source) frame —
    batch or STREAMING (stateless column arithmetic, so the streaming
    ingest path can synthesize the same corpus per micro-batch)."""
    did = F.col("doc_id").cast("string")
    n_words = (
        F.lit(30) + _h32(F.concat(F.lit("rdlen:"), did)) % 90
    ).cast("int")

    def rank(i):
        u = _h32(
            F.concat(F.lit("rd:"), did, F.lit(":"), i.cast("string"))
        ) / F.lit(4294967296.0)
        return F.least(
            F.lit(VOCAB - 1),
            F.greatest(F.lit(1), F.floor(F.pow(F.lit(float(VOCAB)), u))),
        ).cast("long")

    def word(r):
        sub = F.md5(
            F.concat(F.col("lang"), F.lit("#"), r.cast("string"))
        ).substr(F.lit(1), (F.lit(3) + (r % 5)).cast("int"))
        expr = None
        for lang, alpha in ALPHAS.items():
            branch = F.translate(sub, _HEX, alpha)
            expr = (
                F.when(F.col("lang") == lang, branch)
                if expr is None
                else expr.when(F.col("lang") == lang, branch)
            )
        return expr.otherwise(F.translate(sub, _HEX, ALPHAS["en"]))

    ranks = F.transform(F.sequence(F.lit(1), n_words), rank)
    words = F.transform(ranks, word)
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_join(words, " ").alias("text"),
    )


def _word_case_sql(r: str) -> str:
    branches = "\n      ".join(
        f"WHEN '{lang}' THEN translate(substr(md5('{lang}#' || "
        f"CAST({r} AS VARCHAR)), 1, CAST(3 + {r} % 5 AS INT)), "
        f"'{_HEX}', '{alpha}')"
        for lang, alpha in ALPHAS.items()
    )
    en = (
        f"translate(substr(md5('en#' || CAST({r} AS VARCHAR)), 1, "
        f"CAST(3 + {r} % 5 AS INT)), '{_HEX}', '{ALPHAS['en']}')"
    )
    return f"CASE lang {branches}\n      ELSE {en} END"


_RANK_SQL = (
    "CAST(least(1999, greatest(1, CAST(floor(power(2000.0, "
    "CAST(('0x' || substr(md5('rd:' || CAST(doc_id AS VARCHAR) || ':' "
    "|| CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0)) "
    "AS BIGINT))) AS BIGINT)"
)

def derive_realistic_embeddings(spark, sf_dir, dim: int = 32):
    """(vec_id, embedding ARRAY<DOUBLE>[dim]) — doc embeddings
    CORRELATED with the derived text: the bag-of-hashed-tokens
    projection v[j] = Σ_tokens (nibble_j(md5(token)) − 7.5), j in
    1..dim (dim ≤ 32, md5's hex width).

    Same-language docs share their Zipf head tokens, so the embedding
    space has real cluster structure (5 language clusters + rare-token
    topical variation) instead of the uniform-random vectors of the
    driver's embeddings table — the structure graph/semantic ANN
    operators exist to exploit. Every summand is an exact multiple of
    0.5, so float64 sums are EXACT and order-independent — both
    engines derive identical vectors regardless of aggregation order.
    """
    if not 1 <= dim <= 32:
        raise ValueError("dim must be in 1..32 (md5 hex width)")
    rd = derive_realistic_docs(spark, sf_dir)
    toks = rd.select(
        F.col("doc_id"), F.explode(F.split("text", " ")).alias("_t")
    ).select(F.col("doc_id"), F.md5("_t").alias("_h"))
    nibbles = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.conv(F.col("_h").substr(i, F.lit(1)), 16, 10).cast(
            "double"
        )
        - F.lit(7.5),
    )
    per_dim = (
        toks.select(
            "doc_id", F.posexplode(nibbles).alias("_d", "_v")
        )
        .groupBy("doc_id", "_d")
        .agg(F.sum("_v").alias("_s"))
    )
    return per_dim.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_d", "_s"))),
            lambda x: x["_s"],
        ).alias("embedding")
    ).select(F.col("doc_id").alias("vec_id"), "embedding")


def rd_emb_sql(dim: int = 32) -> str:
    """The `rd_emb` CTE (requires `rd` upstream) — DuckDB twin of
    derive_realistic_embeddings. MATERIALIZED: the graph-ANN oracle
    references the embedding table 9×, and DuckDB re-inlines plain
    CTEs per reference — re-running the 12M-row derivation chain nine
    times OOMed the sf0.1 oracle; materializing (the SQL twin of the
    Spark side's localCheckpoint pin) makes it one pass."""
    return f"""rdtok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM rd
),
rdval AS (
  SELECT doc_id, t.d,
         sum(CAST(('0x' || substr(h, CAST(t.d AS INT), 1)) AS BIGINT)
             - 7.5) AS v
  FROM rdtok CROSS JOIN range(1, {dim + 1}) AS t(d)
  GROUP BY doc_id, t.d
),
rd_emb AS MATERIALIZED (
  SELECT doc_id AS vec_id, list(v ORDER BY d) AS embedding
  FROM rdval GROUP BY doc_id
)"""


# the `rd` CTE — DuckDB twin of derive_realistic_docs. MATERIALIZED:
# retrieval/lang-id oracles reference the derived corpus repeatedly
# and DuckDB re-inlines plain CTEs per reference (the 2-md5-per-token
# synthesis would re-run each time — the SQL twin of the Spark side's
# corpus pin).
RD_SQL = f"""rd AS MATERIALIZED (
  SELECT doc_id, lang, source,
    array_to_string(
      list_transform(
        list_transform(
          range(1, CAST(31 + CAST(('0x' || substr(md5('rdlen:' ||
                CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 90
                AS BIGINT)),
          i -> {_RANK_SQL}),
        r -> {_word_case_sql("r")}
      ), ' ') AS text
  FROM documents
)"""
