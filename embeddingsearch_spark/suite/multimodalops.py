"""Multimodal queries over a media table derived from documents (content =
utf-8 bytes of the text — an opaque BINARY column with typed metadata; the
testdata ships no real media, the plumbing is what's exercised).

Derivation (mirrored in the oracles):
  media_id = doc_id
  modality = image|audio|video by doc_id % 3
  content  = encode(text, 'utf-8')
  media_meta.n_frames = 24 + (doc_id % 100) * 3   (video frame counts)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import multimodal as mm


def derive_media(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        modality.alias("format"),
        (16 + F.col("doc_id") % 64).cast("int").alias("width"),
        (16 + F.col("doc_id") % 48).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (1000 + F.col("doc_id") % 5000).cast("int").alias("duration_ms"),
        (24 + (F.col("doc_id") % 100) * 3).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        meta.alias("media_meta"),
    )


def q_media_features(spark, sf_dir):
    """Byte-level stats via Arrow-batched mapInPandas over the BINARY
    column (entropy is exercised in unit tests; the oracled columns are
    the engine-portable ones)."""
    media = derive_media(spark, sf_dir)
    stats = mm.media_stats(media)
    return (
        media.select("media_id", "modality")
        .join(stats, "media_id")
        .select("media_id", "modality", "size_bytes", "content_sha256")
    )


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
       sha256(text) AS content_sha256
FROM documents"""


def q_media_frame_plan(spark, sf_dir):
    """Metadata-driven frame sampling plan for video rows — pure JVM
    sequence/slice over the metadata struct, binary never touched.
    Indices are comma-joined: the harness canonicalizes via pandas, which
    cannot hash ARRAY cells — gated outputs must be scalar columns."""
    media = derive_media(spark, sf_dir)
    plan = mm.frame_sample_plan(media, every_n=10, max_frames=16)
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.array_join(plan.cast("array<string>"), ",").alias("frame_indices"),
    )


MEDIA_FRAME_PLAN_SQL = """
SELECT doc_id AS media_id,
       array_to_string((list_transform(range(0, 24 + (doc_id % 100) * 3, 10),
                        x -> CAST(x AS VARCHAR)))[1:16], ',') AS frame_indices
FROM documents WHERE doc_id % 3 = 2"""


def q_media_decode(spark, sf_dir):
    """Deterministic fake decode (the codec seam with decoder='fake'):
    chunked byte-mean features, quantized to exact micro-units
    (integer floor division — see multimodal._fake_features) so a DuckDB
    oracle can mirror them with BIGINT arithmetic. Features are emitted as
    comma-joined micro-unit integers: scalar (the harness canon can't hash
    ARRAY cells) and exactly representable (no float-format ambiguity)."""
    media = derive_media(spark, sf_dir)
    feats = mm.decode_media(media, decoder="fake", feature_dim=16)
    return feats.select(
        "media_id",
        "modality",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.round(x * 1e6).cast("long").cast("string"),
            ),
            ",",
        ).alias("features_u6"),
    )


# The content column is utf-8-encoded text; the corpus is ASCII-only
# (verified: octet_length(encode(text)) == length(text) for every row at
# sf0.01/sf0.1), so byte i == unicode(char i) and the chunked byte means
# are expressible over the text directly.
MEDIA_DECODE_SQL = """
WITH b AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(length(text) // 16, 1) AS chunk
  FROM documents
)
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS modality,
       array_to_string(list_transform(range(0, 16), i ->
         CASE WHEN i * chunk >= n THEN CAST(0 AS BIGINT)
              ELSE (list_aggregate(list_transform(
                      range(i * chunk + 1, least((i + 1) * chunk, n) + 1),
                      j -> unicode(text[j:j])), 'sum') * 1000000)
                   // (CAST(least((i + 1) * chunk, n) - i * chunk AS BIGINT)
                       * 255)
         END), ',') AS features_u6
FROM b"""


def q_media_resize(spark, sf_dir):
    """Average-pool resize to a 3x5 grid (decoder='fake': byte-chunk
    means at h*w resolution, micro-unit-quantized — the codec seam with
    the same Arrow batch shape as the real 2-D pooling path, which is
    exercised on synthesized PNGs in tests/test_multimodal_real.py)."""
    media = derive_media(spark, sf_dir)
    out = mm.resize_media(media, h=3, w=5, decoder="fake")
    return out.select(
        "media_id",
        "modality",
        "h",
        "w",
        F.array_join(
            F.transform(
                "grid",
                lambda x: F.round(x * 1e6).cast("long").cast("string"),
            ),
            ",",
        ).alias("grid_u6"),
    )


MEDIA_RESIZE_SQL = """
WITH b AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(length(text) // 15, 1) AS chunk
  FROM documents
)
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS modality,
       3 AS h, 5 AS w,
       array_to_string(list_transform(range(0, 15), i ->
         CASE WHEN i * chunk >= n THEN CAST(0 AS BIGINT)
              ELSE (list_aggregate(list_transform(
                      range(i * chunk + 1, least((i + 1) * chunk, n) + 1),
                      j -> unicode(text[j:j])), 'sum') * 1000000)
                   // (CAST(least((i + 1) * chunk, n) - i * chunk AS BIGINT)
                       * 255)
         END), ',') AS grid_u6
FROM b"""


def q_media_dhash(spark, sf_dir):
    """Perceptual difference hash per media row (7x8 fake-decode grid →
    49 bits, row-major right>left comparisons packed into a BIGINT).
    The binary column never shuffles; the hash is 8 bytes/row."""
    media = derive_media(spark, sf_dir)
    return mm.media_dhash(media, grid=7, decoder="fake")


# grid micro-units exactly as MEDIA_RESIZE_SQL (7x8 = 56 cells,
# chunk = n // 56); bit k compares cells (k//7)*8+(k%7) and its right
# neighbor (1-based list indexing: +1 / +2).
_DHASH_U = """list_transform(range(0, 56), i ->
         CASE WHEN i * chunk >= n THEN CAST(0 AS BIGINT)
              ELSE (list_aggregate(list_transform(
                      range(i * chunk + 1, least((i + 1) * chunk, n) + 1),
                      j -> unicode(text[j:j])), 'sum') * 1000000)
                   // (CAST(least((i + 1) * chunk, n) - i * chunk AS BIGINT)
                       * 255)
         END)"""

MEDIA_DHASH_SQL = f"""
WITH b AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(length(text) // 56, 1) AS chunk
  FROM documents
),
g AS (SELECT doc_id, {_DHASH_U} AS u FROM b)
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(list_aggregate(list_transform(range(0, 49), k ->
         CASE WHEN u[(k // 7) * 8 + (k % 7) + 2]
                   > u[(k // 7) * 8 + (k % 7) + 1]
              THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END),
         'sum') AS BIGINT) AS dhash
FROM g"""


def q_media_dhash_neardup(spark, sf_dir):
    """Near-duplicate media pairs by banded hamming join over the
    perceptual hashes: 7 bands x 7 bits, verify popcount(xor) <= 6.
    max_hamming < bands, so banding recall is EXACT (pigeonhole) — the
    oracle brute-forces all pairs and must match exactly. 7-bit bands
    are a GATE-SCALE config (128 buckets — fine at 5k rows); production
    default is bands=4 per the multi-index-hashing width rule
    (BASELINE.md round-3 probe: 72 s vs 14 s at 250k rows)."""
    media = derive_media(spark, sf_dir)
    hashes = mm.media_dhash(media, grid=7, decoder="fake")
    return mm.dhash_neardup_pairs(
        hashes, bits=49, bands=7, max_hamming=6
    )


MEDIA_DHASH_NEARDUP_SQL = f"""
WITH b AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(length(text) // 56, 1) AS chunk
  FROM documents
),
g AS (SELECT doc_id, {_DHASH_U} AS u FROM b),
h AS (
  SELECT doc_id AS media_id,
         list_aggregate(list_transform(range(0, 49), k ->
           CASE WHEN u[(k // 7) * 8 + (k % 7) + 2]
                     > u[(k // 7) * 8 + (k % 7) + 1]
                THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END),
           'sum') AS dhash
  FROM g
)
SELECT a.media_id AS id_a, c.media_id AS id_b,
       bit_count(xor(a.dhash, c.dhash)) AS hamming
FROM h a JOIN h c ON a.media_id < c.media_id
WHERE bit_count(xor(a.dhash, c.dhash)) <= 6"""


def q_media_asset_pool(spark, sf_dir):
    """Per-asset pooling — the media analog of `chunk_mean_pool`: video
    rows expand to their sampled frames (metadata-driven plan), each
    frame's payload (byte suffix at the frame index — the demuxer seam)
    featurizes via the fake decoder, and `pooling.mean_pool` collapses
    frames back to ONE asset embedding. Output vector rendered as
    ×10⁴-scaled integers (floor(x·10⁴+½)) because the harness canon
    can't hash ARRAY cells. Downstream the pooled embeddings enter the
    standard dedup/ANN operators (exercised in tests/test_multimodal)."""
    from embeddingsearch_spark.operators import pooling

    media = derive_media(spark, sf_dir).filter(
        F.col("modality") == "video"
    )
    frames = mm.frame_features(
        media, every_n=10, max_frames=16, decoder="fake", feature_dim=16
    )
    pooled = pooling.mean_pool(frames, "media_id", "features")
    scaled = F.transform(
        F.col("pooled"),
        lambda x: F.floor(x * 10000 + F.lit(0.5)).cast("bigint"),
    )
    return pooled.select(
        "media_id",
        F.col("n_chunks").alias("n_frames"),
        F.array_join(
            F.transform(scaled, lambda i: i.cast("string")), ","
        ).alias("pooled_u4"),
    )


# Frame payload = text suffix from the frame index (ASCII corpus: byte
# i == unicode(char i)); per-frame features mirror _fake_features over
# that suffix, pooling mirrors chunk_mean_pool's avg-per-position.
MEDIA_ASSET_POOL_SQL = """
WITH v AS (
  SELECT doc_id, text, length(text) AS n,
         24 + (doc_id % 100) * 3 AS n_frames
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT doc_id, text, n,
         unnest((list_transform(range(0, n_frames, 10),
                 x -> CAST(x AS INT)))[1:16]) AS fi
  FROM v
),
fb AS (
  SELECT doc_id, fi, text, n,
         greatest(n - fi, 0) AS nb,
         greatest(greatest(n - fi, 0) // 16, 1) AS chunk
  FROM fr
),
ff AS (
  SELECT doc_id, fi,
         list_transform(range(0, 16), i ->
           CASE WHEN i * chunk >= nb THEN CAST(0 AS BIGINT)
                ELSE (list_aggregate(list_transform(
                        range(fi + i * chunk + 1,
                              fi + least((i + 1) * chunk, nb) + 1),
                        j -> unicode(text[j:j])), 'sum') * 1000000)
                     // (CAST(least((i + 1) * chunk, nb) - i * chunk
                              AS BIGINT) * 255)
           END) AS u
  FROM fb
),
x AS (
  SELECT doc_id, fi, generate_subscripts(u, 1) AS pos,
         unnest(u) / 1e6 AS val
  FROM ff
),
m AS (SELECT doc_id, pos, avg(val) AS mv FROM x GROUP BY doc_id, pos),
nc AS (SELECT doc_id, count(*) AS n_frames FROM ff GROUP BY doc_id)
SELECT m.doc_id AS media_id, nc.n_frames,
       array_to_string(
         list(CAST(floor(mv * 10000 + 0.5) AS BIGINT) ORDER BY pos), ',')
         AS pooled_u4
FROM m JOIN nc USING (doc_id)
GROUP BY m.doc_id, nc.n_frames"""


QUERIES = {
    "media_features": (q_media_features, MEDIA_FEATURES_SQL),
    "media_dhash": (q_media_dhash, MEDIA_DHASH_SQL),
    "media_dhash_neardup": (q_media_dhash_neardup, MEDIA_DHASH_NEARDUP_SQL),
    "media_frame_plan": (q_media_frame_plan, MEDIA_FRAME_PLAN_SQL),
    "media_decode": (q_media_decode, MEDIA_DECODE_SQL),
    "media_resize": (q_media_resize, MEDIA_RESIZE_SQL),
    "media_asset_pool": (q_media_asset_pool, MEDIA_ASSET_POOL_SQL),
}
