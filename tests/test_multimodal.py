"""Multimodal plumbing: Arrow-batched binary stats match pure-Python
values, fake decode is deterministic with the right schema/shape, the real
decoder stub fails loudly, and the frame plan is metadata-driven JVM work."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import multimodal as mm

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, "
    f"media_meta {mm.MEDIA_META_SCHEMA}"
)


def _media(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _row(i, modality, content: bytes, n_frames=0):
    return (i, modality, bytearray(content), (modality, 16, 16, 16000, 1000, n_frames))


def test_media_stats_matches_python(spark):
    payloads = [b"hello world", b"", b"\x00\xff" * 100, "héllo".encode()]
    df = _media(
        spark, [_row(i, "image", p) for i, p in enumerate(payloads)]
    )
    got = {r.media_id: r for r in mm.media_stats(df).collect()}
    assert len(got) == len(payloads)
    for i, p in enumerate(payloads):
        assert got[i].size_bytes == len(p)
        assert got[i].content_sha256 == hashlib.sha256(p).hexdigest()
        assert got[i].byte_entropy == round(mm._entropy(p), 4)
    # known value: 200 bytes, two symbols evenly → 1 bit/byte
    assert got[2].byte_entropy == 1.0


def test_fake_decode_deterministic_and_shaped(spark):
    df = _media(
        spark,
        [
            _row(0, "image", b"abcdefgh" * 10),
            _row(1, "audio", b""),
            _row(2, "video", bytes(range(256))),
        ],
    )
    out = mm.decode_media(df, decoder="fake", feature_dim=4)
    rows = {r.media_id: r for r in out.collect()}
    assert out.schema["features"].dataType.simpleString() == "array<double>"
    assert all(len(r.features) == 4 for r in rows.values())
    assert rows[1].features == [0.0] * 4  # empty content → zero vector
    assert rows[0].features == mm._fake_features(b"abcdefgh" * 10, 4)
    assert rows[2].features == mm._fake_features(bytes(range(256)), 4)
    # determinism: second run bit-identical
    again = {r.media_id: r.features for r in out.collect()}
    assert again == {k: r.features for k, r in rows.items()}


def test_real_decoder_stub_raises(spark):
    df = _media(spark, [_row(0, "image", b"notarealimage")])
    out = mm.decode_media(df, decoder="real")
    with pytest.raises(Exception) as exc_info:
        out.collect()
    assert "NotImplementedError" in str(
        exc_info.value
    ) or "real image decoding" in str(exc_info.value)


def test_frame_sample_plan(spark):
    df = _media(
        spark,
        [
            _row(0, "video", b"x", n_frames=25),
            _row(1, "video", b"x", n_frames=300),
            _row(2, "video", b"x", n_frames=1),
        ],
    )
    out = df.select(
        "media_id", mm.frame_sample_plan(df, every_n=10, max_frames=5).alias("fi")
    )
    got = {r.media_id: r.fi for r in out.collect()}
    assert got[0] == [0, 10, 20]
    assert got[1] == [0, 10, 20, 30, 40]  # capped at max_frames
    assert got[2] == [0]


def _media_rows(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(b)) for i, b in rows],
        "media_id long, modality string, content binary",
    )


def test_media_dhash_identical_and_perturbed(spark):
    """Identical bytes → identical hash; a small perturbation moves few
    bits; wildly different content moves many."""
    base = bytes(range(256)) * 8
    perturbed = bytearray(base)
    perturbed[100] = 255  # one byte nudge
    other = bytes(reversed(base))
    df = _media_rows(
        spark, [(1, base), (2, bytes(perturbed)), (3, other), (4, base)]
    )
    out = {r["media_id"]: r["dhash"] for r in mm.media_dhash(df).collect()}
    assert out[1] == out[4]
    h = lambda a, b: bin(a ^ b).count("1")
    assert h(out[1], out[2]) <= 6
    assert h(out[1], out[3]) > 6


def test_dhash_neardup_pairs_exact_recall(spark):
    """max_hamming < bands → banding recall is exact: pairs equal the
    brute-force hamming filter."""
    base = bytes(range(256)) * 8
    p1 = bytearray(base); p1[50] = 0
    p2 = bytearray(base); p2[700] = 9
    df = _media_rows(
        spark,
        [(1, base), (2, bytes(p1)), (3, bytes(p2)),
         (4, bytes(reversed(base)))],
    )
    hashes = mm.media_dhash(df)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in mm.dhash_neardup_pairs(
            hashes, bits=49, bands=7, max_hamming=6
        ).collect()
    )
    hs = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    want = sorted(
        (a, b)
        for a in hs for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 6
    )
    assert got == want and (1, 2) in got


def test_dhash_config_for_band_sizing():
    from embeddingsearch_spark.operators.multimodal import dhash_config_for

    assert dhash_config_for(100) == 7        # 7-bit widths fine at 100 rows
    assert dhash_config_for(5_000) == 3      # 13-bit widths needed
    assert dhash_config_for(250_000) == 2
    assert dhash_config_for(10**9) == 1      # hash too short: shard first


def test_frame_features_and_asset_pool(spark):
    """Per-frame featurization + per-asset mean pooling: frame payloads
    are byte suffixes at the planned indices, pooled features equal the
    Python mirror, and pooled asset embeddings feed asset-level dedup
    (two identical assets → cosine 1 pair)."""
    from embeddingsearch_spark.operators import pooling

    payload = bytes(range(200))
    df = _media(
        spark,
        [
            _row(0, "video", payload, n_frames=30),
            _row(1, "video", payload, n_frames=30),  # exact dup asset
            _row(2, "video", bytes(reversed(payload)), n_frames=30),
        ],
    )
    frames = mm.frame_features(
        df, every_n=10, max_frames=16, decoder="fake", feature_dim=4
    )
    rows = frames.collect()
    # n_frames=30, every 10 → indices 0, 10, 20
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.media_id, {})[r.frame_idx] = r.features
    assert set(by_asset[0]) == {0, 10, 20}
    for fi in (0, 10, 20):
        assert by_asset[0][fi] == mm._fake_features(payload[fi:], 4)
    assert by_asset[0] == by_asset[1]

    pooled = pooling.mean_pool(frames, "media_id", "features")
    got = {r.media_id: r for r in pooled.collect()}
    assert got[0].n_chunks == 3
    mirror = [
        sum(mm._fake_features(payload[fi:], 4)[i] for fi in (0, 10, 20))
        / 3.0
        for i in range(4)
    ]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got[0].pooled, mirror))
    assert got[0].pooled == got[1].pooled

    # asset-level dedup on the pooled embeddings: the identical assets
    # pair at cosine 1 (remapped ≥ threshold), the reversed one doesn't
    from embeddingsearch_spark.operators import ann

    emb = pooled.select(
        F.col("media_id").alias("vec_id"),
        F.col("pooled").cast("array<float>").alias("embedding"),
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in ann.srp_cosine_pairs(emb, threshold=0.999).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_frame_features_string_media_ids(spark):
    """The output id type follows the input schema (rerank_topk
    contract) — string media ids must survive, not crash on int()."""
    payload = bytes(range(64))
    df = spark.createDataFrame(
        [
            (
                "asset-a",
                "video",
                bytearray(payload),
                ("video", 16, 16, 16000, 1000, 20),
            )
        ],
        "media_id string, modality string, content binary, "
        f"media_meta {mm.MEDIA_META_SCHEMA}",
    )
    frames = mm.frame_features(
        df, every_n=10, max_frames=4, decoder="fake", feature_dim=4
    )
    assert frames.schema["media_id"].dataType.simpleString() == "string"
    rows = frames.collect()
    assert {r.media_id for r in rows} == {"asset-a"}
    assert {r.frame_idx for r in rows} == {0, 10}
