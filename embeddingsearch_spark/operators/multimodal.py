"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Beyond-reference (the reference is text-only; its datapoints are named text
fields, reference Datapoint.cs:7-34) but required for a training-data
pipeline: the engine treats media as `content BINARY` plus a
`media_meta STRUCT` column, keeps all manipulation Arrow-batched
(`mapInPandas` over binary columns — bytes cross the JVM/Python boundary as
Arrow buffers, never row-at-a-time pickles), and leaves the actual
codec work behind a provider seam:

  - :func:`media_stats` — byte-level features (size, sha256, entropy) —
    REAL, runs anywhere, no codec libs needed.
  - :func:`decode_media` — the codec seam. ``decoder="fake"`` is a
    deterministic stand-in (pure function of the bytes) with the same
    schema/batching as a real decoder; ``decoder="real"`` raises
    NotImplementedError unless PIL/soundfile are installed (NOT in this
    container — STUB by design, the Spark-side plumbing is what's tested).
  - :func:`frame_sample_plan` — metadata-driven frame sampling for video:
    pure JVM-side `sequence`/`transform` (no Python) producing the frame
    index list each decode task must extract.

At 100 TB: media rows are large and skew-prone — the pipelines here never
shuffle the binary column (stats/decode are scan-stage map operations;
joins carry only media_id + derived features). Partition by modality, size
`maxPartitionBytes` down so one task holds few large blobs.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<format:string,width:int,height:int,sample_rate:int,"
    "duration_ms:int,n_frames:int>"
)


def media_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Byte-level features per media row via Arrow-batched mapInPandas:
    size, sha256 (hex), shannon byte entropy (bits/byte, 4 digits)."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, size_bytes long, content_sha256 string, "
        "byte_entropy double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content)
                recs.append(
                    (
                        int(mid),
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        round(_entropy(b), 4),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[id_col, "size_bytes", "content_sha256", "byte_entropy"],
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def _entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum(c / n * math.log2(c / n) for c in counts.values())


def decode_media(
    df: DataFrame,
    modality_col: str = "modality",
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
    feature_dim: int = 16,
) -> DataFrame:
    """Decode + feature-extract: (media_id, modality, features ARRAY<DOUBLE>).

    ``decoder="fake"``: deterministic features from the raw bytes (mean
    byte value per ``feature_dim`` equal chunks, scaled to [0,1]) — same
    signature, schema, and Arrow batch shape as a real decoder.
    ``decoder="real"``: requires codec libraries (PIL / soundfile / a video
    demuxer) which are NOT available here — STUB, raises NotImplementedError
    at task level with a clear message.
    """
    import pandas as pd

    out_schema = f"{id_col} long, {modality_col} string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, mod, content in zip(
                pdf[id_col], pdf[modality_col], pdf[content_col]
            ):
                b = bytes(content)
                if decoder == "fake":
                    feats = _fake_features(b, feature_dim)
                else:
                    feats = _real_decode(b, str(mod))  # pragma: no cover
                recs.append((int(mid), str(mod), feats))
            yield pd.DataFrame(recs, columns=[id_col, modality_col, "features"])

    return df.select(id_col, modality_col, content_col).mapInPandas(
        run, schema=out_schema
    )


def _fake_features(b: bytes, dim: int) -> list[float]:
    """Mean byte value of each of ``dim`` equal chunks, /255; zero-padded.

    Quantized to exact micro-units via integer floor division (not float
    round) so the value is bit-identical across engines — the DuckDB oracle
    mirrors the same BIGINT arithmetic (suite/multimodalops.py)."""
    if not b:
        return [0.0] * dim
    chunk = max(1, len(b) // dim)
    out = []
    for i in range(dim):
        part = b[i * chunk : (i + 1) * chunk]
        out.append(
            (sum(part) * 1_000_000 // (len(part) * 255)) / 1e6 if part else 0.0
        )
    return out


def _real_decode(b: bytes, modality: str) -> list[float]:
    """Codec seam. Wire PIL (image), soundfile (audio), or a demuxer
    (video) here; none are available in this environment by design."""
    try:  # pragma: no cover
        if modality == "image":
            from PIL import Image  # noqa: F401
        elif modality == "audio":
            import soundfile  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            f"real {modality} decoding needs codec libraries not present "
            "in this environment; use decoder='fake' for the plumbing path"
        ) from e
    raise NotImplementedError(  # pragma: no cover
        f"real decoder for modality={modality!r} not wired up"
    )


def frame_sample_plan(
    df: DataFrame,
    meta_col: str = "media_meta",
    every_n: int = 10,
    max_frames: int = 16,
) -> Column:
    """Frame indices to extract per video row — pure JVM expression over the
    metadata (no Python, no binary touched): every ``every_n``-th frame,
    capped at ``max_frames``."""
    n = F.coalesce(F.col(f"{meta_col}.n_frames"), F.lit(0))
    return F.slice(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)),
        1,
        max_frames,
    )
