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
    schema/batching as a real decoder and stays the ORACLE path;
    ``decoder="real"`` decodes actual media: PIL / soundfile when
    installed, with stdlib fallbacks that work anywhere — a pure-Python
    PNG decoder (zlib inflate + spec unfiltering, 8-bit gray/RGB/RGBA,
    non-interlaced) and a `wave`-module PCM WAV reader. Formats beyond
    that without the optional libs raise NotImplementedError per row;
    ``decoder="auto"`` catches that and falls back to the fake features
    so a mixed corpus degrades gracefully. :func:`media_capabilities`
    reports what the current environment can decode.
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


def media_capabilities() -> dict:
    """What the current environment can actually decode. The stdlib paths
    are always available; PIL/soundfile widen format coverage when
    installed (optional deps — never required)."""
    import importlib.util

    return {
        "image_pil": importlib.util.find_spec("PIL") is not None,
        "audio_soundfile": importlib.util.find_spec("soundfile") is not None,
        "image_png_stdlib": True,
        "audio_wav_stdlib": True,
        # uncompressed RIFF/AVI (24-bit DIB frames): stdlib demuxer
        "video_avi_stdlib": True,
    }


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
    signature, schema, and Arrow batch shape as a real decoder; the
    DuckDB-oracle path.
    ``decoder="real"``: decodes the actual media — images via PIL when
    installed, else the stdlib PNG path; audio via soundfile when
    installed, else the stdlib WAV path — and emits ``feature_dim``
    luminance-chunk means (image) / RMS-chunk energies (audio) in [0,1].
    Undecodable formats raise NotImplementedError at task level with a
    clear message.
    ``decoder="auto"``: real where possible, fake features for rows
    whose format the environment can't decode (graceful degradation).
    """
    import pandas as pd

    if decoder not in ("fake", "real", "auto"):
        raise ValueError("decoder must be 'fake', 'real', or 'auto'")
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
                elif decoder == "real":
                    feats = _real_decode(b, str(mod), feature_dim)
                else:
                    try:
                        feats = _real_decode(b, str(mod), feature_dim)
                    except NotImplementedError:
                        feats = _fake_features(b, feature_dim)
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


def _real_decode(b: bytes, modality: str, dim: int = 16) -> list[float]:
    """Real codec dispatch: PIL / soundfile when installed, stdlib PNG /
    WAV / AVI otherwise. Raises NotImplementedError (caught by
    decoder='auto') for formats nothing present can handle — the message
    names what was tried so a user knows which optional dep to install."""
    if modality == "image":
        gray = _decode_image_gray(b)
        return _chunk_means(gray, dim)
    if modality == "audio":
        samples = _decode_audio_mono(b)
        return _chunk_rms(samples, dim)
    if modality == "video":
        import numpy as np

        frames = _decode_video_frames(b)
        if not frames:
            return [0.0] * dim
        # asset-level features: elementwise mean of per-frame chunk
        # means (the same pooling `frame_features` + mean_pool compose
        # explicitly, collapsed here for the single-vector decode path)
        per_frame = np.array(
            [_chunk_means(fr, dim) for fr in frames], dtype=np.float64
        )
        return [round(float(v), 6) for v in per_frame.mean(axis=0)]
    raise NotImplementedError(
        f"real decoder for modality={modality!r} not available "
        "(use decoder='fake'/'auto' for the plumbing path)"
    )


def _decode_image_gray(b: bytes):
    """Image bytes → 2-D float64 luminance array in [0, 255]. PIL first
    (any format it knows); stdlib PNG decoder as the universal fallback."""
    try:
        from PIL import Image  # optional dep
    except ImportError:
        Image = None
    if Image is not None:
        import io

        import numpy as np

        try:
            img = Image.open(io.BytesIO(b)).convert("L")
            return np.asarray(img, dtype=np.float64)
        except Exception:  # noqa: BLE001 — corrupt/unknown → stdlib/fail path
            pass
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png_gray(b)
    raise NotImplementedError(
        "image format not decodable: PIL not installed and bytes are not "
        "PNG (the stdlib fallback decodes 8-bit non-interlaced PNG only); "
        "pip install pillow for JPEG/WebP/…"
    )


def _decode_png_gray(b: bytes):
    """Pure-stdlib PNG → luminance matrix (PNG spec: zlib inflate + the
    five scanline filters; 8-bit depth, color types 0/2/4/6, no
    interlace). NumPy-vectorized where the filter allows (None/Up);
    Sub/Average/Paeth carry a per-pixel dependency chain by definition."""
    import struct
    import zlib

    import numpy as np

    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(b):
        (ln,), typ = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise NotImplementedError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"stdlib PNG path supports 8-bit non-interlaced color types "
            f"0/2/4/6; got depth={depth} ctype={ctype} "
            f"interlace={interlace} (install pillow for the rest)"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        off += 1
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off).copy()
        off += stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif ftype == 2:  # Up (uint8 addition wraps mod 256 — the spec)
            line += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                up = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        img[y] = line
        prev = line
    px = img.reshape(h, w, nch).astype(np.float64)
    if nch <= 2:  # gray / gray+alpha
        return px[:, :, 0]
    # ITU-R BT.601 luma
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def _decode_audio_mono(b: bytes):
    """Audio bytes → mono float64 samples in [-1, 1]. soundfile first
    (FLAC/OGG/…); stdlib `wave` handles PCM WAV anywhere."""
    import io

    import numpy as np

    try:
        import soundfile  # optional dep

        data, _rate = soundfile.read(io.BytesIO(b), dtype="float64")
        return data.mean(axis=1) if data.ndim > 1 else data
    except ImportError:
        pass
    if b[:4] != b"RIFF":
        raise NotImplementedError(
            "audio format not decodable: soundfile not installed and bytes "
            "are not RIFF/WAV (the stdlib fallback reads PCM WAV only); "
            "pip install soundfile for FLAC/OGG/…"
        )
    import wave

    with wave.open(io.BytesIO(b), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 1:  # 8-bit WAV is unsigned
        x = np.frombuffer(frames, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} bytes")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x


def _chunk_means(gray, dim: int) -> list[float]:
    """Flattened luminance → ``dim`` equal-chunk means scaled to [0,1],
    rounded to 6 digits (deterministic across BLAS/accumulation order)."""
    flat = gray.reshape(-1)
    if flat.size == 0:
        return [0.0] * dim
    chunk = max(1, flat.size // dim)
    out = []
    for i in range(dim):
        part = flat[i * chunk : (i + 1) * chunk]
        out.append(round(float(part.mean()) / 255.0, 6) if part.size else 0.0)
    return out


def _chunk_rms(samples, dim: int) -> list[float]:
    """Mono samples → ``dim`` equal-chunk RMS energies in [0,1]."""
    import numpy as np

    if samples.size == 0:
        return [0.0] * dim
    chunk = max(1, samples.size // dim)
    out = []
    for i in range(dim):
        part = samples[i * chunk : (i + 1) * chunk]
        out.append(
            round(float(np.sqrt(np.mean(part * part))), 6)
            if part.size
            else 0.0
        )
    return out


def mux_avi(frames, width: int, height: int, fps: int = 10) -> bytes:
    """Build an uncompressed RIFF/AVI container (24-bit BI_RGB DIB
    frames, bottom-up rows) from grayscale frames — pure stdlib struct
    packing, the deterministic fixture builder for the video demux
    path. ``frames``: sequence of h×w row-major luminance grids
    (sequences or arrays, values 0–255)."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    frame_chunks = []
    for fr in frames:
        rows = []
        for y in range(height - 1, -1, -1):  # DIB rows are bottom-up
            row = bytearray()
            for x in range(width):
                v = int(fr[y][x]) & 0xFF
                row += bytes((v, v, v))  # B, G, R
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        frame_chunks.append(b"".join(rows))

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    buf = stride * height
    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        buf * fps,  # dwMaxBytesPerSec
        0, 0,  # padding, flags
        len(frames), 0, 1, buf,  # totalFrames, initial, streams, sugg
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,  # flags, priority, language, initialFrames
            1, fps,  # scale, rate
            0, len(frames), buf, 0, 0,  # start, length, sugg, quality...
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, buf, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi", b"".join(chunk(b"00db", d) for d in frame_chunks)
    )
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def demux_avi(b: bytes):
    """Parse an uncompressed RIFF/AVI container — pure stdlib, constant
    auxiliary memory: returns ``(width, height, [frame_bytes])`` where
    each element is one DIB frame's pixel data. Raises
    NotImplementedError for non-AVI bytes or compressed streams (the
    message names the limitation; `decoder="auto"` degrades to the
    fake path per row, the PIL/soundfile convention)."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "not a RIFF/AVI container (stdlib video path demuxes "
            "uncompressed AVI only)"
        )
    info = {"w": None, "h": None, "bpp": None, "comp": None}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (sz,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body, body_end = pos + 8, min(pos + 8 + sz, end)
            if cid == b"LIST":
                walk(body + 4, body_end)
            elif cid == b"strf" and info["w"] is None and sz >= 20:
                info["w"], info["h"] = struct.unpack(
                    "<ii", b[body + 4 : body + 12]
                )
                (info["bpp"],) = struct.unpack(
                    "<H", b[body + 14 : body + 16]
                )
                (info["comp"],) = struct.unpack(
                    "<I", b[body + 16 : body + 20]
                )
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frames.append(b[body:body_end])
            pos = body_end + (sz & 1)  # chunks pad to even offsets

    walk(12, len(b))
    if info["w"] is None:
        raise NotImplementedError("AVI missing strf header")
    if info["comp"] not in (0,) or info["bpp"] != 24:
        raise NotImplementedError(
            f"AVI stream is compression={info['comp']} bpp={info['bpp']}"
            " — stdlib path demuxes uncompressed 24-bit DIB only"
        )
    return int(info["w"]), abs(int(info["h"])), frames


def _decode_video_frames(b: bytes):
    """AVI bytes → list of 2-D float64 luminance arrays (top-down),
    one per frame: demux, re-flip the bottom-up DIB rows, BT.601 luma
    over the BGR pixels."""
    import numpy as np

    w, h, raw = demux_avi(b)
    stride = ((w * 3 + 3) // 4) * 4
    out = []
    for data in raw:
        if len(data) < stride * h:
            raise NotImplementedError(
                f"AVI frame truncated: {len(data)} < {stride * h} bytes"
            )
        px = (
            np.frombuffer(data[: stride * h], dtype=np.uint8)
            .reshape(h, stride)[:, : w * 3]
            .reshape(h, w, 3)[::-1]  # bottom-up → top-down
            .astype(np.float64)
        )
        # DIB byte order is B, G, R
        out.append(
            0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
        )
    return out


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


def frame_features(
    df: DataFrame,
    id_col: str = "media_id",
    modality_col: str = "modality",
    content_col: str = "content",
    meta_col: str = "media_meta",
    every_n: int = 10,
    max_frames: int = 16,
    decoder: str = "fake",
    feature_dim: int = 16,
) -> DataFrame:
    """Per-frame feature rows for multi-frame assets: one row per
    sampled frame, ``(id_col, frame_idx, features ARRAY<DOUBLE>)``.

    The frame plan is `frame_sample_plan` (pure JVM metadata
    expression). With ``decoder="real"``/``"auto"`` a video asset whose
    bytes are an uncompressed RIFF/AVI container is DEMUXED (stdlib —
    `demux_avi`, once per asset) and each planned index yields that
    actual frame's luminance features; other modalities/formats fall
    through the same `decode_media` dispatch over the frame's byte
    suffix, and ``"fake"`` keeps the deterministic byte-suffix features
    (the oracle path) with identical schema and batching. Feeds
    `pooling.mean_pool(id_col)` for the per-asset embedding — the media
    analog of the text side's chunk→doc pooling — after which the
    asset embeddings enter the standard dedup/ANN operators.

    Scale shape: the container crosses to Python ONCE per asset (the
    per-frame fan-out happens inside the Arrow batch, so a 100 MB
    video is not duplicated per sampled frame); output rows carry
    ``feature_dim`` doubles, never media bytes, and nothing shuffles."""
    import pandas as pd

    if decoder not in ("fake", "real", "auto"):
        raise ValueError("decoder must be 'fake', 'real', or 'auto'")
    plan = frame_sample_plan(df, meta_col, every_n, max_frames)
    staged = df.select(
        F.col(id_col),
        F.col(modality_col),
        F.col(content_col),
        plan.alias("_plan"),
    )
    # id type follows the input schema (same contract as
    # sources/reranker.rerank_topk) — string/UUID media ids pass through
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, frame_idx int, features array<double>"
    )

    def one_frame(b: bytes, mod: str, fidx: int, vid) -> list[float]:
        if decoder == "fake":
            return _fake_features(b[fidx:], feature_dim)
        try:
            if vid is not None:
                if fidx >= len(vid):
                    raise NotImplementedError(
                        f"frame {fidx} beyond the {len(vid)} demuxed "
                        "frames (metadata n_frames disagrees with the "
                        "container)"
                    )
                return _chunk_means(vid[fidx], feature_dim)
            return _real_decode(b[fidx:], mod, feature_dim)
        except NotImplementedError:
            if decoder == "auto":
                return _fake_features(b[fidx:], feature_dim)
            raise

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, mod, content, plan_l in zip(
                pdf[id_col], pdf[modality_col], pdf[content_col],
                pdf["_plan"],
            ):
                b = bytes(content) if content is not None else b""
                vid = None
                if (
                    decoder in ("real", "auto")
                    and str(mod) == "video"
                    and b[:4] == b"RIFF"
                ):
                    try:
                        vid = _decode_video_frames(b)
                    except NotImplementedError:
                        if decoder == "real":
                            raise
                for fidx in plan_l:
                    recs.append(
                        (
                            mid,
                            int(fidx),
                            one_frame(b, str(mod), int(fidx), vid),
                        )
                    )
            yield pd.DataFrame(
                recs, columns=[id_col, "frame_idx", "features"]
            )

    return staged.mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    modality_col: str = "modality",
    content_col: str = "content",
    id_col: str = "media_id",
    h: int = 4,
    w: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """Resize to an (h, w) grid by average pooling:
    (media_id, modality, h, w, grid ARRAY<DOUBLE> row-major, len h*w).

    ``decoder="real"``: images decode to luminance (PIL or the stdlib
    PNG path) and average-pool 2-D into h x w cells (values in [0, 1]);
    non-image modalities raise at task level (use fake/auto).
    ``decoder="fake"``: byte-chunk means at h*w resolution — the same
    micro-unit-quantized arithmetic as ``decode_media``'s fake path, so
    a DuckDB oracle replays it exactly; Arrow batch shape identical to
    the real path.
    ``decoder="auto"``: real where the environment can decode, fake
    fallback per row.
    """
    import pandas as pd

    if decoder not in ("fake", "real", "auto"):
        raise ValueError("decoder must be 'fake', 'real', or 'auto'")
    out_schema = (
        f"{id_col} long, {modality_col} string, h int, w int, "
        "grid array<double>"
    )

    def _real_grid(b: bytes, mod: str) -> list[float]:
        if mod != "image":
            raise NotImplementedError(
                f"resize for modality={mod!r} needs an image decoder"
            )
        import numpy as np

        gray = _decode_image_gray(b)  # (H, W) in [0, 255]
        H, W = gray.shape
        out = []
        for r in range(h):
            r0, r1 = (r * H) // h, max(((r + 1) * H) // h, (r * H) // h + 1)
            r1 = min(r1, H) if H else r1
            for c in range(w):
                c0 = (c * W) // w
                c1 = max(((c + 1) * W) // w, c0 + 1)
                cell = gray[r0:r1, c0:min(c1, W)]
                out.append(float(cell.mean()) / 255.0 if cell.size else 0.0)
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, mod, content in zip(
                pdf[id_col], pdf[modality_col], pdf[content_col]
            ):
                b = bytes(content)
                if decoder == "fake":
                    grid = _fake_features(b, h * w)
                elif decoder == "real":
                    grid = _real_grid(b, str(mod))
                else:
                    try:
                        grid = _real_grid(b, str(mod))
                    except NotImplementedError:
                        grid = _fake_features(b, h * w)
                recs.append((int(mid), str(mod), h, w, grid))
            yield pd.DataFrame(
                recs, columns=[id_col, modality_col, "h", "w", "grid"]
            )

    return df.select(id_col, modality_col, content_col).mapInPandas(
        run, schema=out_schema
    )


def media_dhash(
    df: DataFrame,
    modality_col: str = "modality",
    content_col: str = "content",
    id_col: str = "media_id",
    grid: int = 7,
    decoder: str = "fake",
) -> DataFrame:
    """Perceptual difference hash (dHash — Krawetz's public "Kind of
    Like That" gradient hash): average-pool the media to a
    ``grid x (grid+1)`` luminance grid, emit one bit per horizontally
    adjacent cell pair (right > left), packed row-major into a BIGINT.
    Visually identical/near-identical images agree on most bits; compare
    with hamming distance (`dhash_neardup_pairs`).

    Pure composition: `resize_media` supplies the grid (decoder="fake"
    is the engine-reproducible oracle seam; "real" decodes via
    PIL/stdlib PNG), and the bit-pack is a JVM-side scan expression over
    the grid array — the binary column never shuffles, and the hash is
    8 bytes/row no matter how large the media. ``grid**2 <= 62`` keeps
    the packed hash in positive BIGINT range on every engine.
    Returns ``(media_id, modality, dhash BIGINT)``.
    """
    if grid * grid > 62:
        raise ValueError("grid**2 must be <= 62 (positive BIGINT pack)")
    rs = resize_media(
        df, modality_col, content_col, id_col,
        h=grid, w=grid + 1, decoder=decoder,
    )
    g = F.col("grid")
    sig = F.lit(0).cast("bigint")
    for r in range(grid):
        for c in range(grid):
            k = r * grid + c
            left = g[r * (grid + 1) + c]
            right = g[r * (grid + 1) + c + 1]
            sig = sig + F.when(right > left, F.lit(1 << k)).otherwise(
                F.lit(0)
            )
    return rs.select(id_col, modality_col, sig.alias("dhash"))


def dhash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    bits: int = 49,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate media pairs from perceptual hashes by banded
    hamming join: split the ``bits``-bit hash into ``bands`` contiguous
    bit bands; candidate pairs share at least one full band (pigeonhole:
    any pair with hamming distance < bands has some band untouched, so
    recall is exact for distance <= bands-1 and candidates-only beyond);
    verify with the exact popcount of the XOR. Returns
    ``(id_a, id_b, hamming)`` with id_a < id_b.

    Scale: the self-join is banded — hashes (8 B) shuffle ``bands``
    times, never media bytes, and only band-equal buckets pair up. BAND
    WIDTH IS THE COST DIAL: a band bucket holds ~n/2^(bits/bands) rows
    and candidates grow with the square of that, so more bands = better
    recall but exponentially smaller band values. The multi-index-
    hashing rule of thumb (Norouzi et al. 2012, public) is
    bits/bands >= log2(n). Measured at the 250k-row probe: bands=7
    (7-bit values, 128 buckets) streams ~1.7 B candidates = 72 s;
    bands=4 (13-bit values) = 14 s end-to-end including hashing. The
    verify is a scan-stage bit_count BEFORE any shuffle of candidates.
    """
    width = (bits + bands - 1) // bands
    mask = (1 << width) - 1
    h = F.col(hash_col)
    banded = hashes.select(
        F.col(id_col), h,
        F.posexplode(
            F.array(*[
                F.shiftright(h, b * width).bitwiseAND(F.lit(mask))
                for b in range(bands)
            ])
        ).alias("band", "band_val"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), h.alias("_ha"), "band", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), h.alias("_hb"), "band", "band_val"
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    # hamming-filter BEFORE distinct: a near-identical pair collides in
    # most of its bands, so the raw candidate stream is ~bands x the pair
    # count (and band buckets are only 2^width wide — low-entropy hashes
    # collide a lot). The filter is scan-stage inside the join's stage;
    # only true near-dups reach the dedup shuffle. Measured at the N=50
    # probe (250k rows, 7-bit bands): 95 s -> 72 s from this reorder
    # alone; the band-width dial (see docstring) takes it to 14 s.
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dhash_config_for(n_rows: int, bits: int = 49) -> int:
    """Band count for `dhash_neardup_pairs` sized to the corpus: the
    multi-index-hashing rule (band width >= log2 n keeps expected bucket
    size ~1, so candidate volume stays near-linear). Returns the largest
    ``bands`` whose width clears the rule (>= 1); exact-recall radius is
    then hamming <= bands - 1. At n beyond 2^bits no width clears the
    rule — the hash itself is too short for banding alone; shard first
    (e.g. by modality or size bucket) and band within shards."""
    import math

    width_needed = max(1, math.ceil(math.log2(max(2, n_rows))))
    return max(1, bits // width_needed)
