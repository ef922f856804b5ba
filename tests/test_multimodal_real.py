"""Real media decode (optional-dep seam): the stdlib PNG and WAV paths
must decode actual media anywhere; PIL/soundfile widen coverage when
installed (those tests gate on presence); undecodable formats raise
NotImplementedError and decoder='auto' degrades to the fake features."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from embeddingsearch_spark.operators import multimodal as mm


# -- synthesis helpers (pure stdlib) ----------------------------------------


def _png(width, height, rows, ctype, filters=None):
    """Minimal PNG encoder: 8-bit, `rows` = list of per-row channel-byte
    lists, one scanline filter byte per row (default 0/None)."""
    filters = filters or [0] * height
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(
        bytes([filters[y]]) + bytes(rows[y]) for y in range(height)
    )
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav(samples, width=2, nch=1, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        else:
            wf.writeframes(bytes(samples))
    return buf.getvalue()


# -- stdlib PNG path --------------------------------------------------------


def test_png_gray_solid_exact():
    # 4x4 all-128 grayscale -> every chunk mean is 128/255
    png = _png(4, 4, [[128] * 4] * 4, ctype=0)
    feats = mm._real_decode(png, "image", dim=4)
    assert feats == [round(128 / 255.0, 6)] * 4


def test_png_rgb_luma_and_filters():
    # row0: filter None, solid red; row1: filter Up (delta from row0) making
    # it solid green; row2: filter Sub with first pixel blue, rest delta 0
    red, green = [255, 0, 0], [0, 255, 0]
    up_delta = [(g - r) & 0xFF for r, g in zip(red * 2, green * 2)]
    rows = [red * 2, up_delta, [0, 0, 255, 0, 0, 0]]
    png = _png(2, 3, rows, ctype=2, filters=[0, 2, 1])
    gray = mm._decode_png_gray(png)
    assert gray.shape == (3, 2)
    assert gray[0, 0] == pytest.approx(0.299 * 255)
    assert gray[1, 0] == pytest.approx(0.587 * 255)
    assert gray[2, 0] == gray[2, 1] == pytest.approx(0.114 * 255)


def test_png_paeth_and_average_filters():
    # 2x2 gray: row0 plain, row1 avg-filtered then a 2x2 paeth-filtered
    rows = [[10, 20], [5, 10]]  # avg: recon = raw + (left+up)//2
    png = _png(2, 2, rows, ctype=0, filters=[0, 3])
    gray = mm._decode_png_gray(png)
    assert gray[1, 0] == 5 + (0 + 10) // 2  # left=0, up=10
    assert gray[1, 1] == (10 + ((gray[1, 0].astype(int)) + 20) // 2) % 256

    png2 = _png(2, 2, [[7, 9], [1, 2]], ctype=0, filters=[0, 4])
    gray2 = mm._decode_png_gray(png2)
    # paeth(0,7,0)=7 -> 1+7=8; paeth(8,9,7): p=10 -> closest is 9 (up)
    assert gray2[1, 0] == 8
    assert gray2[1, 1] == 11


def test_png_unsupported_depth_raises():
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"
    bad = sig + struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16 + b"\0" * 4
    with pytest.raises(NotImplementedError, match="8-bit"):
        mm._decode_png_gray(bad)


# -- stdlib WAV path --------------------------------------------------------


def test_wav_constant_amplitude_rms():
    wav = _wav([8192] * 1600)  # 16-bit mono, amplitude 8192 -> 0.25
    feats = mm._real_decode(wav, "audio", dim=4)
    assert feats == [0.25] * 4


def test_wav_stereo_downmix_and_8bit():
    stereo = _wav([16384, -16384] * 800, nch=2)  # L/R cancel -> 0
    assert mm._real_decode(stereo, "audio", dim=2) == [0.0, 0.0]
    eight = _wav([128] * 800, width=1)  # unsigned 8-bit midpoint -> 0
    assert mm._real_decode(eight, "audio", dim=2) == [0.0, 0.0]


# -- dispatch / fallback ----------------------------------------------------


def test_undecodable_raises_and_auto_falls_back(spark):
    jpegish = b"\xff\xd8\xff\xe0" + b"\x42" * 64
    has_pil = mm.media_capabilities()["image_pil"]
    if not has_pil:
        with pytest.raises(NotImplementedError, match="pillow"):
            mm._real_decode(jpegish, "image", dim=4)
    with pytest.raises(NotImplementedError, match="video"):
        mm._real_decode(b"\x00" * 16, "video", dim=4)

    df = spark.createDataFrame(
        [(1, "image", bytearray(jpegish)),
         (2, "image", bytearray(_png(4, 4, [[100] * 4] * 4, ctype=0)))],
        "media_id long, modality string, content binary",
    )
    rows = {
        r["media_id"]: r["features"]
        for r in mm.decode_media(df, decoder="auto", feature_dim=4).collect()
    }
    if not has_pil:  # undecodable row degraded to the fake features
        assert rows[1] == mm._fake_features(jpegish, 4)
    assert rows[2] == [round(100 / 255.0, 6)] * 4  # real PNG decode


def test_decode_media_real_over_spark(spark):
    wav = _wav([8192] * 1600)
    png = _png(8, 8, [[200] * 8] * 8, ctype=0)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "image", bytearray(png))],
        "media_id long, modality string, content binary",
    )
    rows = {
        r["media_id"]: r["features"]
        for r in mm.decode_media(df, decoder="real", feature_dim=4).collect()
    }
    assert rows[1] == [0.25] * 4
    assert rows[2] == [round(200 / 255.0, 6)] * 4


def _grid(h, w, fn):
    return [[fn(y, x) & 0xFF for x in range(w)] for y in range(h)]


def test_avi_mux_demux_roundtrip():
    """The stdlib AVI muxer/demuxer pair: frames survive the container
    byte-exactly (gray pixels → BGR DIB → BT.601 luma is the identity
    for gray)."""
    frames = [
        _grid(6, 8, lambda y, x: 10 * y + x),
        _grid(6, 8, lambda y, x: 255 - (10 * y + x)),
        _grid(6, 8, lambda y, x: (y * x) % 256),
    ]
    b = mm.mux_avi(frames, width=8, height=6, fps=5)
    w, h, raw = mm.demux_avi(b)
    assert (w, h, len(raw)) == (8, 6, 3)
    lum = mm._decode_video_frames(b)
    assert len(lum) == 3
    for want, got in zip(frames, lum):
        for y in range(6):
            for x in range(8):
                assert abs(got[y][x] - want[y][x]) < 1e-9, (y, x)


def test_demux_avi_rejects_non_avi():
    with pytest.raises(NotImplementedError, match="RIFF/AVI"):
        mm.demux_avi(b"\x89PNG not a container")


def test_frame_features_real_video(spark):
    """decoder='real' on a real (muxed) AVI: each planned frame index
    yields THAT frame's luminance chunk means — the demuxer seam filled
    in; decoder='auto' on non-AVI video bytes still degrades to the
    fake byte-suffix features."""
    frames = [
        _grid(6, 8, lambda y, x: 40 * y),
        _grid(6, 8, lambda y, x: 200),
        _grid(6, 8, lambda y, x: x * 30),
    ]
    avi = mm.mux_avi(frames, width=8, height=6)
    df = spark.createDataFrame(
        [
            (
                0,
                "video",
                bytearray(avi),
                ("video", 8, 6, 0, 300, 3),
            )
        ],
        "media_id long, modality string, content binary, "
        f"media_meta {mm.MEDIA_META_SCHEMA}",
    )
    out = mm.frame_features(
        df, every_n=1, max_frames=16, decoder="real", feature_dim=4
    )
    rows = {r.frame_idx: r.features for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    lum = mm._decode_video_frames(avi)
    for i in range(3):
        assert rows[i] == mm._chunk_means(lum[i], 4)
    # frame 1 is flat 200 gray → every chunk mean is 200/255
    assert all(abs(v - round(200 / 255, 6)) < 1e-9 for v in rows[1])

    # auto + non-AVI bytes → fake byte-suffix features, no error
    junk = bytes(range(100))
    df2 = spark.createDataFrame(
        [(1, "video", bytearray(junk), ("video", 8, 6, 0, 300, 2))],
        "media_id long, modality string, content binary, "
        f"media_meta {mm.MEDIA_META_SCHEMA}",
    )
    out2 = mm.frame_features(
        df2, every_n=1, max_frames=4, decoder="auto", feature_dim=4
    )
    got2 = {r.frame_idx: r.features for r in out2.collect()}
    assert got2[0] == mm._fake_features(junk, 4)
    assert got2[1] == mm._fake_features(junk[1:], 4)


def test_decode_media_real_video_asset_features(spark):
    """decode_media decoder='real' on AVI video: asset features = the
    elementwise mean of per-frame chunk means."""
    frames = [_grid(4, 4, lambda y, x: 0), _grid(4, 4, lambda y, x: 255)]
    avi = mm.mux_avi(frames, width=4, height=4)
    df = spark.createDataFrame(
        [(0, "video", bytearray(avi), ("video", 4, 4, 0, 200, 2))],
        "media_id long, modality string, content binary, "
        f"media_meta {mm.MEDIA_META_SCHEMA}",
    )
    feats = (
        mm.decode_media(df, decoder="real", feature_dim=4)
        .collect()[0]
        .features
    )
    # mean of all-0 and all-255 frames → 0.5 everywhere
    assert all(abs(v - 0.5) < 1e-9 for v in feats)


def test_capabilities_shape():
    caps = mm.media_capabilities()
    assert caps["image_png_stdlib"] and caps["audio_wav_stdlib"]
    assert caps["video_avi_stdlib"]
    assert set(caps) == {
        "image_pil",
        "audio_soundfile",
        "image_png_stdlib",
        "audio_wav_stdlib",
        "video_avi_stdlib",
    }


# -- optional-dep paths (run only where the libs exist) ---------------------


def test_pil_path_matches_stdlib_png():
    pytest.importorskip("PIL")
    png = _png(4, 2, [[60] * 4, [180] * 4], ctype=0)
    import numpy as np

    via_pil = mm._decode_image_gray(png)
    via_stdlib = mm._decode_png_gray(png)
    assert np.array_equal(via_pil, via_stdlib)


def test_soundfile_path_reads_wav():
    pytest.importorskip("soundfile")
    wav = _wav([8192] * 1600)
    feats = mm._real_decode(wav, "audio", dim=4)
    assert feats == pytest.approx([0.25] * 4, abs=1e-4)


# -- resize (average-pool grid) ---------------------------------------------


def test_resize_real_grid_exact(spark):
    """A 4x4 image with distinct quadrant values pools exactly to 2x2."""
    rows = (
        [[0, 0, 255, 255]] * 2  # top: left-black, right-white
        + [[255, 255, 0, 0]] * 2  # bottom: inverted
    )
    png = _png(4, 4, rows, ctype=0)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "media_id long, modality string, content binary",
    )
    out = mm.resize_media(df, h=2, w=2, decoder="real").collect()
    assert len(out) == 1
    g = out[0]["grid"]
    assert g == [0.0, 1.0, 1.0, 0.0]
    assert out[0]["h"] == 2 and out[0]["w"] == 2


def test_resize_auto_falls_back_for_nonimage(spark):
    df = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\xff" * 30))],
        "media_id long, modality string, content binary",
    )
    out = mm.resize_media(df, h=2, w=3, decoder="auto").collect()
    # fake fallback: 6 chunk means of a 0x00/0xff alternating stream
    assert len(out[0]["grid"]) == 6
    assert all(0.0 <= v <= 1.0 for v in out[0]["grid"])


def test_resize_smaller_than_grid(spark):
    """A 1x1 image still fills every grid cell (cells repeat the pixel)."""
    png = _png(1, 1, [[255]], ctype=0)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "media_id long, modality string, content binary",
    )
    out = mm.resize_media(df, h=2, w=2, decoder="real").collect()
    assert out[0]["grid"] == [1.0, 1.0, 1.0, 1.0]
