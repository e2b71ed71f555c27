"""Multimodal column-convention tests: binary payload schema, mapInPandas
batch behavior, decode stub, and payload-column pruning."""

import hashlib

import numpy as np

import pytest
from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators import multimodal as M


def test_payload_schema_and_features(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    payloads = M.attach_binary_payload(d)
    assert [f.dataType.simpleString() for f in payloads.schema if f.name == "payload"] == ["binary"]

    feats = {r["doc_id"]: r for r in M.extract_features(payloads).collect()}
    for r in d.collect():
        got = feats[r["doc_id"]]
        raw = r["text"].encode("utf-8")
        assert got["byte_len"] == len(raw)
        assert got["payload_sha256"] == hashlib.sha256(raw).hexdigest()
        assert got["media_type"] == "text/plain"


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        M.decode_image_stub(b"\x89PNG")


def _tiny_png(w, h, rgb=(1, 2, 3)):
    """A COMPLETE, valid PNG written in pure Python (signature + IHDR +
    zlib IDAT + IEND, per RFC 2083) — decodable by any real decoder, so
    this test artifact works identically with and without PIL."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_gif(w, h):
    import struct

    # header + logical screen descriptor + 2-color palette + trailer
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf0\x00\x00" + b"\x00" * 6 + b"\x3b"


def _tiny_jpeg_header(w, h):
    import struct

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return soi + app0 + sof0 + b"\xff\xd9"


def test_decode_images_real(spark):
    """decode_images returns true dimensions/format on a pure-Python-built
    valid PNG — RUNS in every environment (PIL decodes the pixels when
    present; parse_image_header reads the IHDR when not)."""
    df = spark.createDataFrame(
        [(1, _tiny_png(7, 5), "image/png", "{}"), (2, None, "image/png", "{}")],
        M.PAYLOAD_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in M.decode_images(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (7, 5)
    assert rows[1]["format"] == "PNG" and rows[1]["mode"] == "RGB"
    assert rows[2]["width"] is None  # missing media -> NULL features


def test_parse_image_header_formats():
    """The no-deps header parser reads PNG, GIF, JPEG and rejects garbage."""
    assert M.parse_image_header(_tiny_png(640, 480)) == {
        "width": 640,
        "height": 480,
        "mode": "RGB",
        "format": "PNG",
    }
    g = M.parse_image_header(_tiny_gif(12, 34))
    assert (g["width"], g["height"], g["format"]) == (12, 34, "GIF")
    j = M.parse_image_header(_tiny_jpeg_header(1920, 1080))
    assert (j["width"], j["height"], j["mode"], j["format"]) == (
        1920,
        1080,
        "RGB",
        "JPEG",
    )
    assert M.parse_image_header(b"not an image") is None
    assert M.parse_image_header(b"\x89PNG") is None  # truncated: rejected


def test_parse_image_header_bmp_variants():
    """BMP dims come from the DIB-header-size-selected layout: legacy
    BITMAPCOREHEADER (size 12) has unsigned 16-bit dims at offset 18,
    BITMAPINFOHEADER (size 40) signed 32-bit — unpacking '<ii' on a core
    header returns garbage, so the size byte must be consulted first."""
    import struct

    def bmp(dib_size, dims):
        file_hdr = b"BM" + struct.pack("<IHHI", 64, 0, 0, 26)
        return file_hdr + struct.pack("<I", dib_size) + dims + b"\x00" * 24

    info = M.parse_image_header(bmp(40, struct.pack("<ii", 800, -600)))
    assert (info["width"], info["height"], info["format"]) == (800, 600, "BMP")
    core = M.parse_image_header(bmp(12, struct.pack("<HH", 320, 200)))
    assert (core["width"], core["height"], core["format"]) == (320, 200, "BMP")
    # Unknown DIB size: refuse rather than guess a layout.
    assert M.parse_image_header(bmp(16, struct.pack("<HH", 1, 1))) is None


def test_decode_images_rejects_garbage_honestly(spark):
    """An unrecognizable payload is an ERROR (raised), never silently-NULL
    metadata — regardless of whether PIL is installed."""
    df = spark.createDataFrame(
        [(1, b"definitely not an image", "image/png", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        M.decode_images(df).collect()
    msg = str(ei.value)
    assert "unrecognized or truncated" in msg or "cannot identify" in msg


def test_payload_column_pruned_when_untouched(spark, sf_dir, tmp_path):
    """A query that doesn't read the payload must not scan it — the whole
    point of the binary-column convention at 100 TB."""
    d = load_table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "mm.parquet")
    M.attach_binary_payload(d).write.parquet(path)
    q = spark.read.parquet(path).select("doc_id", "media_type")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema:")[1]


def test_resize_stub_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    out = M.resize_images(M.attach_binary_payload(d), width=16, height=8).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["payload"]) == 16 * 8
        assert (r["width"], r["height"]) == (16, 8)
    # deterministic across runs
    again = M.resize_images(M.attach_binary_payload(d), width=16, height=8).collect()
    assert {r["doc_id"]: bytes(r["payload"]) for r in out} == {
        r["doc_id"]: bytes(r["payload"]) for r in again
    }


def test_sample_frames_cardinality(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    frames = M.sample_frames(M.attach_binary_payload(d), n_frames=4)
    rows = frames.collect()
    assert len(rows) == 40  # one row per (doc, frame)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def _tiny_wav(seconds, sample_rate=8000, channels=1, bits=16):
    """A complete PCM WAV built in pure Python (RIFF + fmt + data)."""
    import struct

    byte_rate = sample_rate * channels * bits // 8
    n = byte_rate * seconds
    body = b"\x00" * n
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * bits // 8, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", n)
        + body
    )


def test_parse_wav_header_and_real_chunking(spark):
    """chunk_audio derives the TRUE byte rate from a real WAV header: a
    25-second 8 kHz mono 16-bit file (16000 B/s) chunks into 3 pieces at
    10 s regardless of the (wrong) bytes_per_ms fallback argument."""
    wav = _tiny_wav(25)
    meta = M.parse_wav_header(wav)
    assert meta["sample_rate"] == 8000 and meta["byte_rate"] == 16000
    assert meta["duration_ms"] == 25_000
    assert M.parse_wav_header(b"RIFFxxxx") is None
    assert M.parse_wav_header(b"not audio") is None

    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    out = sorted(
        M.chunk_audio(df, chunk_ms=10_000, bytes_per_ms=999).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert len(out) == 3
    assert (out[-1]["start_ms"], out[-1]["end_ms"]) == (20_000, 25_000)
    assert len(bytes(out[-1]["chunk"])) == 5_000 * 16  # 5s at 16000 B/s
    # data section only — the 44-byte header is not chunked as audio
    assert sum(len(bytes(r["chunk"])) for r in out) == 25 * 16000


def _tiny_y4m(w, h, n):
    """A complete YUV4MPEG2 clip in pure Python: frame f filled with byte
    value f (C420 planes: w*h*3/2 bytes per frame)."""
    fb = w * h * 3 // 2
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    return head + b"".join(b"FRAME\n" + bytes([f]) * fb for f in range(n))


def test_sample_frames_real_y4m(spark):
    """On a real Y4M payload, sample_frames extracts ACTUAL evenly-spaced
    raw frames (frame k of 4 over 10 source frames = source frames
    0,2,5,7 — identifiable by their fill bytes), not byte slices."""
    clip = _tiny_y4m(4, 2, 10)
    meta = M.parse_y4m_header(clip)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (4, 2, 10)
    assert meta["frame_bytes"] == 12
    assert M.parse_y4m_header(b"not video") is None

    df = spark.createDataFrame([(1, bytearray(clip))], "doc_id long, payload binary")
    out = sorted(M.sample_frames(df, n_frames=4).collect(), key=lambda r: r["frame_idx"])
    assert len(out) == 4
    fills = [bytes(r["frame"])[0] for r in out]
    assert fills == [0, 2, 5, 7]
    assert all(len(bytes(r["frame"])) == 12 for r in out)
    # fewer source frames than requested: emit what exists, no padding
    short = spark.createDataFrame(
        [(2, bytearray(_tiny_y4m(4, 2, 2)))], "doc_id long, payload binary"
    )
    assert M.sample_frames(short, n_frames=4).count() == 2


def test_chunk_audio_cardinality_and_bounds(spark):
    from ingest_fast_spark.operators.multimodal import chunk_audio

    # 25 KB payload at 1 byte/ms, 10s chunks → 3 chunks (10k, 10k, 5k ms)
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 25_000)), (2, bytearray(b"y" * 100))],
        "doc_id long, payload binary",
    )
    out = chunk_audio(df, chunk_ms=10_000, bytes_per_ms=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    last = sorted(by_doc[1], key=lambda r: r["chunk_idx"])[-1]
    assert (last["start_ms"], last["end_ms"]) == (20_000, 25_000)
    assert len(bytes(last["chunk"])) == 5_000
    short = by_doc[2][0]
    assert (short["start_ms"], short["end_ms"]) == (0, 100)


def _sine_wav(freq=1000, seconds=1, sample_rate=8000, amp=0.5):
    """16-bit mono PCM WAV: first half a sine at `freq`, second half
    digital silence — features are analytically known."""
    import math
    import struct

    n = sample_rate * seconds
    samples = []
    for i in range(n):
        if i < n // 2:
            samples.append(int(amp * 32767 * math.sin(2 * math.pi * freq * i / sample_rate)))
        else:
            samples.append(0)
    body = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def test_audio_features_real_dsp(spark):
    """audio_features computes true signal statistics: a half-sine /
    half-silence recording has RMS ~ amp/2 (sine RMS amp/sqrt(2) over half
    the samples), silence_ratio ~ 0.5, and ZCR ~ 2*freq/sample_rate over
    the sine half; a non-WAV payload yields NULL features (honest)."""
    wav = _sine_wav(freq=1000, seconds=1, sample_rate=8000, amp=0.5)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio at all"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in M.audio_features(df).collect()}
    r = rows[1]
    assert r["sample_rate"] == 8000 and r["n_samples"] == 8000
    assert r["duration_ms"] == 1000
    # sine RMS over whole file = amp/sqrt(2) * sqrt(1/2) = amp/2
    assert abs(r["rms"] - 0.25) < 0.01
    assert abs(r["peak"] - 0.5) < 0.01
    # half the file is digital silence, PLUS the sine's exact-zero grid
    # samples: 1 kHz at 8 kHz = 8 samples/period of which 2 are exactly 0,
    # so silence = 0.5 + 0.5 * 2/8 = 0.625 analytically
    assert abs(r["silence_ratio"] - 0.625) < 0.01
    # 1 kHz sine at 8 kHz: 2000 crossings/s over half the file -> ~0.125
    assert 0.10 <= r["zero_crossing_rate"] <= 0.15
    assert rows[2]["rms"] is None and rows[2]["duration_ms"] is None


def _png_with_filters(w, h, channels, filter_types, seed=7):
    """A valid PNG whose rows use the GIVEN filter types: pixels are
    deterministic pseudo-random, rows are FORWARD-filtered per spec in
    the test, so the decoder's unfilter is checked against ground truth."""
    import random
    import struct
    import zlib

    rng = random.Random(seed)
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    px = [[rng.randrange(256) for _ in range(w * channels)] for _ in range(h)]
    raw = bytearray()
    prev = [0] * (w * channels)
    for row, ft in zip(px, filter_types):
        raw.append(ft)
        for x in range(w * channels):
            a = row[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if ft == 0:
                enc = row[x]
            elif ft == 1:
                enc = (row[x] - a) & 0xFF
            elif ft == 2:
                enc = (row[x] - b) & 0xFF
            elif ft == 3:
                enc = (row[x] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (row[x] - pred) & 0xFF
            raw.append(enc)
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    return png, px


def test_decode_png_pixels_all_filter_types():
    """The pure-Python PNG decoder must reverse every RFC-2083 scanline
    filter (None/Sub/Up/Average/Paeth) exactly, for L and RGBA channel
    counts — checked against ground-truth pixels forward-filtered in the
    test itself."""
    for channels in (1, 3, 4):
        png, px = _png_with_filters(9, 5, channels, [0, 1, 2, 3, 4])
        out = M.decode_png_pixels(png)
        assert (out["width"], out["height"]) == (9, 5)
        got = out["pixels"].reshape(5, 9 * channels).tolist()
        assert got == px, f"channels={channels}"


def test_decode_png_pixels_honest_gates():
    """Corrupt IDAT raises ValueError; unsupported shapes raise
    NotImplementedError; and decode_images' no-PIL path catches corrupt
    PNG DATA (not just headers) via the real decoder."""
    import struct
    import zlib

    import pytest as _pytest

    png, _ = _png_with_filters(4, 3, 3, [0, 0, 0])
    # flip bytes inside the IDAT payload -> zlib stream corrupt
    bad = bytearray(png)
    idat_at = bytes(png).index(b"IDAT") + 4
    bad[idat_at + 2] ^= 0xFF
    bad[idat_at + 3] ^= 0xFF
    with _pytest.raises(ValueError):
        M.decode_png_pixels(bytes(bad))
    with _pytest.raises(ValueError):
        M.decode_png_pixels(b"not a png")
    # 16-bit depth: honest NotImplementedError, never garbage pixels

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + chunk(b"IEND", b"")
    )
    # 16-bit is supported since round 9: decodes to uint16 zeros
    out16 = M.decode_png_pixels(png16)
    assert out16["pixels"].dtype.name == "uint16" and not out16["pixels"].any()
    # an ILLEGAL depth/color combination stays a hard error
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    with _pytest.raises(ValueError, match="illegal"):
        M.decode_png_pixels(
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_bad)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
        )


def test_decode_images_catches_corrupt_png_data_without_pil(spark):
    """A payload with a VALID PNG header but corrupt pixel data must fail
    decode_images even when PIL is absent — the real decoder validates
    the IDAT stream, the r4 header-only path could not."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: its decoder covers this case")
    except ImportError:
        pass
    png, _ = _png_with_filters(6, 4, 3, [0, 4, 2, 1])
    bad = bytearray(png)
    idat_at = bytes(png).index(b"IDAT") + 4
    bad[idat_at + 4] ^= 0xAA
    bad[idat_at + 5] ^= 0xAA
    df = spark.createDataFrame(
        [(1, bytes(bad), "image/png", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        M.decode_images(df).collect()
    assert "corrupt PNG" in str(ei.value) or "expected" in str(ei.value)


def test_resize_png_real_nearest_neighbor(spark):
    """PNG payloads resize through the REAL decoder: a 4x4 quadrant image
    (distinct solid color per 2x2 quadrant) downsampled to 2x2 must yield
    exactly the four quadrant colors; upsampled 2x2->4x4 must replicate
    each source pixel into a 2x2 block."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def rgb_png(rows):  # rows: list of list of (r,g,b)
        h, w = len(rows), len(rows[0])
        raw = b"".join(
            b"\x00" + b"".join(bytes(p) for p in r) for r in rows
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    A, B, C, D = (10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 40, 40)
    quad = rgb_png([[A, A, B, B], [A, A, B, B], [C, C, D, D], [C, C, D, D]])
    df = spark.createDataFrame(
        [(1, quad, "image/png", "{}")], M.PAYLOAD_SCHEMA
    )
    out = M.resize_images(df, width=2, height=2).collect()[0]
    assert bytes(out["payload"]) == bytes(A) + bytes(B) + bytes(C) + bytes(D)

    tiny = rgb_png([[A, B], [C, D]])
    df2 = spark.createDataFrame([(2, tiny, "image/png", "{}")], M.PAYLOAD_SCHEMA)
    up = M.resize_images(df2, width=4, height=4).collect()[0]
    got = bytes(up["payload"])
    expect = (
        (bytes(A) * 2 + bytes(B) * 2) * 2 + (bytes(C) * 2 + bytes(D) * 2) * 2
    )
    assert got == expect


def test_decode_gif_pixels_roundtrip_plain_and_interlaced():
    """make_gif -> decode_gif_pixels reproduces the exact palette-mapped
    pixel grid, in natural row order, for both non-interlaced and
    four-pass-interlaced encodings."""
    import numpy as np

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    w, h = 5, 9
    idx = [(r * w + c) % 4 for r in range(h) for c in range(w)]
    expect = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(h, w, 3)
    for inter in (False, True):
        out = M.decode_gif_pixels(M.make_gif(w, h, pal, idx, interlaced=inter))
        assert (out["width"], out["height"], out["format"]) == (w, h, "GIF")
        assert out["pixels"].shape == (h, w, 3)
        assert (out["pixels"] == expect).all(), f"interlaced={inter}"


def test_decode_gif_pixels_rejects_garbage_and_truncation():
    import pytest as _pytest

    good = M.make_gif(4, 4, [(1, 2, 3)])
    for bad in (b"", b"NOTGIF" + b"\x00" * 30, good[:12], good[:-8]):
        with _pytest.raises(ValueError):
            M.decode_gif_pixels(bad)
    # the color table pads to a power of two: an index landing on a padded
    # slot decodes to that slot's (black) entry — in-table by construction
    out = M.decode_gif_pixels(M.make_gif(2, 1, [(9, 9, 9), (8, 8, 8)], [0, 3]))
    assert out["pixels"][0, 1].tolist() == [0, 0, 0]


def test_decode_images_catches_corrupt_gif_data_without_pil(spark):
    """A payload with a VALID GIF header but a corrupt LZW stream fails
    decode_images even without PIL — the real decoder validates the
    compressed data, the header-only path could not."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: its decoder covers this case")
    except ImportError:
        pass
    good = M.make_gif(6, 6, [(1, 2, 3), (4, 5, 6)], [i % 2 for i in range(36)])
    # cut the LZW stream in half: the decoded prefix is shorter than w*h
    truncated = bytes(good[: len(good) // 2])
    df = spark.createDataFrame(
        [(1, truncated, "image/gif", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        M.decode_images(df).collect()
    assert "GIF" in str(ei.value) or "expected" in str(ei.value)


def test_resize_gif_real_nearest_neighbor(spark):
    """GIF payloads resize through the REAL decoder: a 4x4 quadrant image
    (distinct palette color per 2x2 quadrant) downsampled to 2x2 yields
    exactly the four quadrant colors."""
    import numpy as np

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    idx = [0, 0, 1, 1,
           0, 0, 1, 1,
           2, 2, 3, 3,
           2, 2, 3, 3]
    gif = M.make_gif(4, 4, pal, idx)
    df = spark.createDataFrame([(1, gif, "image/gif", "{}")], M.PAYLOAD_SCHEMA)
    out = M.resize_images(df, width=2, height=2).collect()[0]
    px = np.frombuffer(out["payload"], dtype=np.uint8).reshape(2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [255, 255, 0]


def test_decode_bmp_pixels_roundtrip_bottomup_and_topdown():
    """make_bmp -> decode_bmp_pixels reproduces the exact RGB pixel grid
    in natural row order for both bottom-up (positive height) and
    top-down (negative height) storage, including 4-byte row padding
    (w=3 -> 9-byte rows pad to 12)."""
    import numpy as np

    w, h = 3, 4
    rows = [
        [((r * 50 + c * 10) % 256, (c * 80) % 256, (r * 90) % 256) for c in range(w)]
        for r in range(h)
    ]
    expect = np.array(rows, dtype=np.uint8)
    for td in (False, True):
        out = M.decode_bmp_pixels(M.make_bmp(w, h, rgb_rows=rows, top_down=td))
        assert (out["width"], out["height"], out["format"]) == (w, h, "BMP")
        assert out["pixels"].shape == (h, w, 3)
        assert (out["pixels"] == expect).all(), f"top_down={td}"


def test_decode_bmp_pixels_honest_gates():
    import struct

    import pytest as _pytest

    good = M.make_bmp(4, 4, rgb=(10, 20, 30))
    for bad in (b"", b"NOTABMP" + b"\x00" * 40, good[:20], good[:-8]):
        with _pytest.raises(ValueError):
            M.decode_bmp_pixels(bad)
    # RLE8 is now a real decode path — but only for bottom-up 8-bit data;
    # claiming it on a 24-bit bitmap is malformed -> ValueError
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    with _pytest.raises(ValueError):
        M.decode_bmp_pixels(bytes(rle))
    # RLE4 stays an honest NotImplementedError gate
    rle4 = bytearray(good)
    rle4[28:30] = struct.pack("<H", 4)
    rle4[30:34] = struct.pack("<I", 2)
    with _pytest.raises(NotImplementedError):
        M.decode_bmp_pixels(bytes(rle4))
    # unsupported bit depth (16bpp) -> NotImplementedError
    b16 = bytearray(good)
    b16[28:30] = struct.pack("<H", 16)
    with _pytest.raises(NotImplementedError):
        M.decode_bmp_pixels(bytes(b16))


def test_decode_bmp_pixels_8bit_palette():
    """A hand-built 8-bit paletted BMP (BGRX color table) decodes through
    the palette to RGB; an index past the table raises."""
    import struct

    import pytest as _pytest

    w, h = 2, 2
    pal = [(250, 0, 0), (0, 250, 0), (0, 0, 250)]
    table = b"".join(bytes((bl, g, r, 0)) for (r, g, bl) in pal)
    stride = (w + 3) & ~3
    idx_rows = [[0, 1], [2, 0]]  # natural order
    pixel = b"".join(
        bytes(row) + b"\x00" * (stride - w) for row in idx_rows[::-1]
    )
    data_off = 14 + 40 + len(table)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixel), 0, 0, len(pal), 0)
    head = struct.pack("<2sIHHI", b"BM", data_off + len(pixel), 0, 0, data_off)
    out = M.decode_bmp_pixels(head + info + table + pixel)
    assert out["pixels"][0, 0].tolist() == [250, 0, 0]
    assert out["pixels"][0, 1].tolist() == [0, 250, 0]
    assert out["pixels"][1, 0].tolist() == [0, 0, 250]
    assert out["pixels"][1, 1].tolist() == [250, 0, 0]
    bad_pixel = b"".join(
        bytes(row) + b"\x00" * (stride - w) for row in [[0, 9], [2, 0]][::-1]
    )
    with _pytest.raises(ValueError):
        M.decode_bmp_pixels(head + info + table + bad_pixel)


def test_decode_images_catches_truncated_bmp_without_pil(spark):
    """A payload with a VALID BMP header but a truncated pixel array fails
    decode_images even without PIL — the real decoder validates the pixel
    payload length, the header-only path could not."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: its decoder covers this case")
    except ImportError:
        pass
    good = M.make_bmp(8, 8, rgb=(5, 6, 7))
    truncated = bytes(good[: len(good) - 40])
    df = spark.createDataFrame(
        [(1, truncated, "image/bmp", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        M.decode_images(df).collect()
    assert "BMP" in str(ei.value) or "expected" in str(ei.value)


def test_resize_bmp_real_nearest_neighbor(spark):
    """BMP payloads resize through the REAL decoder: a 4x4 quadrant image
    downsampled to 2x2 yields exactly the four quadrant colors."""
    import numpy as np

    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    rows = [
        [q[0], q[0], q[1], q[1]],
        [q[0], q[0], q[1], q[1]],
        [q[2], q[2], q[3], q[3]],
        [q[2], q[2], q[3], q[3]],
    ]
    bmp = M.make_bmp(4, 4, rgb_rows=rows)
    df = spark.createDataFrame([(1, bmp, "image/bmp", "{}")], M.PAYLOAD_SCHEMA)
    out = M.resize_images(df, width=2, height=2).collect()[0]
    px = np.frombuffer(out["payload"], dtype=np.uint8).reshape(2, 2, 3)
    assert [px[0, 0].tolist(), px[0, 1].tolist(), px[1, 0].tolist(), px[1, 1].tolist()] == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]
    ]


def test_bmp_codec_property_roundtrip():
    """Property: ANY rgb grid round-trips through make_bmp →
    decode_bmp_pixels for every (width, height, row-order) combination —
    including widths whose 3·w byte rows hit each of the four possible
    stride paddings. Pure-Python, no Spark session needed."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=7),
        st.booleans(),
        st.randoms(use_true_random=False),
    )
    def check(w, h, td, rnd):
        rows = [
            [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        out = M.decode_bmp_pixels(M.make_bmp(w, h, rgb_rows=rows, top_down=td))
        assert out["pixels"].shape == (h, w, 3)
        assert (out["pixels"] == np.array(rows, dtype=np.uint8)).all()

    check()


def test_png_palette_pixel_roundtrip():
    """Paletted PNG (color type 3): indices map through PLTE to the exact
    RGB grid, under all three synthesizer scanline pre-filters — the pixel
    ground truth behind multimodal_png_palette_roundtrip's metadata
    oracle."""
    import numpy as np

    pal = [(10, 20, 30), (200, 100, 5), (0, 0, 255), (255, 255, 0)]
    for ft in (0, 1, 2):
        w, h = 7, 5
        idx = [(i * 3 + ft) % 4 for i in range(w * h)]
        out = M.decode_png_pixels(M.make_png_palette(w, h, pal, idx, filter_type=ft))
        assert out["mode"] == "P" and out["format"] == "PNG"
        assert (out["width"], out["height"]) == (w, h)
        exp = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(h, w, 3)
        assert (out["pixels"] == exp).all()


def test_png_palette_honest_gates():
    import struct
    import zlib

    import pytest as _pytest

    # index beyond the palette: honest ValueError, never a guessed pixel
    with _pytest.raises(ValueError, match="palette index"):
        M.decode_png_pixels(M.make_png_palette(2, 2, [(1, 2, 3)], [0, 0, 0, 1]))

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
    # paletted stream with no PLTE chunk at all
    with _pytest.raises(ValueError, match="PLTE"):
        M.decode_png_pixels(sig + ihdr + idat + chunk(b"IEND", b""))


def test_png_subbyte_depth_matrix():
    """1/2/4-bit palette AND grayscale PNGs: bit-packed rows unfilter at
    the byte level (bpp=1 per the spec) and unpack exactly, under all
    three synthesizer filters and odd widths that force row padding;
    grayscale expands with the 255/(2^d-1) rule (1-bit reports PIL's
    mode '1')."""
    import numpy as np

    for depth in (1, 2, 4):
        nc = 1 << depth
        pal = [(i * 16 % 256, 255 - i * 16 % 256, i * 7 % 256) for i in range(nc)]
        for ft in (0, 1, 2):
            for w, h in ((7, 3), (9, 4), (16, 2)):
                idx = [(i + ft) % nc for i in range(w * h)]
                out = M.decode_png_pixels(
                    M.make_png_palette(w, h, pal, idx, filter_type=ft, depth=depth)
                )
                exp = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(h, w, 3)
                assert (out["pixels"] == exp).all(), (depth, ft, w, h)
                assert out["mode"] == "P"
        mx = nc - 1
        vals = [(i * 3) % nc for i in range(11 * 3)]
        out = M.decode_png_pixels(
            M.make_png_gray(11, 3, vals, depth=depth, filter_type=1)
        )
        exp = (np.array(vals, dtype=np.uint16) * 255 // mx).astype(np.uint8)
        assert (out["pixels"].ravel() == exp).all()
        assert out["mode"] == ("1" if depth == 1 else "L")


def test_png_palette_trns_alpha():
    """Palette transparency: a tRNS chunk turns the decode into (h,w,4)
    RGBA — per-index alpha, entries beyond the table opaque per spec —
    while mode stays PIL's 'P'; a tRNS longer than the palette is a
    ValueError."""
    import struct

    import numpy as np
    import pytest as _pytest

    def with_trns(png_bytes, trns):
        sig, rest = png_bytes[:8], png_bytes[8:]
        out, i = sig, 0
        while i < len(rest):
            (ln,) = struct.unpack(">I", rest[i : i + 4])
            typ = rest[i + 4 : i + 8]
            out += rest[i : i + 12 + ln]
            if typ == b"PLTE":
                out += M._png_chunk(b"tRNS", bytes(trns))
            i += 12 + ln
        return out

    pal = [(10, 20, 30), (200, 100, 5), (0, 0, 255)]
    for depth in (8, 4, 2):
        w, h = 5, 4
        idx = [i % 3 for i in range(w * h)]
        png = with_trns(
            M.make_png_palette(w, h, pal, idx, filter_type=1, depth=depth), [0, 128]
        )
        out = M.decode_png_pixels(png)
        assert out["mode"] == "P" and out["pixels"].shape == (h, w, 4)
        ia = np.array(idx).reshape(h, w)
        assert (out["pixels"][:, :, 3] == np.array([0, 128, 255], np.uint8)[ia]).all()
        assert (out["pixels"][:, :, :3] == np.array(pal, np.uint8)[ia]).all()
    with _pytest.raises(ValueError, match="tRNS longer"):
        M.decode_png_pixels(
            with_trns(M.make_png_palette(2, 2, [(1, 2, 3)], [0, 0, 0, 0]), [1, 2, 3])
        )


def test_png_codec_roundtrip_property():
    """Property: ANY (w, h, depth, filter, palette, indices) combination
    the synthesizer can express round-trips bit-exactly through the
    decoder — hypothesis drives the packing/unfiltering corners (w=1
    columns, single rows, full-byte boundaries) the example tests can
    miss."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 13),
        h=st.integers(1, 7),
        depth=st.sampled_from([1, 2, 4, 8]),
        ft=st.sampled_from([0, 1, 2]),
        data=st.data(),
    )
    def check(w, h, depth, ft, data):
        nc = min(1 << depth, 6)
        pal = [(i * 41 % 256, i * 97 % 256, i * 13 % 256) for i in range(nc)]
        idx = data.draw(
            st.lists(st.integers(0, nc - 1), min_size=w * h, max_size=w * h)
        )
        out = M.decode_png_pixels(
            M.make_png_palette(w, h, pal, idx, filter_type=ft, depth=depth)
        )
        exp = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(h, w, 3)
        assert (out["pixels"] == exp).all()
        mx = (1 << depth) - 1
        vals = data.draw(
            st.lists(st.integers(0, mx), min_size=w * h, max_size=w * h)
        )
        g = M.decode_png_pixels(
            M.make_png_gray(w, h, vals, depth=depth, filter_type=ft)
        )
        expg = (np.array(vals, dtype=np.uint32) * 255 // max(mx, 1)).astype(np.uint8)
        assert (g["pixels"].ravel() == expg).all()

    check()


def test_png_16bit_minimal_decodes():
    """The r8 gate is CLOSED: a minimal 16-bit grayscale PNG now decodes
    to full-precision uint16 pixels (2x1, values 0x0102 and 0x0304)."""
    import struct
    import zlib

    ihdr = M._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + ihdr
        + M._png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03\x04"))
        + M._png_chunk(b"IEND", b"")
    )
    out = M.decode_png_pixels(png)
    assert out["mode"] == "I" and out["pixels"].dtype == np.uint16
    assert out["pixels"].reshape(-1).tolist() == [0x0102, 0x0304]


def test_ahash_palette_png_matches_bmp():
    """Cross-format invariance including the paletted path: the SAME pixel
    grid as an indexed PNG (256-gray PLTE) and as a truecolor BMP hashes
    identically — aHash fingerprints content, not containers or palettes."""
    w, h = 8, 8
    grid = [[(r * 37 + c * 11) % 256 for c in range(w)] for r in range(h)]
    rows = [[(v, v, v) for v in row] for row in grid]
    bmp_px = M.decode_bmp_pixels(M.make_bmp(w, h, rgb_rows=rows))["pixels"]
    pal = [(v, v, v) for v in range(256)]
    png_px = M.decode_png_pixels(
        M.make_png_palette(w, h, pal, [v for row in grid for v in row], filter_type=1)
    )["pixels"]
    assert M.ahash_pixels(png_px) == M.ahash_pixels(bmp_px)


def test_ahash_cross_format_invariance(spark):
    """The SAME pixel grid encoded as PNG and as BMP must produce the SAME
    perceptual hash — aHash fingerprints content, not containers."""
    import numpy as np

    w, h = 8, 8
    rows = [
        [((r * 37 + c * 11) % 256,) * 3 for c in range(w)] for r in range(h)
    ]
    bmp = M.make_bmp(w, h, rgb_rows=rows)
    png_px = M.decode_bmp_pixels(bmp)["pixels"]
    # rebuild the identical grid as a PNG (make_png is solid-fill only, so
    # hash the decoded arrays directly for the cross-check)
    h_bmp = M.ahash_pixels(png_px)
    df = spark.createDataFrame([(1, bmp, "image/bmp", "{}")], M.PAYLOAD_SCHEMA)
    h_op = M.ahash_images(df).collect()[0]["ahash"]
    assert h_op == h_bmp
    # grayscale path: a 2-D array hashes like its 3-channel broadcast
    assert M.ahash_pixels(png_px.mean(axis=2)) == h_bmp
    assert isinstance(h_bmp, int) and -(2**63) <= h_bmp < 2**63
    # solid images are the degenerate all-ones grid regardless of color
    s1 = M.ahash_pixels(np.full((4, 4, 3), 10, dtype=np.uint8))
    s2 = M.ahash_pixels(np.full((16, 16, 3), 200, dtype=np.uint8))
    assert s1 == s2


def test_ahash_locality_and_distinctness(spark):
    """Distinct planted patterns get distinct hashes; flipping one 8th of
    the image moves the hash by a SMALL hamming distance (the property
    banded near-dup bucketing relies on)."""

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    hashes = []
    for p in range(7):
        row = [(0, 0, 0)] * (p + 1) + [(255, 255, 255)] * (7 - p)
        hashes.append(
            M.ahash_pixels(M.decode_bmp_pixels(M.make_bmp(8, 8, rgb_rows=[row] * 8))["pixels"])
        )
    assert len(set(hashes)) == 7
    # neighbors differ by exactly one 8-cell column => hamming 8
    assert all(ham(hashes[i], hashes[i + 1]) == 8 for i in range(6))
    assert ham(hashes[0], hashes[6]) == 48


def test_ahash_null_and_undecodable(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, None, "image/bmp", "{}")], M.PAYLOAD_SCHEMA)
    assert M.ahash_images(df).collect()[0]["ahash"] is None
    bad = spark.createDataFrame(
        [(2, b"not an image at all", "image/bmp", "{}")], M.PAYLOAD_SCHEMA
    )
    with _pytest.raises(Exception) as ei:
        M.ahash_images(bad).collect()
    assert "pixel decoder" in str(ei.value) or "PIL" in str(ei.value)


def test_ahash_near_dups_banded_hamming(spark):
    """Banded-hamming near-dup pairs: the seven planted split patterns
    (adjacent splits differ by exactly one 8-bit column, hamming 8) must
    pair exactly adjacent patterns at radius 8 — candidates via the
    column-band keys, verified by exact popcount, no misses, no extras."""
    rows_for = lambda p: [
        [(0, 0, 0)] * (p + 1) + [(255, 255, 255)] * (7 - p)
    ] * 8
    hashes = [
        (p, M.ahash_pixels(M.decode_bmp_pixels(M.make_bmp(8, 8, rgb_rows=rows_for(p)))["pixels"]))
        for p in range(7)
    ]
    df = spark.createDataFrame(hashes, "doc_id long, ahash long")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.ahash_near_dups(df, max_hamming=8).collect()
    }
    assert pairs == {(p, p + 1): 8 for p in range(6)}, pairs
    # radius 16 adds the distance-2 pattern pairs and nothing else
    pairs16 = set(
        (r["doc_a"], r["doc_b"])
        for r in M.ahash_near_dups(df, max_hamming=16).collect()
    )
    assert pairs16 == {(p, p + 1) for p in range(6)} | {(p, p + 2) for p in range(5)}
    # identical hashes pair at distance 0
    dup = spark.createDataFrame(
        [(1, hashes[0][1]), (2, hashes[0][1])], "doc_id long, ahash long"
    )
    out = M.ahash_near_dups(dup, max_hamming=0).collect()
    assert [(out[0]["doc_a"], out[0]["doc_b"], out[0]["hamming"])] == [(1, 2, 0)]


def test_make_y4m_parses_and_scene_cuts_detected(spark):
    """make_y4m produces a conformant mono clip (header parser recovers
    geometry and frame count) and detect_scene_cuts finds exactly the
    planted boundaries with their exact mean deltas — gradual drift below
    the threshold is NOT a cut."""
    clip = M.make_y4m(4, 4, [10, 10, 200, 200, 90, 90])
    meta = M.parse_y4m_header(clip)
    assert (meta["width"], meta["height"], meta["chroma"], meta["n_frames"]) == (
        4, 4, "mono", 6,
    )
    df = spark.createDataFrame(
        [(1, clip, "video/x-yuv4mpeg", "{}")], M.PAYLOAD_SCHEMA
    )
    rows = sorted(
        (r["cut_frame"], r["delta"])
        for r in M.detect_scene_cuts(df, threshold=50.0).collect()
    )
    assert rows == [(2, 190.0), (4, 110.0)]
    # below-threshold motion produces no cuts
    calm = M.make_y4m(4, 4, [100, 110, 120, 130])
    df2 = spark.createDataFrame(
        [(2, calm, "video/x-yuv4mpeg", "{}")], M.PAYLOAD_SCHEMA
    )
    assert M.detect_scene_cuts(df2, threshold=50.0).count() == 0


def test_scene_cuts_null_and_non_y4m(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, None, "video/x-yuv4mpeg", "{}")], M.PAYLOAD_SCHEMA
    )
    assert M.detect_scene_cuts(df).count() == 0
    bad = spark.createDataFrame(
        [(2, b"\x00\x00\x00 ftypmp42 fake mp4", "video/mp4", "{}")],
        M.PAYLOAD_SCHEMA,
    )
    with _pytest.raises(Exception) as ei:
        M.detect_scene_cuts(bad).collect()
    assert "Y4M" in str(ei.value) or "ffmpeg" in str(ei.value)


def test_make_wav_roundtrips_through_header_and_features(spark):
    """make_wav produces a conformant RIFF container (header parser
    recovers rate/bits/duration) and audio_features measures the analytic
    statistics of a known signal exactly."""
    import numpy as np

    # 400 samples alternating +8192/-8192 at 8 kHz: rms=peak=0.25, zcr=1
    sign = 1 - 2 * (np.arange(400) % 2)
    wav = M.make_wav((sign * 8192).astype("<i2"), sample_rate=8000)
    meta = M.parse_wav_header(wav)
    assert (meta["sample_rate"], meta["bits_per_sample"], meta["duration_ms"]) == (
        8000, 16, 50,
    )
    df = spark.createDataFrame([(1, wav, "audio/wav", "{}")], M.PAYLOAD_SCHEMA)
    r = M.audio_features(df).collect()[0]
    assert (r["n_samples"], r["rms"], r["peak"], r["zero_crossing_rate"]) == (
        400, 0.25, 0.25, 1.0,
    )
    assert r["silence_ratio"] == 0.0


def test_phash_cross_format_invariance():
    """The SAME pixel grid as truecolor BMP, paletted PNG, and GIF hashes
    to the SAME 64-bit DCT pHash — the re-encode invariance crawl-image
    dedup keys on (all three decoders are lossless)."""
    w, h = 16, 16
    grid = [[(r * 37 + c * 11) % 256 for c in range(w)] for r in range(h)]
    rows = [[(v, v, v) for v in row] for row in grid]
    pal = [(v, v, v) for v in range(256)]
    idx = [v for row in grid for v in row]
    bmp_px = M.decode_bmp_pixels(M.make_bmp(w, h, rgb_rows=rows))["pixels"]
    png_px = M.decode_png_pixels(M.make_png_palette(w, h, pal, idx))["pixels"]
    gif_px = M.decode_gif_pixels(M.make_gif(w, h, palette=pal, indices=idx))["pixels"]
    hs = {M.phash_pixels(p) for p in (bmp_px, png_px, gif_px)}
    assert len(hs) == 1
    v = hs.pop()
    assert isinstance(v, int) and -(2**63) <= v < 2**63


def test_phash_brightness_contrast_invariance():
    """pHash is invariant to positive affine pixel transforms a*x + b
    (a>0): scaling multiplies every AC coefficient AND their median by a;
    the offset lands only in the excluded DC term. aHash does NOT have
    this property — it's pHash's reason to exist."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(40, 100, size=(32, 32)).astype(np.uint8)
    h0 = M.phash_pixels(base)
    # contrast x2 + brightness +30 stays inside [0,255] for this range
    assert M.phash_pixels((base.astype(np.int64) * 2 + 30).astype(np.uint8)) == h0
    assert M.phash_pixels(base.astype(np.int64) + 77) == h0
    # grayscale 2-D input hashes like its 3-channel broadcast
    assert M.phash_pixels(np.repeat(base[:, :, None], 3, axis=2)) == h0


def test_phash_distinctness_and_operator(spark):
    """Distinct planted vertical-split patterns get distinct pHashes, and
    the mapInPandas operator returns the same values as the pure function;
    NULL payload -> NULL hash, undecodable payload raises honestly."""
    pats = []
    for p in range(5):
        split = 2 * (p + 1)
        row = [(0, 0, 0)] * split + [(255, 255, 255)] * (16 - split)
        pats.append(M.make_bmp(16, 16, rgb_rows=[row] * 16))
    expect = [M.phash_pixels(M.decode_bmp_pixels(b)["pixels"]) for b in pats]
    assert len(set(expect)) == 5
    df = spark.createDataFrame(
        [(i, b, "image/bmp", "{}") for i, b in enumerate(pats)] + [(9, None, "image/bmp", "{}")],
        M.PAYLOAD_SCHEMA,
    )
    got = {r["doc_id"]: r["phash"] for r in M.phash_images(df).collect()}
    assert [got[i] for i in range(5)] == expect
    assert got[9] is None
    bad = spark.createDataFrame([(2, b"junk bytes", "image/bmp", "{}")], M.PAYLOAD_SCHEMA)
    with pytest.raises(Exception) as ei:
        M.phash_images(bad).collect()
    assert "pixel decoder" in str(ei.value)


# ---------------------------------------------------------------------------
# BI_RLE8 compressed BMP (the round-7 gate closure)
# ---------------------------------------------------------------------------


def test_bmp_rle8_roundtrip_all_constructs():
    import numpy as np

    from ingest_fast_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp_rle8,
    )

    pal = [(10, 20, 30), (200, 100, 50), (0, 255, 0)]
    rows = [
        [0, 0, 0, 1, 1, 1, 1, 2],  # runs + a single
        [1, 2, 0, 2, 1, 0, 2, 1],  # literal stretch -> absolute mode
        [2, 2, 2, 2, 2, 2, 2, 2],  # full-row run
    ]
    exp = np.array(pal, dtype=np.uint8)[np.array(rows, dtype=np.uint8)]
    for delta in (False, True):  # delta mode skips the leading zero gap
        d = decode_bmp_pixels(make_bmp_rle8(8, 3, pal, rows, use_delta_gap=delta))
        assert (d["width"], d["height"], d["format"]) == (8, 3, "BMP")
        assert np.array_equal(d["pixels"], exp)


def test_bmp_rle8_honest_failures():
    import pytest

    from ingest_fast_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp_rle8,
    )

    good = make_bmp_rle8(4, 2, [(1, 2, 3)], [[0, 0, 0, 0], [0, 0, 0, 0]])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_pixels(good[:-2])
    # a run overflowing the row width must raise, not wrap
    import struct

    (off,) = struct.unpack("<I", good[10:14])
    bad = bytearray(good)
    bad[off] = 200  # first run now claims 200 pixels of a 4-wide row
    with pytest.raises(ValueError, match="overflow"):
        decode_bmp_pixels(bytes(bad))


def test_bmp_rle8_matches_uncompressed_twin():
    """The same pattern via RLE8 and via the 24-bit uncompressed encoder
    must decode to identical pixels — cross-encoding invariance, same
    device as the pHash cross-codec attestation."""
    import numpy as np

    from ingest_fast_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
        make_bmp_rle8,
    )

    pal = [(9, 8, 7), (250, 1, 128)]
    rows = [[(p + r) % 2 for p in range(7)] for r in range(5)]
    rgb_rows = [[pal[v] for v in row] for row in rows]
    a = decode_bmp_pixels(make_bmp_rle8(7, 5, pal, rows))
    b = decode_bmp_pixels(make_bmp(7, 5, rgb_rows=rgb_rows))
    assert np.array_equal(a["pixels"], b["pixels"])


def test_archive_extract_members_and_gates(spark):
    """ZIP ingest: CRC-verified member rows; corrupt data raises; NULL
    payloads stay visible as NULL rows; non-archives are an honest error."""
    import io
    import zipfile

    import pytest

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("a.txt"), "alpha")
        zf.writestr(
            zipfile.ZipInfo("b.txt"), "bët", compress_type=zipfile.ZIP_DEFLATED
        )
    good = buf.getvalue()
    rows = [(1, good, "application/zip", "{}"), (2, None, "application/zip", "{}")]
    df = spark.createDataFrame(rows, M.PAYLOAD_SCHEMA)
    got = {(r["doc_id"], r["member"]): r for r in M.extract_archive_members(df).collect()}
    assert got[(1, "a.txt")]["text"] == "alpha"
    assert got[(1, "b.txt")]["text"] == "bët"
    assert got[(1, "b.txt")]["n_bytes"] == len("bët".encode())
    assert (2, None) in got and got[(2, None)]["text"] is None
    # corrupt a deflate byte -> zipfile's CRC check must raise
    bad = bytearray(good)
    i = good.index(b"b.txt") + 6  # second byte of the deflate stream
    bad[i] ^= 0xFF
    df_bad = spark.createDataFrame([(3, bytes(bad), "application/zip", "{}")], M.PAYLOAD_SCHEMA)
    with pytest.raises(Exception):
        M.extract_archive_members(df_bad).collect()
    df_not = spark.createDataFrame([(4, b"NOTAZIP", "application/zip", "{}")], M.PAYLOAD_SCHEMA)
    with pytest.raises(Exception, match="archive"):
        M.extract_archive_members(df_not).collect()


def test_archive_extract_tar_and_targz(spark):
    """tar and tar.gz containers yield the same member contract as ZIP:
    magic-byte dispatch, one row per regular file, crc32 computed, text
    decoded; truncated tars are an honest error, not partial output."""
    import io
    import tarfile
    import zlib

    import pytest

    def make_tar(mode):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as tf:
            for name, data in (
                ("x/a.txt", b"alpha"),
                ("b.bin", b"\xff\xfe\x00"),
            ):
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
            d = tarfile.TarInfo("x")
            d.type = tarfile.DIRTYPE
            tf.addfile(d)  # directory entry: contributes no member row
        return buf.getvalue()

    plain, gz = make_tar("w:"), make_tar("w:gz")
    assert plain[257:262] == b"ustar" and gz[:2] == b"\x1f\x8b"
    df = spark.createDataFrame(
        [(1, plain, "application/x-tar", "{}"), (2, gz, "application/gzip", "{}")],
        M.PAYLOAD_SCHEMA,
    )
    got = {(r["doc_id"], r["member"]): r for r in M.extract_archive_members(df).collect()}
    for i in (1, 2):
        assert got[(i, "x/a.txt")]["text"] == "alpha"
        assert got[(i, "b.bin")]["text"] is None  # not UTF-8
        assert got[(i, "b.bin")]["n_bytes"] == 3
        assert got[(i, "b.bin")]["crc32"] == zlib.crc32(b"\xff\xfe\x00")
    assert len(got) == 4  # the zero-size TarInfo is not a regular file row
    # truncation gates: mid-data cut (tarfile's own ReadError), partial
    # trailing header (stdlib silently drops the member — the operator's
    # end-of-archive-marker check catches it), and a truncated gzip stream
    for did, cut in ((3, plain[:700]), (4, plain[:1200]), (5, gz[: len(gz) - 8])):
        df_trunc = spark.createDataFrame(
            [(did, cut, "application/x-tar", "{}")], M.PAYLOAD_SCHEMA
        )
        with pytest.raises(Exception, match="(?i)tar|gzip|eof|end"):
            M.extract_archive_members(df_trunc).collect()


def test_archive_extract_bomb_caps(spark):
    """Zip/tar-bomb guard: a member whose declared decompressed size
    exceeds the cap — or whose ZIP compression ratio is absurd — raises
    BEFORE the executor inflates it."""
    import io
    import tarfile
    import zipfile

    import pytest

    payload = b"\x00" * (4 << 20)  # 4 MiB of zeros deflates ~4000:1
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("bomb.bin"), payload,
                    compress_type=zipfile.ZIP_DEFLATED)
    df_ratio = spark.createDataFrame(
        [(1, zbuf.getvalue(), "application/zip", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception, match="decompression cap"):
        M.extract_archive_members(df_ratio, max_compress_ratio=100).collect()
    # same payload passes with the default ratio bound (honest 4 MiB member)
    ok = M.extract_archive_members(df_ratio).collect()
    assert ok[0]["n_bytes"] == len(payload)
    # absolute size cap, ZIP and tar paths
    with pytest.raises(Exception, match="decompression cap"):
        M.extract_archive_members(df_ratio, max_member_bytes=1 << 20).collect()
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        ti = tarfile.TarInfo("bomb.bin")
        ti.size = len(payload)
        tf.addfile(ti, io.BytesIO(payload))
    df_tar = spark.createDataFrame(
        [(2, tbuf.getvalue(), "application/gzip", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception, match="decompression cap"):
        M.extract_archive_members(df_tar, max_member_bytes=1 << 20).collect()


def test_detect_encoding_unknown_and_plan(spark):
    """Invalid byte sequences classify as 'unknown' (NULL decode), and the
    detector is pure codegen — no Python UDF node in the plan."""
    from ingest_fast_spark.queries.llm import text_detect_encoding

    df = text_detect_encoding(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    from pyspark.sql import functions as F

    # invalid utf-8, no BOM: continuation byte with no lead
    raw = spark.createDataFrame([(1, b"\x80\x81\x82")], "doc_id long, payload binary")
    enc = (
        F.when(F.expr("substring(payload,1,3)") == F.lit(b"\xef\xbb\xbf"), "utf-8-bom")
        .when(F.expr("substring(payload,1,2)") == F.lit(b"\xff\xfe"), "utf-16le")
        .when(F.expr("substring(payload,1,2)") == F.lit(b"\xfe\xff"), "utf-16be")
        .when(F.is_valid_utf8("payload"), "utf-8")
        .otherwise("unknown")
    )
    assert raw.select(enc.alias("e")).collect()[0]["e"] == "unknown"


def _encode_png_general(samples, depth, color, interlace=0, plte=None):
    """Forward PNG encoder for decoder attestation: packs (h, w, ch)
    samples at any legal depth (1/2/4/8/16), applies a rotating filter
    per row (None/Sub/Up/Average/Paeth on packed bytes — the spec's bpp
    rule), optionally in Adam7 pass order."""
    import struct
    import zlib

    import numpy as np

    samples = np.asarray(samples)
    h, w, ch = samples.shape
    bpp = max(1, ch * depth // 8)

    def pack_rows(block):
        rows = []
        for r in range(block.shape[0]):
            row = block[r]
            if depth == 16:
                rows.append(row.astype(">u2").tobytes())
            elif depth == 8:
                rows.append(row.astype(np.uint8).tobytes())
            else:
                per_byte = 8 // depth
                vals = row[:, 0].tolist()
                out = bytearray()
                for i in range(0, len(vals), per_byte):
                    byte = 0
                    for j, v in enumerate(vals[i : i + per_byte]):
                        byte |= (v & ((1 << depth) - 1)) << (8 - depth * (j + 1))
                    out.append(byte)
                rows.append(bytes(out))
        return rows

    def filter_block(block):
        raw = bytearray()
        rows = pack_rows(block)
        prev = bytes(len(rows[0])) if rows else b""
        for r, row in enumerate(rows):
            ft = r % 5
            raw.append(ft)
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    enc = row[x]
                elif ft == 1:
                    enc = row[x] - a
                elif ft == 2:
                    enc = row[x] - b
                elif ft == 3:
                    enc = row[x] - ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc = row[x] - pred
                raw.append(enc & 0xFF)
            prev = row
        return bytes(raw)

    if interlace == 0:
        raw = filter_block(samples)
    else:
        passes = [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
        raw = b""
        for x0, y0, dx, dy in passes:
            block = samples[y0::dy, x0::dx]
            if block.shape[0] and block.shape[1]:
                raw += filter_block(block)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if plte is not None:
        out += chunk(b"PLTE", bytes(v for rgb in plte for v in rgb))
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_16bit_roundtrip():
    """16-bit PNG decode: full-precision uint16 pixels, all filters, gray
    ('I' mode per parse_image_header) and RGB/LA/RGBA."""
    rng = np.random.RandomState(11)
    for color, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        vals = rng.randint(0, 65536, size=(6, 5, ch)).astype(np.uint16)
        out = M.decode_png_pixels(_encode_png_general(vals, 16, color))
        assert out["pixels"].dtype == np.uint16
        assert np.array_equal(out["pixels"], vals), color
        assert out["mode"] == ("I" if color == 0 else M._PNG_MODES[color])
    # 16-bit palette is illegal per the spec grid
    import pytest

    with pytest.raises(ValueError, match="illegal"):
        M.decode_png_pixels(
            _encode_png_general(
                np.zeros((2, 2, 1), np.uint16), 16, 3, plte=[(0, 0, 0)]
            )
        )


def test_png_adam7_roundtrip_matches_sequential():
    """Adam7 decode equals the non-interlaced decode of the same samples,
    across depths (8-bit RGB/RGBA, 16-bit gray, 4-bit palette) and odd
    dimensions that leave some passes empty or partial."""
    rng = np.random.RandomState(12)
    cases = [
        (8, 2, 3, (13, 7), None),
        (8, 6, 4, (9, 10), None),
        (16, 0, 1, (5, 3), None),
        (4, 3, 1, (11, 6), [(i * 16, 255 - i * 16, i) for i in range(16)]),
        (8, 2, 3, (1, 1), None),   # only pass 1 exists
        (8, 0, 1, (2, 2), None),   # several empty passes
    ]
    for depth, color, ch, (w, h), plte in cases:
        hi = 1 << depth if depth < 16 else 65536
        vals = rng.randint(0, min(hi, 16 if depth == 4 else hi), size=(h, w, ch))
        vals = vals.astype(np.uint16 if depth == 16 else np.uint8)
        seq = M.decode_png_pixels(_encode_png_general(vals, depth, color, 0, plte))
        il = M.decode_png_pixels(_encode_png_general(vals, depth, color, 1, plte))
        assert np.array_equal(seq["pixels"], il["pixels"]), (depth, color, w, h)
        assert seq["mode"] == il["mode"]


def test_png_adam7_truncation_raises():
    import pytest
    import struct
    import zlib

    vals = np.arange(13 * 7 * 3).reshape(7, 13, 3).astype(np.uint8)
    png = _encode_png_general(vals, 8, 2, interlace=1)
    # rebuild with HALF the decompressed pixel data: still a valid zlib
    # stream, but the pass walk runs out of rows
    i = png.index(b"IDAT")
    (ln,) = struct.unpack(">I", png[i - 4 : i])
    full = zlib.decompress(png[i + 4 : i + 4 + ln])
    cut = zlib.compress(full[: len(full) // 2])

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    bad = png[: i - 4] + chunk(b"IDAT", cut) + png[i + 8 + ln :]
    with pytest.raises(ValueError, match="truncated|trailing"):
        M.decode_png_pixels(bad)


def test_tiff_roundtrip_matrix_pixel_exact():
    """TIFF 6.0: every (compression × byte-order × predictor × strip
    layout × gray/RGB) combination round-trips pixel-exact through the
    pure-Python encoder/decoder."""
    import numpy as np

    from ingest_fast_spark.operators import multimodal as M

    rng = np.random.RandomState(42)
    for comp in (1, 5, 32773):
        for be in (False, True):
            for pred in (1, 2) if comp in (1, 5) else (1,):
                for shape in ((7, 5), (6, 9, 3), (1, 1)):
                    for rps in (None, 3):
                        vals = rng.randint(0, 256, size=shape).astype(np.uint8)
                        t = M.make_tiff(
                            vals, compression=comp, big_endian=be,
                            rows_per_strip=rps, predictor=pred,
                        )
                        out = M.decode_tiff_pixels(t)
                        assert out["mode"] == ("L" if len(shape) == 2 else "RGB")
                        assert np.array_equal(
                            out["pixels"].reshape(vals.shape), vals
                        ), (comp, be, pred, shape, rps)
                        hdr = M.parse_image_header(t)
                        assert hdr["format"] == "TIFF"
                        assert (hdr["width"], hdr["height"]) == (shape[1], shape[0])


def test_tiff_gates_and_corruption():
    """Unsupported shapes raise NotImplementedError (honest gates);
    structural corruption raises ValueError."""
    import struct

    import numpy as np
    import pytest

    from ingest_fast_spark.operators import multimodal as M

    t = M.make_tiff(np.zeros((4, 4), np.uint8))
    tag = struct.pack("<HHIHH", 259, 3, 1, 1, 0)

    def patched(new):
        return t.replace(tag, struct.pack("<HHIHH", 259, 3, 1, new, 0))

    with pytest.raises(NotImplementedError, match="compression"):
        M.decode_tiff_pixels(patched(7))  # JPEG-in-TIFF
    # bit depth gate: patch BitsPerSample 8 -> 16
    bits = struct.pack("<HHIHH", 258, 3, 1, 8, 0)
    with pytest.raises(NotImplementedError, match="bit depths"):
        M.decode_tiff_pixels(t.replace(bits, struct.pack("<HHIHH", 258, 3, 1, 16, 0)))
    with pytest.raises(ValueError):
        M.decode_tiff_pixels(t[:30])  # truncated strips/IFD
    with pytest.raises(ValueError):
        M.decode_tiff_pixels(b"II*\x00\xff\xff\xff\xff")  # IFD out of range
    # LZW data corruption must raise, not return garbage
    z = M.make_tiff(np.arange(64, dtype=np.uint8).reshape(8, 8), compression=5)
    i = z.index(b"\x80")  # LZW stream starts with the CLEAR code byte
    with pytest.raises(ValueError):
        M.decode_tiff_pixels(z[:i] + b"\xff\xff" + z[i + 2:])


def test_exif_roundtrip_both_orders_and_gates():
    """EXIF writer/parser round-trip in both byte orders; structural
    garbage raises; a JPEG without APP1 raises; unknown value types are
    skipped, not fatal."""
    import pytest

    from ingest_fast_spark.operators.jpeg import make_jpeg
    from ingest_fast_spark.operators.multimodal import (
        exif_tags,
        insert_exif,
        make_exif_app1,
    )

    base = make_jpeg(16, 16, grayscale=True)
    for bo, name in (("<", "II"), (">", "MM")):
        app1 = make_exif_app1(
            "MakerX", "Cam-Y", 8, "2021:12:31 23:59:59", (3, 1000), 1600, 16, 16, bo
        )
        t = exif_tags(insert_exif(base, app1))
        assert t["byte_order"] == name
        assert (t["make"], t["model"], t["orientation"]) == ("MakerX", "Cam-Y", 8)
        assert (t["exposure_num"], t["exposure_den"], t["iso"]) == (3, 1000, 1600)
        assert t["datetime"] == "2021:12:31 23:59:59"

    with pytest.raises(ValueError):
        exif_tags(b"\x00\x01nonsense")
    with pytest.raises(ValueError):
        exif_tags(base)  # valid JPEG, no APP1
    # Truncated TIFF block inside an otherwise well-formed APP1.
    app1 = make_exif_app1("M", "C", 1, "2020:01:01 00:00:00", (1, 2), 100, 16, 16)
    broken = app1[:2] + app1[2:4] + app1[4:20]  # cut the TIFF mid-header
    import struct

    seg = broken[4:]
    framed = b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
    with pytest.raises(ValueError):
        exif_tags(insert_exif(base, framed))


def test_audio_filterbank_concentrates_energy_by_period(spark):
    """8-point DFT physics on square waves: half-period 1 puts ALL energy
    at Nyquist (bin 4), half-period 2 at bin 2, half-period 4 at bin 1 —
    invisible to the {0,2,4} integer-twiddle bank, so all three measured
    bins are zero. DC-offset signal shows up only in bin 0. Unparseable
    payloads yield NULL-energy rows, one per bin."""
    import numpy as np

    from ingest_fast_spark.operators import multimodal as M

    def wav(p, v=1000, n=80, dc=0):
        sign = 1 - 2 * ((np.arange(n) // p) % 2)
        return M.make_wav((sign * v + dc).astype("<i2"), sample_rate=8000)

    rows = [
        (1, wav(1), "audio/wav", "{}"),
        (2, wav(2), "audio/wav", "{}"),
        (4, wav(4), "audio/wav", "{}"),
        (9, b"not a wav", "audio/wav", "{}"),
    ]
    df = spark.createDataFrame(rows, M.PAYLOAD_SCHEMA)
    out = {(r["doc_id"], r["bin"]): r for r in M.audio_filterbank(df).collect()}
    nf, v = 10, 1000
    assert out[(1, 4)]["energy"] == nf * (8 * v) ** 2
    assert out[(1, 0)]["energy"] == 0 and out[(1, 2)]["energy"] == 0
    assert out[(2, 2)]["energy"] == nf * 2 * (4 * v) ** 2
    assert out[(2, 0)]["energy"] == 0 and out[(2, 4)]["energy"] == 0
    assert all(out[(4, k)]["energy"] == 0 for k in (0, 2, 4))
    assert all(out[(9, k)]["energy"] is None for k in (0, 2, 4))
    assert out[(1, 4)]["n_frames"] == nf


def test_motion_energy_exact_sad_and_gates(spark):
    """SAD is the exact integer sum of per-pixel |diffs|; a planted
    mid-clip spike dominates the profile; NULL payloads yield no rows;
    non-Y4M payloads raise (no fake motion data)."""
    import pytest

    from ingest_fast_spark.operators import multimodal as M

    clip = M.make_y4m(4, 2, [10, 12, 12, 112, 112])
    rows = [(1, clip, "video/y4m", "{}"), (2, None, "video/y4m", "{}")]
    df = spark.createDataFrame(rows, M.PAYLOAD_SCHEMA)
    got = {r["frame_idx"]: r for r in M.motion_energy(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["sad"] == 8 * 2 and got[2]["sad"] == 0
    assert got[3]["sad"] == 8 * 100 and got[4]["sad"] == 0
    assert got[3]["mad_micro"] == 100_000_000
    bad = spark.createDataFrame(
        [(9, b"not video", "video/y4m", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception, match="Y4M|ffmpeg"):
        M.motion_energy(bad).collect()
