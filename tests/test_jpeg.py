"""JPEG codec tests (baseline + progressive): round-trip exactness for solid colors
(DC-only blocks, flat quantization), bounded DCT rounding for patterns,
4:2:0 subsampling, restart-marker resync, honest gates, and the Spark
decode/resize paths without PIL."""

import numpy as np
import pytest

from ingest_fast_spark.operators import multimodal as M
from ingest_fast_spark.operators.jpeg import (
    decode_jpeg_pixels,
    make_jpeg,
    make_jpeg_progressive,
)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subsample420": True},
        {"restart_interval": 2},
        {"subsample420": True, "restart_interval": 1},
    ],
)
def test_solid_roundtrip_exact(kw):
    img = np.full((20, 28, 3), (120, 64, 200), dtype=np.uint8)
    out = decode_jpeg_pixels(make_jpeg(28, 20, img, **kw))
    assert (out["width"], out["height"], out["mode"], out["format"]) == (
        28, 20, "RGB", "JPEG",
    )
    assert np.abs(out["pixels"].astype(int) - img.astype(int)).max() <= 1


def test_gradient_and_noise_bounded_error():
    out = decode_jpeg_pixels(make_jpeg(37, 21))  # default gradient, odd dims
    yy, xx = np.mgrid[0:21, 0:37]
    ref = np.stack([(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1)
    assert np.abs(out["pixels"].astype(float) - ref).max() <= 6
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out2 = decode_jpeg_pixels(make_jpeg(32, 32, noise))
    assert np.abs(out2["pixels"].astype(int) - noise.astype(int)).max() <= 4


def test_block_aligned_quadrants_exact_and_resize(spark):
    """16x16 with 8x8 solid quadrants: every DCT block is constant, so the
    decode is exact and a 2x2 nearest-neighbor resize through the real
    decoder yields exactly the four quadrant colors."""
    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :8] = q[0]
    img[:8, 8:] = q[1]
    img[8:, :8] = q[2]
    img[8:, 8:] = q[3]
    j = make_jpeg(16, 16, img)
    out = decode_jpeg_pixels(j)
    assert np.abs(out["pixels"].astype(int) - img.astype(int)).max() <= 1
    df = spark.createDataFrame([(1, j, "image/jpeg", "{}")], M.PAYLOAD_SCHEMA)
    row = M.resize_images(df, width=2, height=2).collect()[0]
    px = np.frombuffer(row["payload"], dtype=np.uint8).reshape(2, 2, 3)
    for (r, c), want in zip([(0, 0), (0, 1), (1, 0), (1, 1)], q):
        assert np.abs(px[r, c].astype(int) - np.array(want)).max() <= 1


def test_honest_gates_and_garbage():
    good = make_jpeg(8, 8)
    for bad in (b"", b"NOTJPEG", b"\xff\xd8" + b"\x00" * 10, good[:30]):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg_pixels(bad)
    # lossless (SOF3) is an honest NotImplementedError, not a guess
    import struct

    sof3 = bytes([0xFF, 0xC3]) + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(b"\xff\xd8" + sof3)


@pytest.mark.parametrize("sub", [False, True])
def test_progressive_solid_roundtrip_exact(sub):
    img = np.full((20, 28, 3), (120, 64, 200), dtype=np.uint8)
    out = decode_jpeg_pixels(make_jpeg_progressive(28, 20, img, subsample420=sub))
    assert (out["width"], out["height"], out["mode"], out["format"]) == (
        28, 20, "RGB", "JPEG",
    )
    assert np.array_equal(out["pixels"], img)


@pytest.mark.parametrize(
    "w,h,sub", [(24, 16, False), (24, 16, True), (13, 11, False), (41, 25, True)]
)
def test_progressive_decode_matches_baseline(w, h, sub):
    """The 9-scan progressive script (spectral bands + DC/AC successive
    approximation + EOB runs with correction bits) reassembles the SAME
    integer coefficients the sequential scan codes, so the progressive
    decode must be bit-identical to the baseline decode of the same
    image — including odd dimensions and 4:2:0 chroma."""
    rng = np.random.default_rng(w * 1000 + h + sub)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg_pixels(make_jpeg(w, h, img, subsample420=sub))
    prog = decode_jpeg_pixels(make_jpeg_progressive(w, h, img, subsample420=sub))
    assert np.array_equal(base["pixels"], prog["pixels"])


def test_progressive_refine_zrl_past_history_coef():
    """T.81 G.1.2.3 / libjpeg jcphuff.c encode_mcu_AC_refine: a
    history-nonzero coefficient (|v|>=2) sitting MORE than 16 zero-history
    positions into a run that precedes a newly-nonzero |v|==1 forces the
    encoder to flush pending ZRLs at the history coefficient, so its
    correction bit lands after the ZRL whose 16-zero skip the decoder
    consumes it in. Regression test for the [ZRL][bits][(r,1)] vs
    [ZRL][(r,1)][sign][bit] mis-interleaving (round-9 ADVICE)."""
    from ingest_fast_spark.operators.jpeg import _ZIGZAG, _dct_basis

    basis = _dct_basis()
    cases = [
        {18: 2, 21: 1},  # one ZRL: 17 zero-history positions before the |2|
        {18: -2, 21: -1, 40: 5},  # history coef beyond EOB folds into EOB run
        {34: 3, 37: 1},  # two ZRLs walked past before the history coef
        {18: 2, 34: -2, 37: 1, 60: 1},  # repeated flushes in one block
    ]
    for zzvals in cases:
        flat = np.zeros(64)
        flat[0] = 40.0  # DC
        for k, v in zzvals.items():
            flat[_ZIGZAG[k]] = float(v)
        # exact inverse DCT: rint(DCT(block)) reproduces the integers, and
        # grayscale keeps both chroma planes at exactly 128
        block = basis.T @ flat.reshape(8, 8) @ basis + 128.0
        img = np.repeat(block[:, :, None], 3, axis=2)
        base = decode_jpeg_pixels(make_jpeg(8, 8, img))
        prog = decode_jpeg_pixels(make_jpeg_progressive(8, 8, img))
        assert np.array_equal(base["pixels"], prog["pixels"]), zzvals


def test_progressive_truncated_raises():
    p = make_jpeg_progressive(24, 16)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(p[: len(p) * 2 // 3])


def test_decode_images_catches_corrupt_jpeg_without_pil(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: its decoder covers this case")
    except ImportError:
        pass
    good = make_jpeg(24, 24)
    truncated = good[: len(good) * 2 // 3]
    df = spark.createDataFrame(
        [(1, truncated, "image/jpeg", "{}")], M.PAYLOAD_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        M.decode_images(df).collect()
    assert "JPEG" in str(ei.value) or "truncated" in str(ei.value)


def test_grayscale_single_component_roundtrip():
    """Round 9: 1-component (luma-only) baseline frames — solid values
    round-trip exactly, gradients within DCT rounding, restart markers
    resync, and the RGB path is unchanged."""
    import numpy as np

    from ingest_fast_spark.operators.jpeg import make_jpeg
    from ingest_fast_spark.operators.multimodal import decode_jpeg_pixels

    for val in (0, 77, 255):
        out = decode_jpeg_pixels(
            make_jpeg(9, 6, np.full((6, 9), val, np.uint8), grayscale=True)
        )
        assert (out["mode"], out["width"], out["height"]) == ("L", 9, 6)
        assert (out["pixels"] == val).all()
    g = (np.arange(16 * 24).reshape(16, 24) * 3 % 256).astype(np.uint8)
    for rst in (0, 2):
        out = decode_jpeg_pixels(
            make_jpeg(24, 16, g, grayscale=True, restart_interval=rst)
        )
        assert np.abs(out["pixels"][:, :, 0].astype(int) - g.astype(int)).max() <= 4
    assert decode_jpeg_pixels(make_jpeg(8, 8))["mode"] == "RGB"
