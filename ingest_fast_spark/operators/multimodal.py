"""Multimodal column conventions (SURVEY.md §2.9).

Convention: a modality is an opaque ``binary`` payload column plus a typed
metadata struct — parquet stores both natively, so 100 TB of image/audio
bytes ride along the relational columns, and Catalyst prunes the (wide)
payload column away for any query that doesn't touch it.

The decode/feature-extract step is a ``mapInPandas`` operator: Arrow
batches in, Arrow batches out, schema declared up front. IMAGE decode is
executable with no media libraries: ``parse_image_header`` reads
dimensions/mode/format from the public PNG/JPEG/GIF/BMP container
headers, ``decode_png_pixels`` is a REAL pixel decoder for PNG at every legal
depth/color combination incl. 16-bit and Adam7 interlacing (stdlib zlib
+ numpy unfiltering of all five RFC-2083 scanline filters),
``decode_gif_pixels`` is a REAL pixel decoder for GIF (pure-Python
variable-width LZW + palette + interlace reorder),
``jpeg.decode_jpeg_pixels`` is a REAL pixel decoder for baseline JPEG
(Huffman entropy decode + numpy IDCT + chroma upsample),
``decode_bmp_pixels`` is a REAL pixel decoder for uncompressed BMP
(24-bit BGR + 8-bit paletted, both row orders), and PIL (optional)
covers the remainder (progressive JPEG, WebP, ...).
AUDIO is real for PCM WAV (``parse_wav_header`` + ``chunk_audio`` +
``audio_features`` — RMS/peak/ZCR/silence DSP in numpy) and VIDEO is real
for Y4M (``parse_y4m_header`` + ``sample_frames``); the remaining
compressed codecs (MP3/MP4) would need ffmpeg, absent in this container —
those paths fall back to documented byte-level behavior or an honest
raise, never a silent fake.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("media_meta", StringType()),  # JSON: {"codec":..., ...}
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("payload_sha256", StringType()),
        StructField("media_type", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize the multimodal convention from the documents table:
    payload = utf-8 bytes (stand-in for image/audio bytes), plus typed
    metadata. Real pipelines read payloads from object-store binary files
    (``spark.read.format('binaryFile')``)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.to_json(
            F.struct(F.lit("utf-8").alias("codec"), F.length(text_col).alias("chars"))
        ).alias("media_meta"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a full PIXEL decoder (PIL/libvips). Raises so nobody
    mistakes the stub for a working decoder. Header-level metadata does NOT
    need this — see ``parse_image_header``."""
    raise NotImplementedError(
        "full pixel decoding requires image/audio libraries not present in "
        "this container; parse_image_header() reads dimensions/format from "
        "the container headers, extract_features() computes byte features"
    )


def parse_image_header(payload: bytes) -> dict | None:
    """Pure-Python image metadata from container headers — PNG, JPEG, GIF,
    BMP (all public formats: PNG RFC 2083 IHDR, JFIF SOFn segments, GIF
    logical screen descriptor, BMP BITMAPINFOHEADER). No image library
    needed, so ``decode_images`` has a REAL no-deps path for the metadata
    a curation pipeline filters on (dimensions, color mode, format).
    Returns {width, height, mode, format} or None if the payload is not a
    recognized/complete image header. Mode strings follow PIL naming so
    the two decode paths agree."""
    import struct

    if payload is None:
        return None
    b = bytes(payload)
    # PNG: 8-byte signature, then the IHDR chunk (must be first per spec)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        depth, color = b[24], b[25]
        mode = {
            0: "1" if depth == 1 else ("I" if depth == 16 else "L"),
            2: "RGB",
            3: "P",
            4: "LA",
            6: "RGBA",
        }.get(color)
        return {"width": w, "height": h, "mode": mode, "format": "PNG"}
    # GIF: logical screen descriptor immediately after the version tag
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"width": w, "height": h, "mode": "P", "format": "GIF"}
    # BMP: the 4-byte DIB header size at offset 14 selects the layout —
    # legacy BITMAPCOREHEADER (size 12) stores unsigned 16-bit dims at
    # offset 18; BITMAPINFOHEADER and successors (size >= 40) store
    # signed 32-bit dims there (height may be negative = top-down rows).
    if b[:2] == b"BM" and len(b) >= 22:
        dib = struct.unpack("<I", b[14:18])[0]
        if dib == 12:
            w, h = struct.unpack("<HH", b[18:22])
            return {"width": w, "height": h, "mode": "RGB", "format": "BMP"}
        if dib >= 40 and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return {"width": w, "height": abs(h), "mode": "RGB", "format": "BMP"}
        return None
    # TIFF: either byte order; dims live in the first IFD
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            _, tags = _tiff_tags(b)
        except ValueError:
            return None
        if 256 not in tags or 257 not in tags:
            return None
        spp = tags.get(277, [1])[0]
        return {
            "width": tags[256][0],
            "height": tags[257][0],
            "mode": "L" if spp == 1 else "RGB",
            "format": "TIFF",
        }
    # JPEG: walk marker segments to the first SOFn frame header
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone markers (no length field)
                continue
            if i + 4 > len(b):
                break
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 10 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    ncomp = b[i + 9]
                    mode = {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp)
                    return {"width": w, "height": h, "mode": mode, "format": "JPEG"}
                break
            i += 2 + seglen
    return None


def decode_image(payload: bytes) -> dict:
    """Image decode: PIL when importable (full pixel decode), else the
    pure-Python header parser (metadata only — which is all the DataFrame
    operator emits anyway). Raises ValueError on unrecognized payloads —
    an honest failure, never a silent fake. Returns
    {width, height, mode, format}."""
    try:
        from PIL import Image
    except ImportError:
        meta = parse_image_header(payload)
        if meta is None:
            raise ValueError(
                "unrecognized or truncated image payload (PNG/JPEG/GIF/BMP "
                "headers supported without PIL)"
            )
        dec = _PIXEL_DECODERS.get(meta["format"])
        if dec is not None:
            # Real pixel validation (same path as decode_images).
            try:
                meta = {k: v for k, v in dec(payload).items() if k != "pixels"}
            except NotImplementedError:
                pass
        return meta
    import io

    with Image.open(io.BytesIO(payload)) as im:
        im.load()
        return {
            "width": im.width,
            "height": im.height,
            "mode": im.mode,
            "format": im.format,
        }


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
        StructField("format", StringType()),
    ]
)


def decode_images(df: DataFrame) -> DataFrame:
    """Image-decode operator: mapInPandas over binary payloads →
    (doc_id, width, height, mode, format). Executors use PIL when it is
    installed (full pixel decode, catches corrupt image DATA); without it
    the pure-Python ``parse_image_header`` supplies the same metadata for
    PNG/JPEG/GIF/BMP — a real executable path, not a gate. Unrecognized
    payloads raise (honest failure); NULL payloads yield NULL features
    (missing media is data, not an error)."""

    def decode(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        try:
            from PIL import Image
        except ImportError:
            Image = None

        for pdf in batches:
            ws, hs, modes, fmts = [], [], [], []
            for b in pdf["payload"]:
                if b is None:
                    ws.append(None), hs.append(None)
                    modes.append(None), fmts.append(None)
                    continue
                if Image is not None:
                    with Image.open(io.BytesIO(bytes(b))) as im:
                        im.load()
                        ws.append(im.width), hs.append(im.height)
                        modes.append(im.mode), fmts.append(im.format)
                else:
                    meta = parse_image_header(bytes(b))
                    if meta is None:
                        raise ValueError(
                            "unrecognized or truncated image payload "
                            "(PNG/JPEG/GIF/BMP headers supported without PIL)"
                        )
                    dec = _PIXEL_DECODERS.get(meta["format"])
                    if dec is not None:
                        # Real pixel decode (stdlib zlib/LZW + numpy):
                        # corrupt compressed data is caught even without PIL.
                        try:
                            meta = {
                                k: v
                                for k, v in dec(bytes(b)).items()
                                if k != "pixels"
                            }
                        except NotImplementedError:
                            pass  # unsupported media variant: header metadata only
                    ws.append(meta["width"]), hs.append(meta["height"])
                    modes.append(meta["mode"]), fmts.append(meta["format"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "mode": modes,
                    "format": fmts,
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


def ahash_pixels(px) -> int:
    """Average hash (aHash) of a decoded pixel array — the classic
    perceptual image fingerprint: grayscale, nearest-sample to 8×8,
    threshold each cell on the grid mean, pack the 64 bits MSB-first into
    a SIGNED 64-bit int (Spark LongType). Deterministic for lossless
    pixel sources (PNG/GIF/BMP and flat-quant JPEG), robust to resizing
    and brightness-preserving re-encodes — the standard first pass of
    image dedup before pairwise verification."""
    import numpy as np

    a = np.asarray(px)
    g = a.astype(np.float64).mean(axis=2) if a.ndim == 3 else a.astype(np.float64)
    h, w = g.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(8) * w) // 8
    small = g[rows][:, cols]
    bits = (small >= small.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


AHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("ahash", LongType())]
)


def ahash_images(df: DataFrame) -> DataFrame:
    """Perceptual-hash operator: mapInPandas over binary payloads →
    (doc_id, ahash). Pixels come from the pure-Python decoders (PIL-free);
    formats without a registered pixel decoder raise honestly — a
    perceptual hash of undecoded bytes would be a silent fake. NULL
    payloads yield NULL hashes (missing media is data, not an error).

    Scale shape: map-only; downstream dedup groups on the 64-bit hash
    (exact duplicates) or on 16-bit hash bands (near-duplicates within a
    hamming radius) — both one bounded-key shuffle at any corpus size."""

    def hash_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                if b is None:
                    out.append(None)
                    continue
                raw = bytes(b)
                meta = parse_image_header(raw)
                dec = _PIXEL_DECODERS.get(meta["format"]) if meta else None
                if dec is None:
                    raise ValueError(
                        "no pixel decoder for payload (PNG/JPEG/GIF/BMP "
                        "supported without PIL)"
                    )
                out.append(ahash_pixels(dec(raw)["pixels"]))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash": pd.array(out, dtype="Int64")}
            )

    return df.mapInPandas(hash_batch, AHASH_SCHEMA)


# Column-group band masks for 64-bit aHash hamming LSH: band g selects the
# bits of grid columns {2g, 2g+1} across all 8 rows (bit of cell (r,c) sits
# at 63-(r*8+c), MSB-first packing). Banding by COLUMNS, not by bit slices,
# because localized image edits (a shifted edge, a changed object) move
# entire columns of the 8×8 grid — a one-column change then dirties exactly
# one band and the other three still collide.
AHASH_BAND_MASKS = [
    (m - (1 << 64)) if m >= (1 << 63) else m  # Spark longs are SIGNED 64-bit
    for m in (
        sum(1 << (63 - (r * 8 + c)) for r in range(8) for c in (2 * g, 2 * g + 1))
        for g in range(4)
    )
]


def ahash_near_dups(hashed: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image pairs from aHash fingerprints: candidates must
    share at least one of the four column-band keys (hash & mask), then
    every candidate is verified with the exact popcount of the XOR —
    classic LSH shape, zero recall loss within a ≤2-dirty-column edit
    radius and never an unverified pair. Input: (doc_id, ahash) from
    ``ahash_images``; output: (doc_a, doc_b, hamming), doc_a < doc_b.

    Scale shape: 4 equi-joins on 64-bit band keys (union via explode —
    ONE shuffle on the band key), exact verification touches candidates
    only; band-key skew equals true visual-duplicate mass."""
    bands = F.array(
        *[
            F.struct(
                F.lit(g).alias("band"),
                F.col("ahash").bitwiseAND(F.lit(AHASH_BAND_MASKS[g])).alias("key"),
            )
            for g in range(4)
        ]
    )
    banded = (
        hashed.filter(F.col("ahash").isNotNull())
        .select("doc_id", "ahash", F.explode(bands).alias("b"))
        .select("doc_id", "ahash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("ahash").alias("ha"), "band", "key"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("ahash").alias("hb"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho')."""
    import numpy as np

    i = np.arange(n)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i[None, :] + 1) * i[:, None] / (2 * n))
    d[0] *= 1.0 / np.sqrt(2.0)
    return d


def phash_pixels(px) -> int:
    """DCT perceptual hash (pHash) of a decoded pixel array: grayscale →
    nearest-sample to 32×32 → orthonormal 2D DCT-II (two numpy matmuls
    against the 32×32 basis) → keep the top-left 8×8 low-frequency block
    → threshold each AC coefficient on the MEDIAN of the 63 ACs (DC is
    excluded from both the median and the hash; its bit is 0) → pack
    MSB-first into a signed 64-bit int.

    Complements aHash: aHash thresholds spatial brightness (robust to
    re-encode, sensitive to global gradients), pHash thresholds the
    frequency spectrum — invariant to brightness/contrast scaling and far
    more robust to smoothing/sharpening, the fingerprint real crawl-image
    dedup stacks key on. Deterministic: IEEE matmul on identical pixel
    input is bit-stable, and lossless decoders (PNG/GIF/BMP, flat-quant
    JPEG) give identical pixels across formats."""
    import numpy as np

    a = np.asarray(px)
    g = a.astype(np.float64).mean(axis=2) if a.ndim == 3 else a.astype(np.float64)
    h, w = g.shape
    rows = (np.arange(32) * h) // 32
    cols = (np.arange(32) * w) // 32
    small = g[rows][:, cols]
    d = _dct_matrix(32)
    spec = d @ small @ d.T
    block = spec[:8, :8].copy()
    ac = np.concatenate([block.ravel()[1:]])
    med = np.median(ac)
    bits = (block.ravel() > med)
    bits[0] = False  # DC carries only global brightness — excluded
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def phash_images(df: DataFrame) -> DataFrame:
    """DCT perceptual-hash operator: mapInPandas over binary payloads →
    (doc_id, phash). Same contract as ``ahash_images``: pure-Python pixel
    decoders, honest raise on undecodable formats, NULL payload → NULL
    hash. Map-only; downstream groups on the hash or its bands."""

    def hash_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                if b is None:
                    out.append(None)
                    continue
                raw = bytes(b)
                meta = parse_image_header(raw)
                dec = _PIXEL_DECODERS.get(meta["format"]) if meta else None
                if dec is None:
                    raise ValueError(
                        "no pixel decoder for payload (PNG/JPEG/GIF/BMP "
                        "supported without PIL)"
                    )
                out.append(phash_pixels(dec(raw)["pixels"]))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": pd.array(out, dtype="Int64")}
            )

    return df.mapInPandas(hash_batch, PHASH_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Computes deterministic byte-level features (length + sha256) — the
    shape a real decoder would follow: per-batch numpy/pandas work, output
    schema declared in FEATURE_SCHEMA, no driver involvement."""

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # NULL payloads (missing media) pass through as NULL
                    # features, not a worker crash.
                    "byte_len": pd.array(
                        [len(b) if b is not None else None for b in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "media_type": pdf["media_type"],
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("media_type", StringType()),
    ]
)


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image-resize operator: mapInPandas, batch in / batch out, declared
    output schema — the production shape for PIL/libvips work.

    REAL for 8-bit PNG, GIF, baseline JPEG, and uncompressed BMP
    payloads: the pure-Python ``decode_*_pixels`` decoders supply the
    true pixel array and the resample is nearest-neighbor via numpy
    index grids (the standard thumbnail pass before a vision encoder);
    output payload is the raw resized pixel buffer
    (width·height·channels bytes, row-major). Other payloads
    (formats needing PIL/ffmpeg, absent here) keep the
    DOCUMENTED deterministic fallback
    (sha256-seeded bytes of width·height length) so the plumbing — Arrow
    batching, binary columns both ways, schema — stays exercised for
    every media type."""

    def resize(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        n = width * height
        for pdf in batches:
            payloads = []
            for b in pdf["payload"]:
                raw = bytes(b)
                real = None
                dec = None
                if raw[:8] == b"\x89PNG\r\n\x1a\n":
                    dec = decode_png_pixels
                elif raw[:6] in (b"GIF87a", b"GIF89a"):
                    dec = decode_gif_pixels
                elif raw[:2] == b"\xff\xd8":
                    from .jpeg import decode_jpeg_pixels as dec
                elif raw[:2] == b"BM":
                    dec = decode_bmp_pixels
                if dec is not None:
                    try:
                        img = dec(raw)
                        px = img["pixels"]
                        if px.dtype != np.uint8:  # 16-bit PNG: high byte
                            px = (px >> 8).astype(np.uint8)
                        ys = np.minimum(
                            (np.arange(height) * img["height"]) // height,
                            img["height"] - 1,
                        )
                        xs = np.minimum(
                            (np.arange(width) * img["width"]) // width,
                            img["width"] - 1,
                        )
                        real = px[ys][:, xs].tobytes()
                    except (NotImplementedError, ValueError):
                        real = None  # fall through to the byte fallback
                if real is not None:
                    payloads.append(real)
                else:
                    payloads.append(
                        (hashlib.sha256(raw).digest() * (n // 32 + 1))[:n]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "media_type": pdf["media_type"],
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)


def parse_y4m_header(payload: bytes) -> dict | None:
    """Pure-Python YUV4MPEG2 metadata (the public uncompressed video
    container): parses the plain-text parameter line into {width, height,
    fps_num, fps_den, chroma, frame_bytes, header_end, n_frames}.
    frame_bytes is the raw plane size per frame (C420 family → w·h·3/2,
    C422 → 2·w·h, C444 → 3·w·h, Cmono → w·h), so frames are directly
    addressable without any video library. Returns None if the payload is
    not Y4M or uses an unknown chroma mode."""
    if payload is None:
        return None
    b = bytes(payload)
    if not b.startswith(b"YUV4MPEG2 "):
        return None
    nl = b.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fn, fd = 25, 1
    chroma = b"420"
    for p in b[10:nl].split(b" "):
        try:
            if p.startswith(b"W"):
                w = int(p[1:])
            elif p.startswith(b"H"):
                h = int(p[1:])
            elif p.startswith(b"F") and b":" in p:
                fn, fd = (int(x) for x in p[1:].split(b":"))
            elif p.startswith(b"C"):
                chroma = p[1:]
        except ValueError:
            return None
    if not w or not h:
        return None
    if chroma.startswith(b"420"):
        frame_bytes = w * h * 3 // 2
    elif chroma.startswith(b"422"):
        frame_bytes = w * h * 2
    elif chroma.startswith(b"444"):
        frame_bytes = w * h * 3
    elif chroma.startswith(b"mono"):
        frame_bytes = w * h
    else:
        return None
    # count frames (each is a "FRAME[params]\n" line + raw planes)
    i, n = nl + 1, 0
    while i < len(b) and b[i : i + 5] == b"FRAME":
        fnl = b.find(b"\n", i)
        if fnl < 0 or fnl + 1 + frame_bytes > len(b):
            break
        n += 1
        i = fnl + 1 + frame_bytes
    return {
        "width": w,
        "height": h,
        "fps_num": fn,
        "fps_den": fd,
        "chroma": chroma.decode("ascii", "replace"),
        "frame_bytes": frame_bytes,
        "header_end": nl + 1,
        "n_frames": n,
    }


def _y4m_frames(b: bytes, meta: dict, wanted: list[int]) -> list[bytes]:
    """Raw plane bytes of the requested frame indices (sorted unique)."""
    out, want = [], set(wanted)
    i, idx = meta["header_end"], 0
    while i < len(b) and b[i : i + 5] == b"FRAME" and idx <= max(want):
        fnl = b.find(b"\n", i)
        lo = fnl + 1
        if idx in want:
            out.append(b[lo : lo + meta["frame_bytes"]])
        idx += 1
        i = lo + meta["frame_bytes"]
    return out


def make_y4m(
    width: int, height: int, frame_y: list[int], fps: tuple[int, int] = (25, 1)
) -> bytes:
    """A complete, valid YUV4MPEG2 mono clip built with the stdlib — one
    solid-luma frame per entry of ``frame_y``. Decodable by ANY conformant
    Y4M reader; used to synthesize deterministic clips with PLANTED scene
    structure for round-trip attestation."""
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    ).encode("ascii")
    body = b"".join(
        b"FRAME\n" + bytes([y & 0xFF]) * (width * height) for y in frame_y
    )
    return head + body


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("cut_frame", LongType()),
        StructField("delta", DoubleType()),
    ]
)


def detect_scene_cuts(df: DataFrame, threshold: float = 30.0) -> DataFrame:
    """Shot-boundary detection — the standard first pass of video curation
    (sample one keyframe per shot, dedup near-identical clips): consecutive
    luma planes are compared by mean absolute pixel difference and a frame
    whose delta exceeds ``threshold`` starts a new scene. One input row →
    one output row per cut (doc_id, cut_frame, delta).

    REAL for Y4M payloads: ``parse_y4m_header`` gives exact plane
    geometry, the Y plane is the first w·h bytes of every frame for all
    supported chroma modes, and the delta is computed in numpy over raw
    bytes. Non-Y4M payloads raise honestly (compressed video needs
    ffmpeg, absent here) — a fake cut list would poison downstream
    sampling. NULL payloads produce no rows (missing media is data).

    Scale shape: map-only — each clip's frames are scanned once inside
    its executor; payload bytes never shuffle and the output is one row
    per detected cut."""

    def cuts(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, frames_, deltas = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                meta = parse_y4m_header(raw)
                if meta is None:
                    raise ValueError(
                        "scene-cut detection needs a Y4M payload "
                        "(compressed video requires ffmpeg, absent here)"
                    )
                w, h = meta["width"], meta["height"]
                prev = None
                i, idx = meta["header_end"], 0
                while i < len(raw) and raw[i : i + 5] == b"FRAME":
                    fnl = raw.find(b"\n", i)
                    lo = fnl + 1
                    y = np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=lo)
                    if prev is not None:
                        d = float(
                            np.abs(
                                y.astype(np.int16) - prev.astype(np.int16)
                            ).mean()
                        )
                        if d > threshold:
                            ids.append(doc_id)
                            frames_.append(idx)
                            deltas.append(round(d, 6))
                    prev = y
                    idx += 1
                    i = lo + meta["frame_bytes"]
            yield pd.DataFrame(
                {"doc_id": ids, "cut_frame": frames_, "delta": deltas}
            )

    return df.mapInPandas(cuts, SCENE_CUT_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling operator: one input row → up to ``n_frames``
    output rows (the row-exploding UDTF shape, via mapInPandas).

    REAL for Y4M payloads: ``parse_y4m_header`` (pure Python, public
    YUV4MPEG2 format) gives the exact per-frame plane size, so the
    operator extracts ACTUAL evenly-spaced raw frames — frame k of n
    samples source frame k·T/n. Compressed containers (mp4/webm) would
    need ffmpeg — not in this container — so non-Y4M payloads keep the
    documented deterministic byte-slice fake. The Spark contract —
    cardinality change, per-frame rows, binary column out — is identical
    either way."""

    def explode_frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                meta = parse_y4m_header(raw)
                if meta is not None and meta["n_frames"] > 0:
                    total = meta["n_frames"]
                    k = min(n_frames, total)
                    wanted = sorted({j * total // k for j in range(k)})
                    got = _y4m_frames(raw, meta, wanted)
                    for i, fr in enumerate(got):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(fr)
                    continue
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * step : i * step + step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(explode_frames, FRAME_SCHEMA)


def parse_wav_header(payload: bytes) -> dict | None:
    """Pure-Python RIFF/WAVE metadata (public container format): walks the
    chunk list to the ``fmt `` and ``data`` chunks and returns
    {channels, sample_rate, bits_per_sample, byte_rate, data_offset,
    data_len, duration_ms} — everything audio chunking needs, no audio
    library required. Returns None if the payload is not a complete WAV."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        sz = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            fmt = {
                "channels": int.from_bytes(b[i + 10 : i + 12], "little"),
                "sample_rate": int.from_bytes(b[i + 12 : i + 16], "little"),
                "byte_rate": int.from_bytes(b[i + 16 : i + 20], "little"),
                "bits_per_sample": int.from_bytes(b[i + 22 : i + 24], "little"),
            }
        elif cid == b"data":
            data = (i + 8, min(sz, len(b) - i - 8))
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or fmt["byte_rate"] == 0:
        return None
    off, n = data
    return {
        **fmt,
        "data_offset": off,
        "data_len": n,
        "duration_ms": int(n * 1000 / fmt["byte_rate"]),
    }


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("chunk", BinaryType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
    ]
)


def chunk_audio(
    df: DataFrame, chunk_ms: int = 10_000, bytes_per_ms: int = 32
) -> DataFrame:
    """Audio chunking: one recording row → fixed-duration chunk rows with
    time metadata — the segmentation pass before transcription/embedding.

    REAL for PCM WAV payloads: ``parse_wav_header`` (pure Python, public
    RIFF format) supplies the true byte rate and data-section bounds, so
    chunk time bounds are actual milliseconds of audio. Non-WAV payloads
    fall back to the documented raw-PCM-at-``bytes_per_ms`` assumption
    (compressed codecs would need ffmpeg — not in this container). The
    Spark contract — cardinality explosion, typed time bounds, binary
    out, Arrow batching — is identical either way."""

    def explode_chunks(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, chunks, starts, ends = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                wav = parse_wav_header(raw)
                if wav is not None:
                    bpm = max(wav["byte_rate"] // 1000, 1)
                    lo = wav["data_offset"]
                    body = raw[lo : lo + wav["data_len"]]
                else:
                    bpm = bytes_per_ms
                    body = raw
                chunk_bytes = chunk_ms * bpm
                n_chunks = max((len(body) + chunk_bytes - 1) // chunk_bytes, 1)
                for i in range(n_chunks):
                    piece = body[i * chunk_bytes : (i + 1) * chunk_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    chunks.append(piece)
                    starts.append(i * chunk_ms)
                    ends.append(i * chunk_ms + len(piece) // bpm)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_idx": idxs,
                    "chunk": chunks,
                    "start_ms": starts,
                    "end_ms": ends,
                }
            )

    return df.mapInPandas(explode_chunks, CHUNK_SCHEMA)


def make_wav(samples, sample_rate: int = 8000) -> bytes:
    """A complete, valid 16-bit mono PCM WAV built with the stdlib
    (RIFF + fmt + data) from an int16 sample sequence. Decodable by ANY
    conformant reader; used to synthesize deterministic clips with
    analytically known signal statistics for round-trip attestation."""
    import struct

    import numpy as np

    body = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
        StructField("silence_ratio", DoubleType()),
    ]
)


def audio_features(df: DataFrame, silence_db: float = -40.0) -> DataFrame:
    """REAL audio feature extraction from 16-bit PCM WAV payloads — the
    signal statistics an audio-curation pipeline gates on before paying
    for transcription: RMS level and peak (normalized to [0, 1] full
    scale), zero-crossing rate (crossings per sample — a crude
    voiced/noise discriminator), and the fraction of samples below the
    ``silence_db`` dBFS threshold (dead-air detector). Pure
    numpy-over-int16 DSP on the ``parse_wav_header``-located data
    section; no audio library. Non-WAV or non-16-bit payloads yield a
    NULL-featured row (honest: the byte stream is not interpretable as
    samples without a codec).

    Scale shape: mapInPandas over the binary payload column — map-only,
    Arrow-batched, one output row per recording; at 100 TB the scan
    parallelism is the file layout's and nothing shuffles."""
    import math

    silence_amp = 10.0 ** (silence_db / 20.0)

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = parse_wav_header(bytes(payload)) if payload is not None else None
                if wav is None or wav["bits_per_sample"] != 16:
                    rows.append((doc_id, None, None, None, None, None, None, None))
                    continue
                lo, n = wav["data_offset"], wav["data_len"]
                body = bytes(payload)[lo : lo + (n & ~1)]
                x = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
                if x.size == 0:
                    rows.append((doc_id, wav["duration_ms"], wav["sample_rate"],
                                 0, None, None, None, None))
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                peak = float(np.abs(x).max())
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
                silence = float(np.mean(np.abs(x) < silence_amp))
                rows.append(
                    (doc_id, wav["duration_ms"], wav["sample_rate"], int(x.size),
                     round(rms, 6), round(peak, 6), round(zcr, 6), round(silence, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "duration_ms", "sample_rate", "n_samples",
                    "rms", "peak", "zero_crossing_rate", "silence_ratio",
                ],
            )

    return df.mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
# Adam7 interlace grid (RFC 2083 §8.2): (x0, y0, dx, dy) per pass
_ADAM7_PASSES = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decode with ZERO image libraries: zlib (stdlib)
    inflates the IDAT stream and the five RFC-2083 scanline filters
    (None/Sub/Up/Average/Paeth) are reversed in numpy — returning an
    (h, w, channels) array plus metadata. Supports the full legal
    (depth, color) grid: 8-bit L/RGB/LA/RGBA, PALETTE (color type 3,
    PLTE-mapped to RGB exactly like the GIF decoder — web crawls are
    full of paletted PNGs), the SUB-BYTE depths (1/2/4-bit grayscale and
    palette — old-web favicons, line-art scans; bit-packed rows are
    unfiltered at the byte level per the spec's bpp=1 rule, then
    unpacked with shifts and grayscale rescaled to 8-bit with the
    255/(2^d-1) expansion), 16-BIT depth (gray/RGB/LA/RGBA — scientific
    and scanner output; pixels come back as uint16 preserving full
    precision, mode "I" for 16-bit gray per ``parse_image_header``'s
    convention), and ADAM7 interlacing at every supported depth (seven
    independently-filtered sub-images scattered back on the interlace
    grid). Palette transparency (tRNS) decodes to (h, w, 4) RGBA
    pixels — entries beyond the tRNS table default to opaque per the
    spec — while the reported mode stays "P" (PIL's convention, and what
    ``parse_image_header`` reads from IHDR alone). Illegal
    depth/color combinations, non-PNG payloads, and corrupt streams
    raise ValueError.

    This upgrades the no-PIL path of ``decode_images``/``resize_images``
    from header-metadata-only to actual pixel validation + access for
    PNG payloads — corrupt IDAT data is now CAUGHT without PIL."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    i, w = 8, None
    idat = []
    plte = None
    trns = None
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color}")
            if (
                depth != 8
                and not (depth in (1, 2, 4) and color in (0, 3))
                and not (depth == 16 and color in (0, 2, 4, 6))
            ):
                # the spec's legal (depth, color) grid: sub-byte only for
                # grayscale/palette, 16-bit never for palette
                raise ValueError(f"illegal PNG bit depth {depth} color {color}")
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG interlace method {interlace}")
        elif typ == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError(f"PNG PLTE length {length} not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        i += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None
    ch = _PNG_CHANNELS[color]
    # Filters operate on BYTES: stride is the packed row size and the
    # "previous pixel" offset (bpp) is 1 byte for sub-byte depths,
    # ch*2 bytes at 16-bit.
    bpp = max(1, ch * depth // 8)

    def unfilter(seg: bytes, rows: int, stride: int):
        out = np.zeros((rows, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for row in range(rows):
            ft = seg[row * (stride + 1)]
            line = np.frombuffer(
                seg, dtype=np.uint8, count=stride, offset=row * (stride + 1) + 1
            ).copy()
            if ft == 0:  # None
                cur = line
            elif ft == 2:  # Up
                cur = line + prev  # uint8 wraps mod 256, per spec
            elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
                cur = line
                for x in range(stride):
                    a = int(cur[x - bpp]) if x >= bpp else 0
                    bb = int(prev[x])
                    if ft == 1:
                        cur[x] = (int(cur[x]) + a) & 0xFF
                    elif ft == 3:
                        cur[x] = (int(cur[x]) + ((a + bb) >> 1)) & 0xFF
                    else:
                        c = int(prev[x - bpp]) if x >= bpp else 0
                        p = a + bb - c
                        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                        cur[x] = (int(cur[x]) + pred) & 0xFF
            else:
                raise ValueError(f"invalid PNG filter type {ft}")
            out[row] = cur
            prev = out[row]
        return out

    def to_samples(arr, rows: int, cols: int):
        """(rows, stride) unfiltered bytes -> (rows, cols, ch) samples
        (palette indices, gray levels, or 16-bit big-endian values)."""
        if depth == 16:
            return (
                np.ascontiguousarray(arr)
                .view(">u2")
                .astype(np.uint16)
                .reshape(rows, cols, ch)
            )
        if depth == 8:
            return arr.reshape(rows, cols, ch)
        # unpack bit-packed samples MSB-first, trim row padding to cols
        per_byte = 8 // depth
        mask = (1 << depth) - 1
        shifts = np.array(
            [8 - depth * (i + 1) for i in range(per_byte)], dtype=np.uint8
        )
        s = ((arr[:, :, None] >> shifts[None, None, :]) & mask).reshape(rows, -1)[
            :, :cols
        ]
        return s[:, :, None]

    if interlace == 0:
        stride = (w * ch * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"PNG pixel payload is {len(raw)} bytes, expected {h * (stride + 1)}"
            )
        samples = to_samples(unfilter(raw, h, stride), h, w)
    else:
        # Adam7 (RFC 2083 §8.2): seven reduced sub-images, each filtered
        # independently, scattered back on the (x0, y0, dx, dy) grid
        samples = np.zeros(
            (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * ch * depth + 7) // 8
            need = ph * (pstride + 1)
            if off + need > len(raw):
                raise ValueError("PNG interlaced pixel data truncated")
            samples[y0::dy, x0::dx] = to_samples(
                unfilter(raw[off : off + need], ph, pstride), ph, pw
            )
            off += need
        if off != len(raw):
            raise ValueError("PNG interlaced pixel data has trailing bytes")
    px = samples
    if color == 3:  # palette indices -> RGB(A), exactly like the GIF decoder
        if plte is None:
            raise ValueError("paletted PNG missing PLTE chunk")
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        idx = px.reshape(h, w)
        if trns is not None:
            if len(trns) > len(plte):
                raise ValueError("PNG tRNS longer than the palette")
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            px = np.concatenate(
                [plte[idx], alpha[idx][:, :, None]], axis=2
            )
        else:
            px = plte[idx]
    elif depth in (1, 2, 4):  # sub-byte grayscale: expand to 8-bit levels
        px = (
            samples[..., 0].astype(np.uint16) * 255 // ((1 << depth) - 1)
        ).astype(np.uint8)[:, :, None]
    mode = _PNG_MODES[color]
    if color == 0 and depth == 1:
        mode = "1"  # PIL naming convention, matches parse_image_header
    elif color == 0 and depth == 16:
        mode = "I"  # matches parse_image_header's IHDR-only read
    return {
        "width": int(w),
        "height": int(h),
        "mode": mode,
        "format": "PNG",
        "pixels": px,
    }


def make_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A complete, valid 8-bit RGB PNG built with the stdlib (signature +
    IHDR + zlib IDAT + IEND per RFC 2083) — solid ``rgb`` fill. Used to
    synthesize deterministic image payloads for round-trip attestation
    (and decodable by ANY conformant decoder, PIL included)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_png_general(samples, depth, color, interlace=0, plte=None) -> bytes:
    """General PNG synthesizer for round-trip attestation: packs
    (h, w, ch) samples at any legal depth (1/2/4/8/16 — 16-bit values
    big-endian per spec), applies a rotating per-row filter
    (None/Sub/Up/Average/Paeth over packed bytes, the spec's bpp rule),
    optionally in Adam7 pass order (``interlace=1``). Decodable by ANY
    conformant decoder; the forward twin of ``decode_png_pixels``'s
    16-bit + interlaced paths."""
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
                packed = bytearray()
                for i in range(0, len(vals), per_byte):
                    byte = 0
                    for j, v in enumerate(vals[i : i + per_byte]):
                        byte |= (v & ((1 << depth) - 1)) << (8 - depth * (j + 1))
                    packed.append(byte)
                rows.append(bytes(packed))
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
                b_ = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    enc = row[x]
                elif ft == 1:
                    enc = row[x] - a
                elif ft == 2:
                    enc = row[x] - b_
                elif ft == 3:
                    enc = row[x] - ((a + b_) >> 1)
                else:
                    p = a + b_ - c
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                    enc = row[x] - pred
                raw.append(enc & 0xFF)
            prev = row
        return bytes(raw)

    if interlace == 0:
        raw = filter_block(samples)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7_PASSES:
            block = samples[y0::dy, x0::dx]
            if block.shape[0] and block.shape[1]:
                raw += filter_block(block)

    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(v for rgb in plte for v in rgb))
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def _pack_png_rows(width, height, values, depth, filter_type):
    """Pack per-pixel sample values into filtered PNG scanlines: MSB-first
    bit packing at sub-byte depths, then the byte-level filter (PNG
    filters ALWAYS operate on packed bytes — bpp=1 for depth<=8 single
    channel), matching exactly what the decoder reverses."""
    if len(values) != width * height:
        raise ValueError("values length must be width*height")
    if filter_type not in (0, 1, 2):
        raise ValueError("filter_type must be 0, 1 or 2 for the synthesizer")
    per_byte = 8 // depth
    raw = bytearray()
    prev = None
    for r in range(height):
        row = values[r * width : (r + 1) * width]
        if depth == 8:
            packed = bytes(row)
        else:
            packed = bytearray()
            for i in range(0, width, per_byte):
                byte = 0
                for j, v in enumerate(row[i : i + per_byte]):
                    if v >= (1 << depth):
                        raise ValueError(f"sample {v} exceeds {depth}-bit depth")
                    byte |= v << (8 - depth * (j + 1))
                packed.append(byte)
            packed = bytes(packed)
        raw.append(filter_type)
        if filter_type == 0:
            raw += packed
        elif filter_type == 1:  # Sub at the byte level (bpp = 1)
            raw += bytes(
                (packed[x] - (packed[x - 1] if x else 0)) & 0xFF
                for x in range(len(packed))
            )
        else:  # Up
            p = prev if prev is not None else bytes(len(packed))
            raw += bytes((packed[x] - p[x]) & 0xFF for x in range(len(packed)))
        prev = packed
    return bytes(raw)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def make_png_palette(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: list[int],
    filter_type: int = 0,
    depth: int = 8,
) -> bytes:
    """A complete, valid PALETTED PNG (color type 3) at 1/2/4/8-bit depth:
    signature + IHDR + PLTE + zlib IDAT + IEND per RFC 2083. ``indices``
    is row-major w*h palette indices. ``filter_type`` pre-filters every
    scanline (0 = None, 1 = Sub, 2 = Up) so the attestation twin drives
    the unfilter path over index data too, not just truecolor rows;
    sub-byte depths exercise the bit-packed row path."""
    import struct
    import zlib

    if depth not in (1, 2, 4, 8):
        raise ValueError("depth must be 1, 2, 4 or 8")
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    raw = _pack_png_rows(width, height, indices, depth, filter_type)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_png_gray(
    width: int,
    height: int,
    values: list[int],
    depth: int = 8,
    filter_type: int = 0,
) -> bytes:
    """A complete, valid GRAYSCALE PNG (color type 0) at 1/2/4/8-bit
    depth — the 1-bit case is the classic line-art/fax shape. ``values``
    are raw samples in [0, 2^depth)."""
    import struct
    import zlib

    if depth not in (1, 2, 4, 8):
        raise ValueError("depth must be 1, 2, 4 or 8")
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 0, 0, 0, 0)
    raw = _pack_png_rows(width, height, values, depth, filter_type)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_gif_pixels(payload: bytes):
    """REAL GIF pixel decode with ZERO image libraries: a pure-Python
    LSB-first bit reader runs the variable-width LZW decompression
    (GIF89a spec appendix F), palette indices map through the global or
    local color table, and four-pass interlacing is reordered in numpy —
    returning an (h, w, 3) uint8 RGB array plus metadata for the FIRST
    image block. Extensions are skipped; a GIF with no color table or an
    index outside the palette raises ValueError (honest failure, never a
    guessed pixel); the animation tail beyond frame 1 is ignored by
    design (frame sampling is the video operators' job).

    Companion of ``decode_png_pixels``: together they make the no-PIL
    pixel path real for both dominant lossless web formats."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    if len(b) < 13:
        raise ValueError("truncated GIF screen descriptor")
    packed = b[10]
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        global_table = np.frombuffer(b[pos : pos + n], dtype=np.uint8).reshape(-1, 3)
        pos += n

    def skip_subblocks(p: int) -> int:
        while p < len(b):
            ln = b[p]
            p += 1
            if ln == 0:
                return p
            p += ln
        raise ValueError("truncated GIF sub-blocks")

    while pos < len(b):
        tag = b[pos]
        if tag == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif tag == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise ValueError("truncated GIF image descriptor")
            _, _, w, h, ipacked = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            table = global_table
            if ipacked & 0x80:  # local color table wins
                n = 3 * (2 << (ipacked & 0x07))
                table = np.frombuffer(b[pos : pos + n], dtype=np.uint8).reshape(-1, 3)
                pos += n
            if table is None:
                raise ValueError("GIF image with no color table")
            min_size = b[pos]
            pos += 1
            if not 2 <= min_size <= 11:
                raise ValueError(f"invalid GIF LZW minimum code size {min_size}")
            data = bytearray()
            while pos < len(b):
                ln = b[pos]
                pos += 1
                if ln == 0:
                    break
                data += b[pos : pos + ln]
                pos += ln
            # --- LZW decode (variable width 3..12 bits, LSB-first) ---
            clear, eoi = 1 << min_size, (1 << min_size) + 1
            base = [bytes([i]) for i in range(clear)] + [b"", b""]
            tab = list(base)
            code_size = min_size + 1
            acc = nbits = dpos = 0
            prev = None
            out = bytearray()
            while True:
                while nbits < code_size:
                    if dpos >= len(data):
                        acc = -1
                        break
                    acc |= data[dpos] << nbits
                    dpos += 1
                    nbits += 8
                if acc == -1:
                    break  # stream ended without EOI: keep decoded prefix
                code = acc & ((1 << code_size) - 1)
                acc >>= code_size
                nbits -= code_size
                if code == clear:
                    tab = list(base)
                    code_size = min_size + 1
                    prev = None
                    continue
                if code == eoi:
                    break
                if prev is None:
                    if code >= len(tab):
                        raise ValueError("GIF LZW: first code not a literal")
                    out += tab[code]
                    prev = code
                    continue
                if code < len(tab):
                    entry = tab[code]
                elif code == len(tab):
                    entry = tab[prev] + tab[prev][:1]
                else:
                    raise ValueError("GIF LZW: code beyond table")
                out += entry
                # Conformant decoders freeze the table at 4096 entries
                # (12-bit max code); growing past that on a malformed
                # stream that never sends CLEAR would both inflate memory
                # and accept codes a real encoder can never emit.
                if len(tab) < 4096:
                    tab.append(tab[prev] + entry[:1])
                    if len(tab) == (1 << code_size) and code_size < 12:
                        code_size += 1
                prev = code
            if len(out) < w * h:
                raise ValueError(
                    f"GIF pixel payload is {len(out)} indices, expected {w * h}"
                )
            idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8).reshape(h, w)
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF palette index out of range")
            if ipacked & 0x40:  # interlaced: 4-pass row order -> natural
                order = np.concatenate(
                    [np.arange(s, h, step) for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
                )
                natural = np.empty_like(idx)
                natural[order] = idx
                idx = natural
            return {
                "width": int(w),
                "height": int(h),
                "mode": "P",
                "format": "GIF",
                "pixels": table[idx],
            }
        elif tag == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block tag 0x{tag:02x}")
    raise ValueError("GIF contains no image block")


def make_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: list[int] | None = None,
    interlaced: bool = False,
) -> bytes:
    """A complete, valid GIF89a built with the stdlib — global color
    table, one image block, LZW stream in the conformant 'clear before
    every literal' form (zero compression, decodable by ANY conformant
    decoder, PIL included). ``indices`` is row-major in NATURAL order;
    with ``interlaced`` the rows are written in four-pass order and the
    interlace flag set. Used to synthesize deterministic payloads for
    round-trip attestation."""
    import struct

    if indices is None:
        indices = [0] * (width * height)
    if len(indices) != width * height:
        raise ValueError("indices must be width*height long")
    bits = max(2, (max(1, len(palette)) - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << bits) - len(palette))
    rows = [indices[r * width : (r + 1) * width] for r in range(height)]
    if interlaced:
        order = [r for s, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, height, step)]
        rows = [rows[r] for r in order]
    clear, eoi = 1 << bits, (1 << bits) + 1
    code_size = bits + 1
    acc = nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for row in rows:
        for i in row:
            emit(clear)
            emit(i)
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    blocks = b"".join(
        bytes([len(stream[i : i + 255])]) + bytes(stream[i : i + 255])
        for i in range(0, len(stream), 255)
    ) + b"\x00"
    lsd = struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    gct = b"".join(bytes(c) for c in table)
    idesc = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlaced else 0
    )
    return (
        b"GIF89a" + lsd + gct + idesc + bytes([bits]) + blocks + b"\x3b"
    )


def decode_bmp_pixels(payload: bytes):
    """REAL BMP pixel decode with ZERO image libraries: uncompressed
    (BI_RGB) device-independent bitmaps are unpacked with struct + numpy
    into an (h, w, 3) uint8 RGB array plus metadata. Covers the layouts
    seen in the wild: BITMAPINFOHEADER-or-later 24-bit BGR and 8-bit
    paletted (BGRX color table), bottom-up (positive height) and top-down
    (negative height) row order, 4-byte row padding; plus the legacy
    BITMAPCOREHEADER 24-bit form; and BI_RLE8-compressed 8-bit paletted
    data (all four stream constructs, _bmp_rle8_indices). RLE4 and other
    bit depths raise NotImplementedError (honest gate); truncated pixel
    arrays, malformed RLE streams, and palette-index overflows raise
    ValueError — never a guessed pixel."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:2] != b"BM" or len(b) < 26:
        raise ValueError("not a BMP signature")
    (data_off,) = struct.unpack("<I", b[10:14])
    (dib,) = struct.unpack("<I", b[14:18])
    if dib == 12:  # BITMAPCOREHEADER: u16 dims, no compression field
        w, h, _planes, bpp = struct.unpack("<HHHH", b[18:26])
        top_down, compression, palette_off, palette_entry = False, 0, 26, 3
    elif dib >= 40:
        if len(b) < 34:
            raise ValueError("truncated BMP info header")
        w, h, _planes, bpp, compression = struct.unpack("<iiHHI", b[18:34])
        top_down, h = h < 0, abs(h)
        palette_off, palette_entry = 14 + dib, 4
    else:
        raise ValueError(f"unknown BMP DIB header size {dib}")
    if compression not in (0, 1):
        raise NotImplementedError(f"BMP compression {compression} (only BI_RGB/BI_RLE8)")
    if bpp not in (8, 24):
        raise NotImplementedError(f"BMP bit depth {bpp} (only 8/24)")
    if compression == 1 and (bpp != 8 or top_down):
        # The spec defines RLE8 only for bottom-up 8-bit bitmaps.
        raise ValueError("BI_RLE8 requires bottom-up 8-bit data")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    if compression == 1:
        rows = _bmp_rle8_indices(b, data_off, w, h)[::-1]  # storage is bottom-up
        stride = w  # palette path below slices [:, :w]
    else:
        stride = (w * (bpp // 8) + 3) & ~3  # rows pad to 4-byte boundaries
        need = data_off + stride * h
        if len(b) < need:
            raise ValueError(
                f"BMP pixel array is {len(b) - data_off} bytes, expected {stride * h}"
            )
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = rows.reshape(h, stride)
        if not top_down:
            rows = rows[::-1]  # bottom-up storage -> natural row order
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        if dib == 12:
            n_pal = (data_off - palette_off) // 3
        else:
            n_pal = (data_off - palette_off) // 4
        if n_pal <= 0:
            raise ValueError("8-bit BMP has no color table")
        pal_raw = np.frombuffer(
            b, dtype=np.uint8, count=n_pal * palette_entry, offset=palette_off
        ).reshape(n_pal, palette_entry)
        palette = pal_raw[:, :3][:, ::-1]  # BGR(X) -> RGB
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP palette index outside color table")
        px = palette[idx]
    return {
        "width": int(w),
        "height": int(h),
        "mode": "RGB",
        "format": "BMP",
        "pixels": np.ascontiguousarray(px),
    }


def _bmp_rle8_indices(b: bytes, off: int, w: int, h: int):
    """Decompress a BI_RLE8 pixel stream into an (h, w) uint8 index array
    in STORAGE order (row 0 = bottom row). All four stream constructs are
    supported: encoded runs (count, value), absolute literals (0, n>=3,
    bytes, word-aligned), end-of-line (0,0), delta (0,2,dx,dy), and
    end-of-bitmap (0,1). Skipped cells (after EOL shortfalls or deltas)
    stay index 0, the conventional fill. Overruns past the row width or
    image height and truncated streams raise ValueError — never a guessed
    pixel."""
    import numpy as np

    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = off
    n_bytes = len(b)
    while True:
        if i + 2 > n_bytes:
            raise ValueError("truncated BMP RLE8 stream (no end-of-bitmap)")
        c, v = b[i], b[i + 1]
        i += 2
        if c > 0:  # encoded run
            if y >= h or x + c > w:
                raise ValueError("BMP RLE8 run overflows the bitmap")
            idx[y, x : x + c] = v
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("BMP RLE8 ran past the last row")
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if i + 2 > n_bytes:
                raise ValueError("truncated BMP RLE8 delta")
            x, y = x + b[i], y + b[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE8 delta outside the bitmap")
        else:  # absolute mode: v literal bytes, word-aligned
            end = i + v
            if end > n_bytes:
                raise ValueError("truncated BMP RLE8 absolute block")
            if y >= h or x + v > w:
                raise ValueError("BMP RLE8 absolute block overflows the bitmap")
            idx[y, x : x + v] = np.frombuffer(b, dtype=np.uint8, count=v, offset=i)
            x += v
            i = end + (v & 1)
    return idx


def make_bmp_rle8(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    idx_rows: list[list[int]],
    use_delta_gap: bool = False,
) -> bytes:
    """A complete, valid BI_RLE8 paletted BMP built with the stdlib —
    ``idx_rows`` in natural (top-to-bottom) order, encoded bottom-up as
    the spec requires. The encoder exercises every stream construct a
    conformant decoder must handle: runs for repeats >= 2, absolute mode
    for literal stretches >= 3, single (1, v) pairs otherwise, and —
    with ``use_delta_gap`` — a (0,2,dx,0) delta that skips index-0 cells
    at a row start instead of encoding them."""
    import struct

    out = bytearray()
    for row in idx_rows[::-1]:  # bottom-up storage
        x = 0
        w = len(row)
        if use_delta_gap and w > 2 and row[0] == 0 and row[1] == 0:
            gap = 0
            while gap < min(w, 255) and row[gap] == 0:
                gap += 1
            out += bytes((0, 2, gap, 0))
            x = gap
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 2:
                out += bytes((run, row[x]))
                x += run
                continue
            lit = x
            while (
                lit < w
                and lit - x < 255
                and not (lit + 1 < w and row[lit + 1] == row[lit])
            ):
                lit += 1
            n = lit - x
            if n >= 3:
                out += bytes((0, n)) + bytes(row[x:lit])
                if n & 1:
                    out += b"\x00"
                x = lit
            else:
                out += bytes((1, row[x]))
                x += 1
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    pal = b"".join(bytes((bl, g, r, 0)) for (r, g, bl) in palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 1, len(out), 2835, 2835,
        len(palette), 0,
    )
    data_off = 14 + 40 + len(pal)
    head = struct.pack("<2sIHHI", b"BM", data_off + len(out), 0, 0, data_off)
    return head + info + pal + bytes(out)


def make_bmp(
    width: int,
    height: int,
    rgb_rows: list[list[tuple[int, int, int]]] | None = None,
    rgb: tuple[int, int, int] = (0, 0, 0),
    top_down: bool = False,
) -> bytes:
    """A complete, valid 24-bit BI_RGB BMP built with the stdlib
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR rows padded to 4 bytes,
    bottom-up unless ``top_down``) — solid ``rgb`` fill or explicit
    ``rgb_rows`` in natural row order. Decodable by ANY conformant
    decoder; used to synthesize deterministic round-trip payloads."""
    import struct

    if rgb_rows is None:
        rgb_rows = [[rgb] * width for _ in range(height)]
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    ordered = rgb_rows if top_down else rgb_rows[::-1]
    pixel = b"".join(
        b"".join(bytes((bl, g, r)) for (r, g, bl) in row) + pad for row in ordered
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, 24, 0, len(pixel), 2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel), 0, 0, 14 + 40)
    return head + info + pixel


# --- TIFF (TIFF 6.0, Adobe 1992) ---------------------------------------------
# Baseline container support for the dominant scanned-document format:
# both byte orders, gray (Photometric 1) and RGB, strips (single or
# multiple), Compression 1 (none) / 32773 (PackBits) / 5 (LZW — the SAME
# MSB-first EarlyChange variant ISO 32000 adopted, so the codec is shared
# with operators/pdf.py), and Predictor 2 (horizontal differencing).
# Honest gates: tiles, palettes, planar config 2, bit depths != 8,
# WhiteIsZero, other compressions.

from .pdf import _lzw_decode, _lzw_encode, _png_unpredict  # noqa: E402


def _packbits_decode(raw: bytes) -> bytes:
    """TIFF PackBits (TIFF 6.0 §9): like PDF RunLengthDecode but 128 is a
    no-op, not EOD — the strip byte count bounds the data instead."""
    out = bytearray()
    i = 0
    while i < len(raw):
        n = raw[i]
        if n < 128:
            chunk = raw[i + 1 : i + 2 + n]
            if len(chunk) != n + 1:
                raise ValueError("PackBits: truncated literal run")
            out += chunk
            i += 2 + n
        elif n == 128:
            i += 1
        else:
            if i + 1 >= len(raw):
                raise ValueError("PackBits: truncated repeat run")
            out += raw[i + 1 : i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run]) + data[i : i + 1]
            i += run
        else:
            j = i
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            if j == i:
                j = i + 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _tiff_predict2(rows, w: int, spp: int):
    """Apply horizontal differencing (writer side)."""
    import numpy as np

    flat = rows.reshape(-1, w * spp).astype(np.int16)
    diff = flat.copy()
    diff[:, spp:] -= flat[:, :-spp]
    return (diff & 0xFF).astype(np.uint8).tobytes()


def make_tiff(
    vals,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Conformant baseline TIFF writer for round-trip attestation: gray
    (h,w) or RGB (h,w,3) uint8, II or MM byte order, strip layout,
    Compression 1/5/32773, optional Predictor 2 (LZW/none)."""
    import struct

    import numpy as np

    vals = np.asarray(vals, dtype=np.uint8)
    h, w = vals.shape[:2]
    spp = 1 if vals.ndim == 2 else vals.shape[2]
    E = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = []
    for r0 in range(0, h, rps):
        rows = vals[r0 : r0 + rps]
        raw = _tiff_predict2(rows, w, spp) if predictor == 2 else rows.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise ValueError(f"make_tiff: compression {compression}")

    out = bytearray(struct.pack(E + "2sHI", b"II" if E == "<" else b"MM", 42, 0))
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"  # IFD must start on a word boundary

    extra = bytearray()  # out-of-line value arrays, placed after the IFD
    ents = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [1 if spp == 1 else 2]),
        (273, 4, strip_offsets),
        (277, 3, [spp]),
        (278, 4, [rps]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor == 2:
        ents.append((317, 3, [predictor]))
    ents.sort()
    ifd_off = len(out)
    n_ent = len(ents)
    ifd = bytearray(struct.pack(E + "H", n_ent))
    extra_start = ifd_off + 2 + 12 * n_ent + 4
    for tag, typ, values in ents:
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(values)
        ifd += struct.pack(E + "HHI", tag, typ, len(values))
        if size <= 4:
            packed = struct.pack(E + fmt * len(values), *values)
            ifd += packed + b"\x00" * (4 - size)
        else:
            ifd += struct.pack(E + "I", extra_start + len(extra))
            extra += struct.pack(E + fmt * len(values), *values)
    ifd += struct.pack(E + "I", 0)  # no next IFD
    out += ifd + extra
    # patch the header's first-IFD offset
    out[4:8] = struct.pack(E + "I", ifd_off)
    return bytes(out)


def _tiff_tags(b: bytes):
    """(byte-order, {tag: [values]}) from the FIRST IFD; raises ValueError
    on a broken container."""
    import struct

    if b[:4] == b"II*\x00":
        E = "<"
    elif b[:4] == b"MM\x00*":
        E = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    ifd_off = struct.unpack(E + "I", b[4:8])[0]
    if ifd_off + 2 > len(b):
        raise ValueError("TIFF IFD offset out of range")
    n = struct.unpack(E + "H", b[ifd_off : ifd_off + 2])[0]
    tags = {}
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    for k in range(n):
        ent = b[ifd_off + 2 + 12 * k : ifd_off + 14 + 12 * k]
        if len(ent) < 12:
            raise ValueError("truncated TIFF IFD")
        tag, typ, cnt = struct.unpack(E + "HHI", ent[:8])
        if typ not in sizes:
            continue  # RATIONAL etc. — nothing the baseline reader needs
        total = sizes[typ] * cnt
        if total <= 4:
            data = ent[8 : 8 + total]
        else:
            off = struct.unpack(E + "I", ent[8:12])[0]
            data = b[off : off + total]
            if len(data) < total:
                raise ValueError("TIFF tag value out of range")
        tags[tag] = list(struct.unpack(E + fmts[typ] * cnt, data))
    return E, tags


def decode_tiff_pixels(payload: bytes):
    """{width, height, mode, pixels, format:'TIFF'} — see the section
    banner for the supported baseline and the honest gates."""
    import numpy as np

    b = bytes(payload)
    _, tags = _tiff_tags(b)
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    bits = tags.get(258, [8])
    if any(x != 8 for x in bits):
        raise NotImplementedError(f"TIFF bit depths {bits} (only 8)")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    photo = tags.get(262, [1])[0]
    if photo not in (1, 2):
        raise NotImplementedError(f"TIFF photometric {photo}")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if 256 not in tags or 257 not in tags or 273 not in tags or 279 not in tags:
        raise ValueError("TIFF missing required tags")
    w, h = tags[256][0], tags[257][0]
    spp = tags.get(277, [1])[0]
    rps = tags.get(278, [h])[0] or h
    offsets, counts = tags[273], tags[279]
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts mismatch")
    data = bytearray()
    for idx, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = b[off : off + cnt]
        if len(raw) != cnt:
            raise ValueError("TIFF strip out of range")
        if comp == 1:
            dec = raw
        elif comp == 5:
            dec = _lzw_decode(raw)
        else:
            dec = _packbits_decode(raw)
        nrows = min(rps, h - idx * rps)
        if len(dec) != nrows * w * spp:
            raise ValueError("TIFF strip length mismatch")
        if predictor == 2:
            dec = _png_unpredict(dec, w * spp, 2, spp)
        data += dec
    arr = np.frombuffer(bytes(data), np.uint8)
    pixels = arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, spp)
    return {
        "width": w,
        "height": h,
        "mode": "L" if spp == 1 else "RGB",
        "format": "TIFF",
        "pixels": pixels,
    }


# Formats with a REAL no-PIL pixel decoder (module bottom: both functions
# must exist; callers look up at call time).
from .jpeg import decode_jpeg_pixels, make_jpeg  # noqa: E402  (module bottom)

_PIXEL_DECODERS = {
    "PNG": decode_png_pixels,
    "GIF": decode_gif_pixels,
    "JPEG": decode_jpeg_pixels,
    "BMP": decode_bmp_pixels,
    "TIFF": decode_tiff_pixels,
}


DOC_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_pages", LongType()),
        StructField("text", StringType()),
        StructField("version", StringType()),
    ]
)


def extract_document_text(df: DataFrame) -> DataFrame:
    """Document-text extraction operator: mapInPandas over binary
    payloads → (doc_id, n_pages, text, version). Dispatches on magic
    bytes — PDF today (``operators/pdf.extract_pdf_text``, the
    zero-dependency ISO 32000 parser); the schema leaves room for other
    paginated document formats. Unrecognized payloads raise (honest
    failure); NULL payloads yield NULL features (missing media is data,
    not an error). Map-only: no shuffle, Arrow-batched."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        from .pdf import extract_pdf_text

        for pdf_ in batches:
            ids, pages, texts, vers = [], [], [], []
            for i, b in zip(pdf_["doc_id"], pdf_["payload"]):
                ids.append(i)
                if b is None:
                    pages.append(None), texts.append(None), vers.append(None)
                    continue
                raw = bytes(b)
                if not raw.startswith(b"%PDF-"):
                    raise ValueError("unrecognized document payload (PDF supported)")
                r = extract_pdf_text(raw)
                pages.append(r["n_pages"])
                texts.append(r["text"])
                vers.append(r["version"])
            yield pd.DataFrame(
                {"doc_id": ids, "n_pages": pages, "text": texts, "version": vers}
            )

    return df.mapInPandas(extract, DOC_TEXT_SCHEMA)


ARCHIVE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("member", StringType()),
        StructField("n_bytes", LongType()),
        StructField("crc32", LongType()),
        StructField("text", StringType()),
    ]
)


def extract_archive_members(
    df: DataFrame,
    decode_text: bool = True,
    max_member_bytes: int = 256 * 1024 * 1024,
    max_compress_ratio: int = 2000,
) -> DataFrame:
    """Archive-ingest operator: mapInPandas over binary archive payloads →
    one row per archive member (doc_id, member, n_bytes, crc32, text).
    Training corpora routinely ship as archives of files; this is the
    unpack step as a DataFrame transform. Container dispatch is by magic
    bytes: ``PK`` → stdlib ``zipfile`` (stored + deflate, CRC verified by
    the read), ``\\x1f\\x8b`` → ``tarfile`` mode ``r:gz``, a ``ustar``
    magic at offset 257 → plain tar (crc32 computed over the member since
    tar carries none). Member text decodes as UTF-8 when ``decode_text``
    (binary members set it NULL). Unrecognized payloads raise (honest
    failure); NULL payloads yield a NULL-member row so missing media stays
    visible as data.

    Zip-bomb guard: every member's declared decompressed size is checked
    against ``max_member_bytes`` BEFORE reading, and ZIP members also
    against a ``max_compress_ratio`` bound (declared/compressed), so a
    hostile few-KB payload in an untrusted corpus cannot expand to
    gigabytes inside an executor; oversized members raise ValueError.
    Map-only: no shuffle, Arrow-batched; the per-task memory rides one
    archive member at a time, never the batch."""

    def extract(batches: Iterator) -> Iterator:
        import io
        import tarfile
        import zipfile
        import zlib as _zlib

        import pandas as pd

        def emit(out, i, name, data):
            out["doc_id"].append(i)
            out["member"].append(name)
            out["n_bytes"].append(len(data))
            out["crc32"].append(_zlib.crc32(data))
            if decode_text:
                try:
                    out["text"].append(data.decode("utf-8"))
                except UnicodeDecodeError:
                    out["text"].append(None)
            else:
                out["text"].append(None)

        for pdf_ in batches:
            out = {k: [] for k in ("doc_id", "member", "n_bytes", "crc32", "text")}
            for i, b in zip(pdf_["doc_id"], pdf_["payload"]):
                if b is None:
                    out["doc_id"].append(i)
                    for k in ("member", "n_bytes", "crc32", "text"):
                        out[k].append(None)
                    continue
                raw = bytes(b)
                if raw[:2] == b"PK":
                    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
                        for info in zf.infolist():
                            if info.file_size > max_member_bytes or (
                                info.compress_size > 0
                                and info.file_size
                                > max_compress_ratio * info.compress_size
                                and info.file_size > (1 << 20)
                            ):
                                raise ValueError(
                                    "archive member exceeds decompression cap "
                                    f"({info.filename}: {info.file_size} bytes "
                                    "declared; possible zip bomb)"
                                )
                            # CRC-checked by zipfile
                            emit(out, i, info.filename, zf.read(info.filename))
                elif raw[:2] == b"\x1f\x8b" or raw[257:262] == b"ustar":
                    mode = "r:gz" if raw[:2] == b"\x1f\x8b" else "r:"
                    try:
                        tf = tarfile.open(fileobj=io.BytesIO(raw), mode=mode)
                    except tarfile.TarError as e:
                        raise ValueError(f"malformed tar payload: {e}") from e
                    with tf:
                        try:
                            members = tf.getmembers()
                        except tarfile.TarError as e:
                            raise ValueError(f"malformed tar payload: {e}") from e
                        # stdlib tarfile silently treats a partial trailing
                        # header as EOF; honest gate: demand the two zero
                        # end-of-archive blocks, and (gz) drain the stream
                        # so the gzip CRC/ISIZE trailer is validated too
                        try:
                            tf.fileobj.seek(tf.offset)
                            trailer = tf.fileobj.read(1024)
                            if mode == "r:gz":
                                tf.fileobj.read()
                        except (OSError, EOFError) as e:
                            raise ValueError(
                                f"truncated tar.gz payload: {e}"
                            ) from e
                        if len(trailer) < 1024 or any(trailer):
                            raise ValueError(
                                "malformed tar payload: missing "
                                "end-of-archive marker (truncated?)"
                            )
                        for ti in members:
                            if not ti.isfile():
                                continue
                            if ti.size > max_member_bytes:
                                raise ValueError(
                                    "archive member exceeds decompression cap "
                                    f"({ti.name}: {ti.size} bytes declared; "
                                    "possible tar bomb)"
                                )
                            fh = tf.extractfile(ti)
                            emit(out, i, ti.name, fh.read() if fh else b"")
                else:
                    raise ValueError(
                        "unrecognized archive payload (ZIP, tar, tar.gz supported)"
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, ARCHIVE_SCHEMA)


# --- EXIF (JEITA CP-3451 — TIFF 6.0 IFDs inside a JPEG APP1 segment) ---------
#
# EXIF is the metadata side of every camera JPEG in a crawl: capture time,
# orientation (without which thumbnails render sideways), exposure, ISO,
# pixel dimensions. Structurally it is a complete TIFF file (header + IFD
# chain) embedded in an APP1 marker segment tagged "Exif\0\0" — so the
# parser below is a generalized IFD walker (types BYTE/ASCII/SHORT/LONG/
# RATIONAL, both byte orders) that follows the 0x8769 Exif sub-IFD
# pointer, plus a JPEG segment walk to find APP1. Zero dependencies.

_EXIF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _exif_ifd_entries(b: bytes, off: int, E: str) -> dict:
    """{tag: typed-value} for ONE IFD at ``off``. ASCII → str (NUL
    stripped), RATIONAL → (num, den) tuples, numeric → list of ints.
    Raises ValueError on truncation."""
    import struct

    if off + 2 > len(b):
        raise ValueError("EXIF IFD offset out of range")
    n = struct.unpack(E + "H", b[off : off + 2])[0]
    out = {}
    for k in range(n):
        ent = b[off + 2 + 12 * k : off + 14 + 12 * k]
        if len(ent) < 12:
            raise ValueError("truncated EXIF IFD entry")
        tag, typ, cnt = struct.unpack(E + "HHI", ent[:8])
        if typ not in _EXIF_TYPE_SIZE:
            continue  # UNDEFINED / SRATIONAL etc. — skip, don't fail
        total = _EXIF_TYPE_SIZE[typ] * cnt
        if total <= 4:
            raw = ent[8 : 8 + total]
        else:
            voff = struct.unpack(E + "I", ent[8:12])[0]
            raw = b[voff : voff + total]
            if len(raw) < total:
                raise ValueError("EXIF tag value out of range")
        if typ == 2:
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 5:
            out[tag] = [
                struct.unpack(E + "II", raw[8 * i : 8 * i + 8]) for i in range(cnt)
            ]
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            out[tag] = list(struct.unpack(E + fmt * cnt, raw))
    return out


def exif_tags(payload: bytes) -> dict:
    """Named EXIF fields from a JPEG payload: walk the marker segments to
    the first APP1 tagged ``Exif\\0\\0``, parse the embedded TIFF header
    (either byte order), read IFD0 and the 0x8769 Exif sub-IFD. Returns
    {byte_order, make, model, orientation, datetime, exposure_num,
    exposure_den, iso, pixel_x, pixel_y} with None for absent tags.
    Raises ValueError when there is no well-formed EXIF block."""
    import struct

    b = payload
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, tiff = 2, None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[pos + 1]
        if marker == 0xDA:  # SOS — entropy data; no APP1 past here
            break
        seglen = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tiff = seg[6:]
            break
        pos += 2 + seglen
    if tiff is None:
        raise ValueError("no EXIF APP1 segment")
    if tiff[:4] == b"II*\x00":
        E = "<"
    elif tiff[:4] == b"MM\x00*":
        E = ">"
    else:
        raise ValueError("EXIF APP1 is not a TIFF block")
    ifd0_off = struct.unpack(E + "I", tiff[4:8])[0]
    ifd0 = _exif_ifd_entries(tiff, ifd0_off, E)
    sub = {}
    if 0x8769 in ifd0:
        sub = _exif_ifd_entries(tiff, ifd0[0x8769][0], E)

    def first(d, tag):
        v = d.get(tag)
        return v[0] if isinstance(v, list) and v else v

    exposure = first(sub, 0x829A)
    return {
        "byte_order": "II" if E == "<" else "MM",
        "make": ifd0.get(0x010F),
        "model": ifd0.get(0x0110),
        "orientation": first(ifd0, 0x0112),
        "datetime": ifd0.get(0x0132),
        "exposure_num": exposure[0] if exposure else None,
        "exposure_den": exposure[1] if exposure else None,
        "iso": first(sub, 0x8827),
        "pixel_x": first(sub, 0xA002),
        "pixel_y": first(sub, 0xA003),
    }


def make_exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime: str,
    exposure: tuple[int, int],
    iso: int,
    pixel_x: int,
    pixel_y: int,
    byte_order: str = "<",
) -> bytes:
    """A complete APP1 marker segment (FFE1 + length + ``Exif\\0\\0`` +
    TIFF block) carrying IFD0 {Make, Model, Orientation, DateTime,
    ExifIFDPointer} and an Exif sub-IFD {ExposureTime, ISO,
    PixelXDimension, PixelYDimension} — the conformant writer half of the
    round-trip attestation."""
    import struct

    E = byte_order

    def ser(entries, data_off):
        """entries: [(tag, typ, payload)] sorted by tag (TIFF 6.0 §2
        requires ascending tag order). Returns (table_wo_header, data,
        next_off); out-of-line values land at running ``data_off``."""
        table, data = b"", b""
        for tag, typ, val in sorted(entries):
            if typ == 2:
                raw = val.encode("ascii") + b"\x00"
                cnt = len(raw)
            elif typ == 5:
                raw = b"".join(struct.pack(E + "II", n, d) for n, d in val)
                cnt = len(val)
            else:
                fmt = {1: "B", 3: "H", 4: "I"}[typ]
                raw = struct.pack(E + fmt * len(val), *val)
                cnt = len(val)
            ent = struct.pack(E + "HHI", tag, typ, cnt)
            if len(raw) <= 4:
                ent += raw + b"\x00" * (4 - len(raw))
            else:
                pad = len(raw) % 2
                ent += struct.pack(E + "I", data_off)
                data += raw + b"\x00" * pad
                data_off += len(raw) + pad
            table += ent
        return table, data, data_off

    ifd0_entries = [
        (0x010F, 2, make),
        (0x0110, 2, model),
        (0x0112, 3, [orientation]),
        (0x0132, 2, datetime),
    ]
    sub_entries = [
        (0x829A, 5, [exposure]),
        (0x8827, 3, [iso]),
        (0xA002, 4, [pixel_x]),
        (0xA003, 4, [pixel_y]),
    ]
    ifd0_size = 2 + 12 * (len(ifd0_entries) + 1) + 4  # +1 for the ExifIFD ptr
    sub_size = 2 + 12 * len(sub_entries) + 4
    sub_off = 8 + ifd0_size
    data_start = sub_off + sub_size
    ifd0_entries.append((0x8769, 4, [sub_off]))
    t0, d0, off = ser(ifd0_entries, data_start)
    t1, d1, _ = ser(sub_entries, off)
    tiff = (
        (b"II*\x00" if E == "<" else b"MM\x00*")
        + struct.pack(E + "I", 8)
        + struct.pack(E + "H", len(ifd0_entries))
        + t0
        + struct.pack(E + "I", 0)
        + struct.pack(E + "H", len(sub_entries))
        + t1
        + struct.pack(E + "I", 0)
        + d0
        + d1
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI — where EXIF lives in
    every camera file."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


EXIF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_order", StringType()),
        StructField("make", StringType()),
        StructField("model", StringType()),
        StructField("orientation", LongType()),
        StructField("datetime", StringType()),
        StructField("exposure_num", LongType()),
        StructField("exposure_den", LongType()),
        StructField("iso", LongType()),
        StructField("pixel_x", LongType()),
        StructField("pixel_y", LongType()),
    ]
)


def exif_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, byte_order, make, model, orientation, datetime,
    exposure_num, exposure_den, iso, pixel_x, pixel_y) via ``exif_tags``
    over the payload column. Map-only Arrow pass — one JPEG in memory at
    a time per row; payload bytes never shuffle."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                t = exif_tags(bytes(payload))
                t["doc_id"] = i
                rows.append(t)
            yield pd.DataFrame(rows, columns=[f.name for f in EXIF_SCHEMA.fields])

    return df.mapInPandas(extract, EXIF_SCHEMA)


# --- Audio filterbank (8-point DFT band energies) ----------------------------

FILTERBANK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bin", LongType()),
        StructField("n_frames", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_filterbank(df: DataFrame, frame: int = 8) -> DataFrame:
    """Frame-level spectral band energies from 16-bit PCM WAV — the
    filterbank step that precedes MFCC/speech features: samples are cut
    into non-overlapping ``frame``-sample windows and each window's
    energy at DFT bins {0, 2, 4} (DC, quarter-rate, Nyquist for
    frame=8) is summed per recording. These three bins have INTEGER
    twiddle factors (cos/sin ∈ {1, 0, −1} at the 8-point grid), so with
    int16 samples the whole computation — Re/Im sums, squares, frame
    totals — is exact int64 arithmetic: bit-identical on any engine and
    SQL-expressible, which is what makes the driver's oracle attestation
    possible for a DSP operator. (A production mel bank adds the
    irrational-twiddle bins; the framing/accumulation shape is
    identical.)

    Scale shape: map-only Arrow pass, one recording in memory at a time;
    output is 3 rows per recording regardless of duration."""

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # integer twiddles for bins 0, 2, 4 at the 8-point grid
        j = np.arange(frame)
        cos2 = np.array([1, 0, -1, 0] * (frame // 4), dtype=np.int64)
        sin2 = np.array([0, 1, 0, -1] * (frame // 4), dtype=np.int64)
        cos4 = np.where(j % 2 == 0, 1, -1).astype(np.int64)
        ones = np.ones(frame, dtype=np.int64)

        for pdf in batches:
            out = {"doc_id": [], "bin": [], "n_frames": [], "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = parse_wav_header(bytes(payload)) if payload is not None else None
                if wav is None or wav["bits_per_sample"] != 16:
                    for k in (0, 2, 4):
                        out["doc_id"].append(doc_id)
                        out["bin"].append(k)
                        out["n_frames"].append(None)
                        out["energy"].append(None)
                    continue
                lo, n = wav["data_offset"], wav["data_len"]
                body = bytes(payload)[lo : lo + (n & ~1)]
                x = np.frombuffer(body, dtype="<i2").astype(np.int64)
                nf = x.size // frame
                fr = x[: nf * frame].reshape(nf, frame)
                for k, (c, s) in ((0, (ones, None)), (2, (cos2, sin2)),
                                  (4, (cos4, None))):
                    re = fr @ c
                    e = re * re
                    if s is not None:
                        im = fr @ s
                        e = e + im * im
                    out["doc_id"].append(doc_id)
                    out["bin"].append(k)
                    out["n_frames"].append(nf)
                    out["energy"].append(int(e.sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, FILTERBANK_SCHEMA)


MOTION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("sad", LongType()),
        StructField("mad_micro", LongType()),
    ]
)


def motion_energy(df: DataFrame) -> DataFrame:
    """Quantitative per-frame motion profile — the continuous companion to
    ``detect_scene_cuts``: for every consecutive frame pair the SUM of
    absolute luma differences (SAD, the metric hardware motion estimators
    use) and the mean per pixel in micro-units. Video curation ranks
    clips by motion (static slideshows vs real footage) and picks
    keyframes at motion minima; the thresholded cut list alone can't do
    either. Integer arithmetic end to end (uint8 planes, int64 sums) —
    exact on any engine.

    REAL for Y4M; non-Y4M raises honestly (compressed video needs
    ffmpeg); NULL payloads produce no rows. Map-only Arrow pass; one
    clip in memory at a time."""

    def sad_rows(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "sad": [], "mad_micro": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                meta = parse_y4m_header(raw)
                if meta is None:
                    raise ValueError(
                        "motion energy needs a Y4M payload "
                        "(compressed video requires ffmpeg, absent here)"
                    )
                w, h = meta["width"], meta["height"]
                import math

                prev, i, idx = None, meta["header_end"], 0
                while i < len(raw) and raw[i : i + 5] == b"FRAME":
                    fnl = raw.find(b"\n", i)
                    lo = fnl + 1
                    y = np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=lo)
                    if prev is not None:
                        sad = int(
                            np.abs(
                                y.astype(np.int64) - prev.astype(np.int64)
                            ).sum()
                        )
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(idx)
                        out["sad"].append(sad)
                        out["mad_micro"].append(
                            math.floor(sad * 1e6 / (w * h) + 0.5)
                        )
                    prev = y
                    idx += 1
                    i = lo + meta["frame_bytes"]
            yield pd.DataFrame(out)

    return df.mapInPandas(sad_rows, MOTION_SCHEMA)
