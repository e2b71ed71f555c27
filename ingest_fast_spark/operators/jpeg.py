"""Baseline JPEG codec with ZERO image libraries — the pure-Python /
numpy companion of ``multimodal.decode_png_pixels`` / ``decode_gif_pixels``
that upgrades the engine's no-PIL image path from "header metadata only"
to REAL pixel decode for the dominant lossy web format.

Decoder (`decode_jpeg_pixels`): ITU-T T.81 baseline sequential DCT —
generic DQT/DHT/SOF0/SOS segment parsing, bit-exact Huffman entropy
decode (byte-stuffing and restart markers handled), dequantize +
dezigzag, 8x8 inverse DCT as two numpy matrix products against the
orthonormal DCT-II basis, generic Hi/Vi chroma subsampling with
nearest-neighbor upsample, JFIF full-range YCbCr->RGB. Progressive
(SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError (honest gates); truncated or corrupt streams raise
ValueError.

Encoder (`make_jpeg`): a conformant baseline encoder used to synthesize
deterministic payloads for round-trip attestation — 4:4:4, flat
quantization (all ones, so solid-color images round-trip EXACTLY and
patterned images within DCT rounding), in-file canonical Huffman tables
(every decoder reads tables from DHT, so no Annex K transcription is
needed). Any conformant decoder, PIL included, can decode its output.

Reference parity note: /root/reference is pure-text ETL (no media); this
module serves SURVEY.md §2.9 [EXT] multimodal requirements only.
"""

from __future__ import annotations

import struct

# Zig-zag scan order: index i of the scan -> (row, col) flattened offset.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_basis():
    import numpy as np

    n = np.arange(8)
    k = n.reshape(-1, 1)
    m = np.cos((2 * n + 1) * k * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5  # orthonormal: M @ M.T = I


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; unstuffs
    0xFF00 and stops at any other marker (leaving it for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        b = self.data
        if self.pos >= len(b):
            return False
        byte = b[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(b):
                return False
            nxt = b[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST: caller resyncs via read_marker
                self.marker = nxt
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_rst(self) -> None:
        """At a restart boundary: drop partial bits, consume the RSTn."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
        else:  # spec allows the RST to sit right at the scan pointer
            b = self.data
            if self.pos + 1 < len(b) and b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                self.pos += 2


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """(length, code) -> symbol, canonical per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(r: int, s: int) -> int:
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline JPEG to {width, height, mode, format, pixels}
    with pixels an (h, w, 3) RGB (or (h, w, 1) L) uint8 array."""
    import numpy as np

    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG signature")
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at {i}")
        marker = b[i + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = q
                qt[tid] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_huffman(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / extended sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X}: "
                "progressive/lossless/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            # Honest gate: _decode_scan assumes ONE interleaved scan
            # covering every frame component; a scan listing fewer
            # components (non-interleaved baseline) needs per-component
            # MCU walks this decoder does not implement.
            if ns != len(frame["comps"]):
                raise NotImplementedError("non-interleaved JPEG scan")
            scan = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            if any(c["id"] not in scan for c in frame["comps"]):
                raise ValueError("JPEG scan component ids do not match frame")
            return _decode_scan(
                b, i + 2 + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seglen
    raise ValueError("JPEG contains no scan")


def _decode_scan(b, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    import numpy as np

    M = _dct_basis()
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        raise ValueError("JPEG with zero dimension")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("invalid JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.align_and_skip_rst()
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            tdc, tac = scan[c["id"]]
            dct = huff_dc.get(tdc)
            act = huff_ac.get(tac)
            q = qt.get(c["tq"])
            if dct is None or act is None or q is None:
                raise ValueError("JPEG scan references a missing table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int32)
                    s = _decode_symbol(br, dct)
                    if s > 11:
                        raise ValueError("invalid JPEG DC category")
                    diff = _extend(br.read_bits(s), s) if s else 0
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(br, act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[_ZIGZAG[k]] = _extend(br.read_bits(s), s)
                        k += 1
                    block = (coef.reshape(8, 8) * q).astype(np.float64)
                    px = M.T @ block @ M + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        px = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return {
            "width": int(w), "height": int(h), "mode": "L",
            "format": "JPEG", "pixels": px[:, :, None],
        }
    if len(comps) != 3:
        raise NotImplementedError(f"JPEG with {len(comps)} components")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return {
        "width": int(w), "height": int(h), "mode": "RGB",
        "format": "JPEG",
        "pixels": np.clip(np.rint(rgb), 0, 255).astype(np.uint8),
    }


# --------------------------------------------------------------------------
# Encoder (round-trip attestation)
# --------------------------------------------------------------------------

# Canonical in-file tables: 12 DC categories at 4 bits, all 256 AC
# (run, size) symbols at 9 bits — valid canonical Huffman (the all-ones
# code stays unused at both lengths), read back generically from DHT by
# any decoder. No Annex K transcription needed.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = bytes(list(range(255)) + [255])


def _enc_table(bits: list[int], vals: bytes) -> dict:
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def make_jpeg(
    width: int,
    height: int,
    rgb_rows=None,
    subsample420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """A complete, valid baseline JPEG built with the stdlib + numpy:
    4:4:4 (or 4:2:0 with ``subsample420``) sampling, flat all-ones
    quantization, in-file canonical Huffman tables, optional DRI/RSTn
    restart markers. ``rgb_rows`` is an (h, w, 3) array-like of uint8
    (default: a deterministic gradient). Solid-color inputs round-trip
    EXACTLY (DC-only blocks, integer DCT coefficients); arbitrary inputs
    within DCT rounding (max abs error a few counts at 4:4:4)."""
    import numpy as np

    if rgb_rows is None:
        yy, xx = np.mgrid[0:height, 0:width]
        rgb_rows = np.stack(
            [(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1
        )
    img = np.asarray(rgb_rows, dtype=np.float64)
    if img.shape != (height, width, 3):
        raise ValueError("rgb_rows must be (height, width, 3)")
    r, g, b_ = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b_
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b_ + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b_ + 128.0

    hv = [(2, 2), (1, 1), (1, 1)] if subsample420 else [(1, 1), (1, 1), (1, 1)]
    hmax = max(h_ for h_, _ in hv)
    vmax = max(v_ for _, v_ in hv)
    mcux, mcuy = -(-width // (8 * hmax)), -(-height // (8 * vmax))

    def prep(p, h_, v_):
        # pad to the MCU grid, then box-average down to this component's
        # sampling resolution (exact for solid colors)
        ph, pw = mcuy * v_ * 8, mcux * h_ * 8
        fy, fx = vmax // v_, hmax // h_
        full = np.pad(
            p,
            ((0, ph * fy - p.shape[0]), (0, pw * fx - p.shape[1])),
            mode="edge",
        )
        if fy > 1 or fx > 1:
            full = full.reshape(ph, fy, pw, fx).mean(axis=(1, 3))
        return full

    planes = [prep(p, h_, v_) for p, (h_, v_) in zip((y, cb, cr), hv)]
    M = _dct_basis()
    dc_tab = _enc_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _enc_table(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    pred = [0, 0, 0]
    body = bytearray()
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            body += bw.flush()
            bw = _BitWriter()
            body += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0, 0, 0]
        my, mx = divmod(mcu, mcux)
        for ci, (h_, v_) in enumerate(hv):
            for by in range(v_):
                for bx in range(h_):
                    y0 = (my * v_ + by) * 8
                    x0 = (mx * h_ + bx) * 8
                    block = planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = np.rint(M @ block @ M.T).astype(np.int64)
                    zz = coef.reshape(-1)[_ZIGZAG]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s = int(abs(diff)).bit_length()
                    code, ln = dc_tab[s]
                    bw.write(code, ln)
                    if s:
                        rb = diff if diff >= 0 else diff + (1 << s) - 1
                        bw.write(rb, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_tab[0xF0]  # ZRL
                            bw.write(code, ln)
                            run -= 16
                        s = int(abs(v)).bit_length()
                        code, ln = ac_tab[(run << 4) | s]
                        bw.write(code, ln)
                        rb = v if v >= 0 else v + (1 << s) - 1
                        bw.write(rb, s)
                        run = 0
                    if run:
                        code, ln = ac_tab[0x00]  # EOB
                        bw.write(code, ln)
    body += bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # flat all-ones quantization table (identical in any scan order)
    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes(
            [3]
            + [x for cid, (h_, v_) in enumerate(hv, 1) for x in (cid, (h_ << 4) | v_, 0)]
        ),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(body) + b"\xff\xd9"
