"""Baseline JPEG codec with ZERO image libraries — the pure-Python /
numpy companion of ``multimodal.decode_png_pixels`` / ``decode_gif_pixels``
that upgrades the engine's no-PIL image path from "header metadata only"
to REAL pixel decode for the dominant lossy web format.

Decoder (`decode_jpeg_pixels`): ITU-T T.81 baseline sequential DCT AND
progressive DCT — generic DQT/DHT/SOF0/SOF2/SOS segment parsing,
bit-exact Huffman entropy decode (byte-stuffing and restart markers
handled), dequantize + dezigzag, 8x8 inverse DCT as two numpy matrix
products against the orthonormal DCT-II basis, generic Hi/Vi chroma
subsampling with nearest-neighbor upsample, JFIF full-range
YCbCr->RGB. Progressive streams accumulate coefficients across scans
(spectral selection bands, successive approximation for DC and AC —
first + refinement passes, EOB run-lengths with embedded correction
bits per T.81 G.2) and reconstruct once at EOI. Lossless/arithmetic/
hierarchical frames and 12-bit precision raise NotImplementedError
(honest gates); truncated or corrupt streams raise ValueError.

Encoders (`make_jpeg`, `make_jpeg_progressive`): conformant baseline /
progressive encoders used to synthesize deterministic payloads for
round-trip attestation — 4:4:4 or 4:2:0, flat quantization (all ones,
so solid-color images round-trip EXACTLY and patterned images within
DCT rounding; the progressive scan script reassembles the SAME integer
coefficients, so its decode is bit-identical to the baseline decode of
the same image), in-file canonical Huffman tables (every decoder reads
tables from DHT, so no Annex K transcription is needed). Any
conformant decoder, PIL included, can decode their output.

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
    """Decode a baseline OR progressive JPEG to {width, height, mode,
    format, pixels} with pixels an (h, w, 3) RGB (or (h, w, 1) L) uint8
    array. Progressive (SOF2) streams accumulate coefficients across all
    scans — spectral selection bands, successive approximation (DC and
    AC first + refinement), EOB runs — and reconstruct once at EOI."""
    import numpy as np

    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG signature")
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    prog_coefs = None  # per-component coefficient store (progressive)
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at {i}")
        marker = b[i + 1]
        if marker == 0xD9 and prog_coefs is not None:  # EOI: reconstruct
            return _reconstruct_progressive(frame, prog_coefs, qt)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X}: "
                "lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []  # (component index, dc table id, ac table id)
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    (j for j, fc in enumerate(frame["comps"]) if fc["id"] == cid),
                    None,
                )
                if ci is None:
                    raise ValueError("JPEG scan component ids do not match frame")
                scomps.append((ci, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if frame["prog"]:
                if prog_coefs is None:
                    prog_coefs = _prog_alloc(frame)
                i = _decode_prog_scan(
                    b, i + 2 + seglen, frame, scomps, ss, se, ah, al,
                    huff_dc, huff_ac, prog_coefs, restart_interval,
                )
                continue
            # Honest gate: _decode_scan assumes ONE interleaved scan
            # covering every frame component; a sequential scan listing
            # fewer components (non-interleaved baseline) needs the
            # per-component walks only the progressive path implements.
            if ns != len(frame["comps"]):
                raise NotImplementedError("non-interleaved JPEG scan")
            scan = {
                frame["comps"][ci]["id"]: (tdc, tac) for ci, tdc, tac in scomps
            }
            return _decode_scan(
                b, i + 2 + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seglen
    if prog_coefs is not None:  # tolerate a missing EOI after the last scan
        return _reconstruct_progressive(frame, prog_coefs, qt)
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
    return _planes_to_image(planes, comps, w, h, hmax, vmax)


def _planes_to_image(planes, comps, w, h, hmax, vmax):
    """Upsample + color-convert decoded component planes (shared by the
    baseline single-scan path and the progressive reconstruction)."""
    import numpy as np

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
# Progressive mode (T.81 SOF2): scan accumulation + final reconstruction
# --------------------------------------------------------------------------


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("invalid JPEG sampling factors")
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _comp_block_dims(frame, c):
    """Non-interleaved block dimensions: ceil of the component's OWN
    sample size (T.81 A.2.2 — padding blocks of the MCU grid are coded
    only in interleaved scans)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * c["h"] // (8 * hmax))
    ch = -(-frame["h"] * c["v"] // (8 * vmax))
    return ch, cw  # blocks down, blocks across


def _prog_alloc(frame):
    import numpy as np

    if frame["w"] == 0 or frame["h"] == 0:
        raise ValueError("JPEG with zero dimension")
    _, _, mcux, mcuy = _frame_geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _decode_prog_scan(
    b, pos, frame, scomps, ss, se, ah, al, huff_dc, huff_ac, coefs,
    restart_interval,
):
    """Decode one progressive scan into the coefficient store; returns
    the byte offset of the next marker segment."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    br = _BitReader(b, pos)
    if ss == 0:  # DC scan (first or refinement); may be interleaved
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        pred = [0] * len(scomps)

        def dc_block(si, blk):
            if ah == 0:
                tdc = scomps[si][1]
                dct = huff_dc.get(tdc)
                if dct is None:
                    raise ValueError("JPEG scan references a missing table")
                s = _decode_symbol(br, dct)
                if s > 11:
                    raise ValueError("invalid JPEG DC category")
                pred[si] += _extend(br.read_bits(s), s) if s else 0
                blk[0] = pred[si] << al
            elif br.read_bit():
                blk[0] |= 1 << al

        if len(scomps) > 1:  # interleaved MCU walk
            n_mcu = mcux * mcuy
            for mcu in range(n_mcu):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    br.align_and_skip_rst()
                    pred = [0] * len(scomps)
                my, mx = divmod(mcu, mcux)
                for si, (ci, _, _) in enumerate(scomps):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(
                                si,
                                coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                            )
        else:
            ci = scomps[0][0]
            bh, bw = _comp_block_dims(frame, comps[ci])
            for n in range(bh * bw):
                if restart_interval and n and n % restart_interval == 0:
                    br.align_and_skip_rst()
                    pred = [0] * len(scomps)
                dc_block(0, coefs[ci][n // bw, n % bw])
    else:  # AC scan: exactly one component, never interleaved
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("invalid spectral band")
        ci, _, tac = scomps[0]
        act = huff_ac.get(tac)
        if act is None:
            raise ValueError("JPEG scan references a missing table")
        bh, bw = _comp_block_dims(frame, comps[ci])
        eobrun = 0
        band = _ac_first_band if ah == 0 else _ac_refine_band
        for n in range(bh * bw):
            if restart_interval and n and n % restart_interval == 0:
                br.align_and_skip_rst()
                eobrun = 0
            eobrun = band(br, act, coefs[ci][n // bw, n % bw], ss, se, al, eobrun)
    # advance to the next marker (entropy data escapes 0xFF as 0xFF00)
    j = br.pos
    while j + 1 < len(b):
        if b[j] == 0xFF and b[j + 1] != 0x00 and not (0xD0 <= b[j + 1] <= 0xD7):
            return j
        j += 1
    return len(b)


def _ac_first_band(br, act, coef, ss, se, al, eobrun):
    """AC first scan for one block's band (T.81 G.1.2.2): runs/ZRL as in
    baseline, plus EOBn run-length symbols spanning blocks; decoded
    values enter at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block consumed here
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        coef[_ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_band(br, act, coef, ss, se, al, eobrun):
    """AC successive-approximation refinement (T.81 G.1.2.3): one more
    magnitude bit for already-nonzero coefficients (consumed in walk
    order), newly-nonzero coefficients at ±1<<Al, EOB runs carrying
    correction bits for the skipped remainder."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(z):
        # history coefficients are stage-aligned, so bit Al is 0 in both
        # signs until this scan sets it — the guard absorbs malformed
        # double-corrections without corrupting the magnitude
        if br.read_bit() and (int(coef[z]) & p1) == 0:
            coef[z] += p1 if coef[z] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # current block finishes in the tail
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            elif s == 1:
                newval = p1 if br.read_bit() else m1
            else:
                raise ValueError("invalid JPEG refinement size")
            while k <= se:
                z = _ZIGZAG[k]
                if coef[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if coef[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT every accumulated block (vectorized einsum over
    the whole component), then the shared upsample/color tail."""
    import numpy as np

    M = _dct_basis()
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG frame references a missing quant table")
        bh, bw = coefs[ci].shape[:2]
        blocks = coefs[ci].reshape(bh, bw, 8, 8).astype(np.float64) * q
        px = np.einsum("ji,yxjk,kl->yxil", M, blocks, M) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_image(planes, comps, w, h, hmax, vmax)


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
    grayscale: bool = False,
) -> bytes:
    """A complete, valid baseline JPEG built with the stdlib + numpy:
    4:4:4 (or 4:2:0 with ``subsample420``) sampling, flat all-ones
    quantization, in-file canonical Huffman tables, optional DRI/RSTn
    restart markers. ``rgb_rows`` is an (h, w, 3) array-like of uint8
    (default: a deterministic gradient). Solid-color inputs round-trip
    EXACTLY (DC-only blocks, integer DCT coefficients); arbitrary inputs
    within DCT rounding (max abs error a few counts at 4:4:4).
    ``grayscale=True`` emits a SINGLE-component (luma-only) frame — the
    other baseline shape in the wild; ``rgb_rows`` may then be (h, w)."""
    import numpy as np

    if rgb_rows is None:
        yy, xx = np.mgrid[0:height, 0:width]
        rgb_rows = np.stack(
            [(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1
        )
    img = np.asarray(rgb_rows, dtype=np.float64)
    if grayscale:
        if img.shape == (height, width):
            y = img
        elif img.shape == (height, width, 3):
            y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        else:
            raise ValueError("rgb_rows must be (h, w) or (h, w, 3)")
        if subsample420:
            raise ValueError("grayscale has no chroma to subsample")
        comps_yc = (y,)
        hv = [(1, 1)]
    else:
        if img.shape != (height, width, 3):
            raise ValueError("rgb_rows must be (height, width, 3)")
        r, g, b_ = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b_
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b_ + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b_ + 128.0
        comps_yc = (y, cb, cr)
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

    planes = [prep(p, h_, v_) for p, (h_, v_) in zip(comps_yc, hv)]
    M = _dct_basis()
    dc_tab = _enc_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _enc_table(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    pred = [0] * len(hv)
    body = bytearray()
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            body += bw.flush()
            bw = _BitWriter()
            body += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0] * len(hv)
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
            [len(hv)]
            + [x for cid, (h_, v_) in enumerate(hv, 1) for x in (cid, (h_ << 4) | v_, 0)]
        ),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(
        0xDA,
        bytes([len(hv)]
              + [x for cid in range(1, len(hv) + 1) for x in (cid, 0x00)]
              + [0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(body) + b"\xff\xd9"


def make_jpeg_progressive(
    width: int,
    height: int,
    rgb_rows=None,
    subsample420: bool = False,
) -> bytes:
    """A complete, valid PROGRESSIVE (SOF2) JPEG built with the stdlib +
    numpy, for round-trip attestation of the progressive decode path.
    Nine-scan script exercising every T.81 progressive mechanism:

      1. DC first, all components interleaved (Ah=0, Al=1)
      2. AC first, luma band Ss=1..5          (Al=1)  — spectral band 1
      3. AC first, Cb 1..63                   (Al=1)
      4. AC first, Cr 1..63                   (Al=1)
      5. AC first, luma band Ss=6..63         (Al=1)  — spectral band 2
      6. DC refinement, interleaved           (Ah=1, Al=0)
      7-9. AC refinement per component 1..63  (Ah=1, Al=0)

    Same flat all-ones quantization and in-file canonical Huffman tables
    as ``make_jpeg``, so after all scans the accumulated coefficients are
    bit-identical to the sequential encoding: solid-color images
    round-trip EXACTLY and arbitrary images within DCT rounding."""
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
    M = _dct_basis()
    zz = []  # per comp: (bh, bw, 64) int64, ZIGZAG order
    nonil_dims = []  # per comp: non-interleaved (bh, bw)
    for ci, (h_, v_) in enumerate(hv):
        p = (y, cb, cr)[ci]
        ph, pw = mcuy * v_ * 8, mcux * h_ * 8
        fy, fx = vmax // v_, hmax // h_
        full = np.pad(
            p, ((0, ph * fy - p.shape[0]), (0, pw * fx - p.shape[1])), mode="edge"
        )
        if fy > 1 or fx > 1:
            full = full.reshape(ph, fy, pw, fx).mean(axis=(1, 3))
        blocks = full.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.rint(np.einsum("ij,yxjk,lk->yxil", M, blocks, M)).astype(np.int64)
        zz.append(coef.reshape(ph // 8, pw // 8, 64)[:, :, _ZIGZAG])
        cw = -(-width * h_ // (8 * hmax))
        ch = -(-height * v_ // (8 * vmax))
        nonil_dims.append((ch, cw))
    dc_tab = _enc_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _enc_table(_ENC_AC_BITS, _ENC_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(comp_specs: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, tdc, tac in comp_specs:
            body += bytes([cid, (tdc << 4) | tac])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes(
            [len(hv)]
            + [x for cid, (h_, v_) in enumerate(hv, 1) for x in (cid, (h_ << 4) | v_, 0)]
        ),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
    )

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    pred = [0, 0, 0]
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (h_, v_) in enumerate(hv):
            for by in range(v_):
                for bx in range(h_):
                    v = int(zz[ci][my * v_ + by, mx * h_ + bx, 0]) >> 1
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = int(abs(diff)).bit_length()
                    code, ln = dc_tab[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1) + bw.flush()

    # scans 2-5: AC first per component (luma split into two bands)
    for ci, ss, se in ((0, 1, 5), (1, 1, 63), (2, 1, 63), (0, 6, 63)):
        bw = _BitWriter()
        _enc_ac_first_scan(bw, ac_tab, zz[ci], nonil_dims[ci], ss, se, 1)
        out += sos([(ci + 1, 0, 0)], ss, se, 0, 1) + bw.flush()

    # scan 6: DC refinement (bit 0), interleaved
    bw = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (h_, v_) in enumerate(hv):
            for by in range(v_):
                for bx in range(h_):
                    bw.write(int(zz[ci][my * v_ + by, mx * h_ + bx, 0]) & 1, 1)
    out += sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0) + bw.flush()

    # scans 7-9: AC refinement per component (bit 0)
    for ci in range(3):
        bw = _BitWriter()
        _enc_ac_refine_scan(bw, ac_tab, zz[ci], nonil_dims[ci], 1, 63, 0)
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0) + bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _enc_ac_first_scan(bw, ac_tab, zzc, dims, ss, se, al):
    """Encode one AC first scan (point transform Al, sign-magnitude
    truncation) over the component's non-interleaved block walk, with
    cross-block EOB run accumulation."""
    bh, bwid = dims
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            n = min(eobrun.bit_length() - 1, 14)
            run = min(eobrun, (1 << (n + 1)) - 1)
            code, ln = ac_tab[n << 4]
            bw.write(code, ln)
            if n:
                bw.write(run - (1 << n), n)
            eobrun -= run

    for bi in range(bh * bwid):
        blk = zzc[bi // bwid, bi % bwid]
        r = 0
        wrote = False
        for k in range(ss, se + 1):
            v = int(blk[k])
            tv = (abs(v) >> al) * (1 if v >= 0 else -1)
            if tv == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                r -= 16
            s = int(abs(tv)).bit_length()
            code, ln = ac_tab[(r << 4) | s]
            bw.write(code, ln)
            bw.write(tv if tv >= 0 else tv + (1 << s) - 1, s)
            r = 0
            wrote = True
        if r or not wrote:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine_scan(bw, ac_tab, zzc, dims, ss, se, al):
    """Encode one AC refinement scan (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients buffered and emitted after the next
    symbol; newly-nonzero coefficients as (run, 1) + sign; EOB runs carry
    the buffered corrections of skipped block remainders."""
    bh, bwid = dims
    eobrun = 0
    be_bits: list[int] = []  # corrections pending with the EOB run
    br_bits: list[int] = []  # corrections of the current block, since last symbol

    def emit_pending():
        # EOBn symbol(s) for the accumulated run, then the correction
        # bits of every block the run skipped (walk order)
        nonlocal eobrun, be_bits
        first = True
        while eobrun > 0:
            n = min(eobrun.bit_length() - 1, 14)
            run = min(eobrun, (1 << (n + 1)) - 1)
            code, ln = ac_tab[n << 4]
            bw.write(code, ln)
            if n:
                bw.write(run - (1 << n), n)
            eobrun -= run
            if first:
                for bit in be_bits:
                    bw.write(bit, 1)
                be_bits = []
                first = False

    def emit_br():
        nonlocal br_bits
        for bit in br_bits:
            bw.write(bit, 1)
        br_bits = []

    for bi in range(bh * bwid):
        blk = zzc[bi // bwid, bi % bwid]
        vals = [int(blk[k]) for k in range(ss, se + 1)]
        temps = [abs(v) >> al for v in vals]
        # last newly-nonzero coefficient: content beyond it folds into EOB
        eob = -1
        for idx, t in enumerate(temps):
            if t == 1:
                eob = idx
        r = 0
        for idx, t in enumerate(temps):
            if t == 0:
                r += 1
                continue
            # pending ZRLs must flush at ANY nonzero coefficient (history
            # or new) once r > 15: the decoder consumes correction bits
            # positionally during each ZRL's 16-zero skip, so a history
            # coefficient sitting past the 16th zero-history position must
            # have its bit emitted after the ZRL that walks past it
            while r > 15 and idx <= eob:
                emit_pending()
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
                emit_br()
            if t > 1:  # already nonzero: one correction bit, bit Al
                br_bits.append(t & 1)
                continue
            # newly nonzero (t == 1): flush the pending EOB run first
            emit_pending()
            code, ln = ac_tab[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(0 if vals[idx] < 0 else 1, 1)
            emit_br()
            r = 0
        if r > 0 or br_bits:  # block tail folds into the EOB run
            eobrun += 1
            be_bits.extend(br_bits)
            br_bits = []
            if eobrun == 0x7FFF or len(be_bits) > 900:
                emit_pending()
    emit_pending()
