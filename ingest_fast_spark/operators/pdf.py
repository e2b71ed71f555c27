"""PDF text extraction with ZERO pdf libraries — the document-format
companion of ``operators/jpeg.py`` / ``operators/multimodal.py`` for the
multimodal ingest path: PDFs are the dominant long-form document format
in web-scale training corpora, and a pipeline that can only pass their
bytes through cannot curate them.

Extractor (`extract_pdf_text`): a real ISO 32000 parser, not a regex
scrape — classic cross-reference table(s) with /Prev chaining, PDF 1.5+
cross-reference STREAMS (/Type /XRef: W-field decode, /Index subsections,
FlateDecode + PNG predictors) including hybrid /XRefStm files, /Type
/ObjStm object streams (compressed objects), trailer /Root, object
tokenizer (dicts, arrays, names, numbers, literal strings with escapes
and balanced parentheses, hex strings, indirect references), stream
objects with indirect /Length and FlateDecode (stdlib zlib), page-tree
walk (/Pages /Kids recursion, /Contents ref or array), and a
content-stream interpreter that collects the text-showing operators Tj,
', ", and TJ (array form with kerning numbers). Pages are joined with
newlines. Stream filters: FlateDecode, ASCIIHexDecode, ASCII85Decode,
RunLengthDecode and LZWDecode (EarlyChange, 9-12-bit MSB codes) including
filter CHAINS and the PNG/TIFF predictors. Honest gates: /Encrypt and the
image-only codecs (DCTDecode, CCITTFaxDecode, JBIG2Decode, JPXDecode,
Crypt) raise NotImplementedError; structurally broken files raise
ValueError.

Synthesizer (`make_pdf`): a conformant writer used for round-trip
attestation — one page per text chunk, literal AND hex string forms plus
the TJ array form (so the extractor's whole operator surface executes),
FlateDecode-compressed content streams, and either a classic xref table
(PDF 1.4) or a /Type /XRef stream + /ObjStm layout (PDF 1.5,
``xref_stream=True``). Any conformant reader can open its output.

Reference parity note: /root/reference is pure-text ETL (no media); this
module serves SURVEY.md §2.9 [EXT] multimodal requirements only.
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


class _Str(bytes):
    """A PDF string object — distinct from plain ``bytes``, which the
    lexer uses for keywords/operators (the two must never be confused in
    a content stream, where both appear)."""


class _Lexer:
    """Tokenizer over the raw PDF bytes (also used inside decompressed
    content streams)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.b = data
        self.i = pos

    def _skip_ws(self) -> None:
        b, i = self.b, self.i
        while i < len(b):
            c = b[i : i + 1]
            if c in (b"%",):  # comment to end of line
                while i < len(b) and b[i] not in (0x0A, 0x0D):
                    i += 1
            elif b[i] in _WS:
                i += 1
            else:
                break
        self.i = i

    def peek_byte(self):
        self._skip_ws()
        return self.b[self.i : self.i + 1]

    def read_token(self) -> bytes:
        """Next regular token (name, number, keyword) or delimiter."""
        self._skip_ws()
        b, i = self.b, self.i
        if i >= len(b):
            raise ValueError("unexpected end of PDF")
        c = b[i : i + 1]
        if c == b"<" and b[i + 1 : i + 2] == b"<":
            self.i = i + 2
            return b"<<"
        if c == b">" and b[i + 1 : i + 2] == b">":
            self.i = i + 2
            return b">>"
        if c in _DELIM:
            self.i = i + 1
            return c
        j = i
        while j < len(b) and b[j] not in _WS and b[j : j + 1] not in _DELIM:
            j += 1
        self.i = j
        return b[i:j]

    def read_literal_string(self) -> bytes:
        """After the opening '(' — balanced parens, backslash escapes."""
        b, i = self.b, self.i
        out = bytearray()
        depth = 1
        while i < len(b):
            c = b[i]
            if c == 0x5C:  # backslash
                i += 1
                e = b[i : i + 1]
                mapped = {
                    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                    b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\",
                }.get(e)
                if mapped is not None:
                    out += mapped
                    i += 1
                elif e.isdigit():  # octal, up to 3 digits
                    j = i
                    while j < i + 3 and b[j : j + 1].isdigit():
                        j += 1
                    out.append(int(b[i:j], 8) & 0xFF)
                    i = j
                elif e in (b"\n", b"\r"):  # line continuation
                    i += 1
                else:
                    out += e
                    i += 1
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    self.i = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("unterminated PDF string")

    def read_hex_string(self) -> bytes:
        """After the opening '<' (not '<<')."""
        b = self.b
        j = b.index(b">", self.i)
        hx = re.sub(rb"\s", b"", b[self.i : j])
        self.i = j + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))

    def read_object(self):
        """One PDF object: dict/array/name/number/string/ref/keyword."""
        tok = self.read_token()
        if tok == b"<<":
            d = {}
            while True:
                if self.peek_byte() == b">":
                    if self.read_token() != b">>":
                        raise ValueError("malformed PDF dictionary")
                    return d
                key = self.read_object()
                if not isinstance(key, str):
                    raise ValueError("PDF dict key is not a name")
                d[key] = self.read_object()
        if tok == b"[":
            arr = []
            while self.peek_byte() != b"]":
                arr.append(self.read_object())
            self.read_token()  # consume ]
            return arr
        if tok == b"/":
            return "/" + self.read_token().decode("latin-1")
        if tok == b"(":
            return _Str(self.read_literal_string())
        if tok == b"<":
            return _Str(self.read_hex_string())
        if re.fullmatch(rb"[+-]?\d+", tok):
            # possible indirect reference "n g R"
            save = self.i
            try:
                gen = self.read_token()
                r = self.read_token()
                if r == b"R" and re.fullmatch(rb"\d+", gen):
                    return _Ref(int(tok))
            except ValueError:
                pass
            self.i = save
            return int(tok)
        if re.fullmatch(rb"[+-]?(\d+\.\d*|\.\d+)", tok):
            return float(tok)
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        return tok  # keyword (obj, stream, endobj, operators, ...)


def _png_unpredict(data: bytes, columns: int, predictor: int, bpp: int = 1) -> bytes:
    """Undo the PNG row predictors (RFC 2083 §6) PDF stream /DecodeParms
    apply — xref streams in the wild almost universally use Predictor 12
    (Up). ``columns`` is the row width in bytes, ``bpp`` the bytes per
    sample unit (Colors*BitsPerComponent/8, >= 1)."""
    if predictor < 2:
        return data
    if predictor == 2:
        # TIFF horizontal differencing: no per-row tag byte, each sample is
        # stored as the delta from the previous sample in the row
        if columns <= 0 or len(data) % columns:
            raise ValueError("PDF TIFF predictor data is not whole rows")
        out = bytearray(data)
        for r in range(0, len(out), columns):
            for i in range(bpp, columns):
                out[r + i] = (out[r + i] + out[r + i - bpp]) & 0xFF
        return bytes(out)
    rowlen = columns + 1
    if rowlen <= 1 or len(data) % rowlen:
        raise ValueError("PDF predictor data is not a whole number of rows")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), rowlen):
        ft = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        if ft == 1:  # Sub
            for i in range(bpp, columns):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - bpp] if i >= bpp else 0
                bb = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG predictor row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _ascii_hex_decode(raw: bytes) -> bytes:
    """/ASCIIHexDecode (ISO 32000 7.4.2): hex pairs, whitespace ignored,
    '>' is EOD, an odd trailing digit is padded with 0."""
    body = raw.split(b">", 1)[0]
    digits = bytes(c for c in body if c not in _WS)
    if not re.fullmatch(rb"[0-9a-fA-F]*", digits):
        raise ValueError("ASCIIHexDecode: non-hex digit")
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _ascii85_decode(raw: bytes) -> bytes:
    """/ASCII85Decode (ISO 32000 7.4.3): base-85 groups, 'z' for an all-zero
    group, '~>' EOD, whitespace ignored (stdlib a85 codec, Adobe framing
    stripped by hand since PDF omits the leading '<~')."""
    import base64

    body = raw.split(b"~>", 1)[0]
    body = bytes(c for c in body if c not in _WS)
    return base64.a85decode(body)


def _rle_decode(raw: bytes) -> bytes:
    """/RunLengthDecode (ISO 32000 7.4.5): length byte L — 0..127 copies the
    next L+1 bytes literally, 129..255 repeats the next byte 257-L times,
    128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(raw):
        l = raw[i]
        if l == 128:
            return bytes(out)
        if l < 128:
            chunk = raw[i + 1 : i + 2 + l]
            if len(chunk) != l + 1:
                raise ValueError("RunLengthDecode: truncated literal run")
            out += chunk
            i += 2 + l
        else:
            if i + 1 >= len(raw):
                raise ValueError("RunLengthDecode: truncated repeat run")
            out += raw[i + 1 : i + 2] * (257 - l)
            i += 2
    raise ValueError("RunLengthDecode: missing EOD")


def _rle_encode(data: bytes) -> bytes:
    """RunLength encoder (writer side): greedy runs >= 3, literal chunks
    otherwise — any conformant splitter is valid; this one exercises both
    decoder branches."""
    out = bytearray()
    i = 0
    n = len(data)
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
                # stop the literal before a run of >= 3 starts
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            if j == i:
                j = i + 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def _lzw_decode(raw: bytes, early_change: int = 1) -> bytes:
    """/LZWDecode (ISO 32000 7.4.4): MSB-first variable-width codes
    (9..12 bits), 256 = clear table, 257 = EOD, code width grows one entry
    early under the default EarlyChange=1."""
    out = bytearray()
    table: dict[int, bytes] = {}
    width, nxt, prev = 9, 258, None
    acc = nbits = 0
    for byte in raw:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table.clear()
                width, nxt, prev = 9, 258, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("LZWDecode: first code not a literal")
                entry = bytes([code])
            elif code < 256:
                entry = bytes([code])
            elif code < nxt:
                entry = table[code]
            elif code == nxt:
                entry = prev + prev[:1]
            else:
                raise ValueError("LZWDecode: code beyond table")
            out += entry
            if prev is not None and nxt < 4096:
                table[nxt] = prev + entry[:1]
                nxt += 1
                # normative early-change schedule (pdf.js LZWStream /
                # libtiff): grow when the NEXT code to assign reaches
                # 2^width - earlyChange
                if nxt + early_change >= (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ValueError("LZWDecode: missing EOD")


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """LZW encoder (writer side). The WIDTH schedule simulates the
    decoder's table growth exactly (``dec_next``): the decoder adds one
    entry per data code processed after the first — one entry BEHIND the
    encoder's own additions, and one entry AHEAD at the final data code
    (which adds nothing encoder-side) — and grows the width when
    dec_next + earlyChange reaches 2^width. Tracking the encoder's own
    ``nxt`` instead desynchronizes at both boundaries (caught live on
    the sf0.1 corpus at the 512-entry boundary)."""
    bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {}
    width, nxt = 9, 258
    dec_next = 258
    emitted_data = 0

    def emit(code: int) -> None:
        nonlocal width, dec_next, emitted_data
        bits.append((code, width))
        emitted_data += 1
        # the decoder adds a table entry while PROCESSING every data code
        # after the first, then may grow the width it reads the NEXT
        # code with — mirror that state machine exactly
        if emitted_data >= 2 and dec_next < 4096:
            dec_next += 1
            if dec_next + early_change >= (1 << width) and width < 12:
                width += 1

    bits.append((256, width))
    if data:
        w = data[:1]
        for c in data[1:]:
            wc = w + bytes([c])
            if wc in table:
                w = wc
                continue
            emit(w[0] if len(w) == 1 else table[w])
            if nxt < 4096:
                table[wc] = nxt
                nxt += 1
            w = bytes([c])
        emit(w[0] if len(w) == 1 else table[w])
    bits.append((257, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


_FILTER_DECODERS = {
    "/ASCIIHexDecode": _ascii_hex_decode,
    "/ASCII85Decode": _ascii85_decode,
    "/RunLengthDecode": _rle_decode,
    "/LZWDecode": _lzw_decode,
}


def _apply_filters(raw: bytes, filt, parms=None) -> bytes:
    """Apply a stream's /Filter chain in array order (ISO 32000 7.4:
    filters are listed in DECODING order). /DecodeParms predictors are
    honored for Flate/LZW stages. Unsupported filters (the image codecs
    DCTDecode/CCITTFaxDecode/JBIG2Decode/JPXDecode, and Crypt) raise —
    the module's honest gate."""
    filters = filt if isinstance(filt, list) else [filt]
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms_list):
        if f == "/FlateDecode":
            data = zlib.decompress(data)
        elif f in _FILTER_DECODERS:
            data = _FILTER_DECODERS[f](data)
        else:
            raise NotImplementedError(f"PDF stream filter {f}")
        if isinstance(p, dict) and p.get("/Predictor", 1) != 1 and f in (
            "/FlateDecode",
            "/LZWDecode",
        ):
            colors = p.get("/Colors", 1)
            bitspc = p.get("/BitsPerComponent", 8)
            bpp = max(1, (colors * bitspc) // 8)
            data = _png_unpredict(
                data, p.get("/Columns", 1) * bpp, p.get("/Predictor"), bpp
            )
    return data


def _parse_xref_stream_at(
    b: bytes, pos: int, offsets: dict, compressed: dict
) -> dict:
    """One cross-reference STREAM (ISO 32000 §7.5.8): ``n g obj << /Type
    /XRef /W [...] /Index [...] >> stream`` — W-field decode (type 1 →
    byte offset, type 2 → (objstm, index)), optional FlateDecode + PNG
    predictor. Returns the stream dictionary (it doubles as the trailer).
    Entries respect newest-wins across the /Prev chain via the same
    not-already-present rule the classic parser uses."""
    lx = _Lexer(b, pos)
    int(lx.read_token())  # object number
    lx.read_token()  # generation
    if lx.read_token() != b"obj":
        raise ValueError("startxref does not point at an object")
    d = lx.read_object()
    if not isinstance(d, dict) or d.get("/Type") != "/XRef":
        raise ValueError("startxref object is not a /Type /XRef stream")
    if lx.read_token() != b"stream":
        raise ValueError("xref stream without stream data")
    i = lx.i
    if b[i : i + 2] == b"\r\n":
        i += 2
    elif b[i : i + 1] == b"\n":
        i += 1
    length = d.get("/Length")
    if isinstance(length, int):
        raw = b[i : i + length]
    else:
        # indirect /Length would need the xref being built — fall back to
        # the endstream delimiter (always present; data is binary-safe
        # because Flate output virtually never contains the keyword)
        j = b.index(b"endstream", i)
        raw = b[i:j].rstrip(b"\r\n")
    filt = d.get("/Filter")
    if filt in (None, []):
        data = raw
    else:
        # predictors are handled below from /DecodeParms — pass none here
        data = _apply_filters(raw, filt)
    w = d.get("/W")
    size = d.get("/Size")
    if not (isinstance(w, list) and len(w) == 3 and all(isinstance(x, int) for x in w)):
        raise ValueError("xref stream /W missing or malformed")
    if not isinstance(size, int):
        raise ValueError("xref stream /Size missing")
    parms = d.get("/DecodeParms")
    if isinstance(parms, list):
        parms = parms[0] if parms else {}
    if isinstance(parms, dict) and parms.get("/Predictor", 1) != 1:
        data = _png_unpredict(
            data,
            int(parms.get("/Columns", sum(w))),
            int(parms["/Predictor"]),
            max(1, int(parms.get("/Colors", 1)) * int(parms.get("/BitsPerComponent", 8)) // 8),
        )
    index = d.get("/Index", [0, size])
    if not (isinstance(index, list) and len(index) % 2 == 0):
        raise ValueError("xref stream /Index malformed")
    ew = sum(w)
    p = 0

    def field(width: int, default: int) -> int:
        nonlocal p
        if width == 0:
            return default
        v = int.from_bytes(data[p : p + width], "big")
        p += width
        return v

    for s in range(0, len(index), 2):
        start, count = index[s], index[s + 1]
        for n in range(start, start + count):
            if p + ew > len(data):
                raise ValueError("xref stream shorter than /Index declares")
            t = field(w[0], 1)
            f2 = field(w[1], 0)
            f3 = field(w[2], 0)
            if n in offsets or n in compressed:
                continue  # newest wins
            if t == 1:
                offsets[n] = f2
            elif t == 2:
                compressed[n] = (f2, f3)
    return d


def _parse_xref(b: bytes):
    """Cross-reference parse: classic xref table(s) AND 1.5+ xref
    STREAMS, merged across the /Prev chain (newest wins) including hybrid
    files whose classic trailer carries /XRefStm. Returns (offsets,
    compressed, trailer): ``offsets`` maps object number → byte offset,
    ``compressed`` maps object number → (object-stream number, index)."""
    tail = b[-2048:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if m is None:
        raise ValueError("PDF has no startxref")
    offsets: dict[int, int] = {}
    compressed: dict[int, tuple[int, int]] = {}
    trailer: dict = {}
    seen = set()
    pos = int(m.group(1))
    while pos not in seen:
        seen.add(pos)
        lx = _Lexer(b, pos)
        save = lx.i
        first = lx.read_token()
        if first != b"xref":
            # PDF 1.5+ cross-reference stream: "n g obj << /Type /XRef ..."
            lx.i = save
            t = _parse_xref_stream_at(b, pos, offsets, compressed)
        else:
            while True:
                tok = lx.read_token()
                if tok == b"trailer":
                    break
                start = int(tok)
                count = int(lx.read_token())
                for k in range(count):
                    off = int(lx.read_token())
                    lx.read_token()  # generation
                    kind = lx.read_token()
                    n = start + k
                    if kind == b"n" and n not in offsets and n not in compressed:
                        offsets[n] = off
            t = lx.read_object()
            if not isinstance(t, dict):
                raise ValueError("malformed PDF trailer")
            if "/XRefStm" in t and isinstance(t["/XRefStm"], int):
                # hybrid-reference file (§7.5.8.4): the classic section's
                # companion stream carries the compressed-object entries
                xpos = t["/XRefStm"]
                if xpos not in seen:
                    seen.add(xpos)
                    _parse_xref_stream_at(b, xpos, offsets, compressed)
        for k, v in t.items():
            trailer.setdefault(k, v)
        if "/Prev" in t and isinstance(t["/Prev"], int):
            pos = t["/Prev"]
        else:
            break
    return offsets, compressed, trailer


class _Doc:
    def __init__(self, b: bytes):
        if not b.startswith(b"%PDF-"):
            raise ValueError("not a PDF signature")
        self.b = b
        self.offsets, self.compressed, self.trailer = _parse_xref(b)
        if "/Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDF")
        self._cache: dict[int, object] = {}

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get_object(v.num)
        return v

    def _get_from_objstm(self, num: int, stm_num: int, idx: int):
        """Object living inside a /Type /ObjStm object stream
        (ISO 32000 §7.5.7): header of N (objnum, offset) pairs, then the
        bodies starting at /First. Compressed objects are plain objects —
        never streams — so one read_object suffices."""
        if stm_num == num:
            raise ValueError("PDF object stream contains itself")
        stm = self.get_object(stm_num)
        if not (isinstance(stm, dict) and "data" in stm):
            raise ValueError(f"PDF object stream {stm_num} is not a stream")
        sd = stm["dict"]
        if sd.get("/Type") != "/ObjStm":
            raise ValueError(f"PDF object {stm_num} is not /Type /ObjStm")
        n = self.resolve(sd.get("/N"))
        first = self.resolve(sd.get("/First"))
        if not isinstance(n, int) or not isinstance(first, int):
            raise ValueError("PDF object stream /N or /First missing")
        data = stm["data"]
        hlx = _Lexer(data)
        pairs = [(int(hlx.read_token()), int(hlx.read_token())) for _ in range(n)]
        if not (0 <= idx < n) or pairs[idx][0] != num:
            # tolerate a stale index field: locate by object number
            hits = [off for onum, off in pairs if onum == num]
            if not hits:
                raise ValueError(f"PDF object {num} not in object stream {stm_num}")
            off = hits[0]
        else:
            off = pairs[idx][1]
        return _Lexer(data, first + off).read_object()

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self.compressed:
            val = self._get_from_objstm(num, *self.compressed[num])
            self._cache[num] = val
            return val
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"PDF object {num} not in xref")
        lx = _Lexer(self.b, off)
        if int(lx.read_token()) != num:
            raise ValueError("xref offset does not match object number")
        lx.read_token()  # generation
        if lx.read_token() != b"obj":
            raise ValueError("malformed PDF object header")
        val = lx.read_object()
        # stream?
        save = lx.i
        tok = None
        try:
            tok = lx.read_token()
        except ValueError:
            pass
        if tok == b"stream":
            if not isinstance(val, dict):
                raise ValueError("PDF stream without a dictionary")
            i = lx.i
            # exactly CRLF or LF after the 'stream' keyword
            if self.b[i : i + 2] == b"\r\n":
                i += 2
            elif self.b[i : i + 1] == b"\n":
                i += 1
            length = self.resolve(val.get("/Length"))
            if not isinstance(length, int):
                raise ValueError("PDF stream /Length missing")
            raw = self.b[i : i + length]
            filt = self.resolve(val.get("/Filter"))
            if filt in (None, []):
                data = raw
            else:
                data = _apply_filters(
                    raw, filt, self.resolve(val.get("/DecodeParms"))
                )
            val = {"dict": val, "data": data}
        else:
            lx.i = save
        self._cache[num] = val
        return val


def _page_content_text(doc: _Doc, page: dict) -> str:
    contents = doc.resolve(page.get("/Contents"))
    if contents is None:
        return ""
    streams = contents if isinstance(contents, list) else [contents]
    data = b"".join(
        doc.resolve(s)["data"] if isinstance(doc.resolve(s), dict) and "data" in doc.resolve(s)
        else b""
        for s in streams
    )
    lx = _Lexer(data)
    out: list[bytes] = []
    stack: list = []
    while lx.i < len(data):
        lx._skip_ws()
        if lx.i >= len(data):
            break
        try:
            obj = lx.read_object()
        except ValueError as e:
            # module contract: structurally broken files raise, they don't
            # silently yield partial text (an unterminated string or stray
            # binary in a content stream is truncation-grade damage)
            raise ValueError(f"malformed PDF content stream: {e}") from e
        # plain bytes (not _Str) = an operator keyword; everything else
        # is an operand
        if isinstance(obj, bytes) and not isinstance(obj, _Str):
            if obj in (b"Tj", b"'", b'"'):
                for v in reversed(stack):
                    if isinstance(v, _Str):
                        out.append(bytes(v))
                        break
            elif obj == b"TJ":
                for v in reversed(stack):
                    if isinstance(v, list):
                        out.extend(bytes(x) for x in v if isinstance(x, _Str))
                        break
            stack.clear()  # every operator consumes its operand list
        else:
            stack.append(obj)
    return b"".join(out).decode("utf-8", errors="replace")


def _walk_pages(doc: _Doc, node: dict, acc: list) -> None:
    t = doc.resolve(node.get("/Type"))
    if t == "/Pages":
        for kid in doc.resolve(node.get("/Kids")) or []:
            _walk_pages(doc, doc.resolve(kid), acc)
    elif t == "/Page":
        acc.append(node)
    else:
        raise ValueError(f"unexpected page-tree node type {t}")


def extract_pdf_text(payload: bytes) -> dict:
    """Parse a PDF and return {n_pages, text, version} — text is the
    concatenated text-show strings per page, pages joined with \\n."""
    b = bytes(payload)
    doc = _Doc(b)
    root = doc.resolve(doc.trailer.get("/Root"))
    if not isinstance(root, dict):
        raise ValueError("PDF trailer /Root missing")
    pages_node = doc.resolve(root.get("/Pages"))
    if not isinstance(pages_node, dict):
        raise ValueError("PDF catalog /Pages missing")
    pages: list = []
    _walk_pages(doc, pages_node, pages)
    texts = [_page_content_text(doc, p) for p in pages]
    m = re.match(rb"%PDF-(\d+\.\d+)", b)
    return {
        "n_pages": len(pages),
        "text": "\n".join(texts),
        "version": m.group(1).decode("ascii") if m else "?",
    }


# --------------------------------------------------------------------------
# Synthesizer (round-trip attestation)
# --------------------------------------------------------------------------


def _esc_literal(s: bytes) -> bytes:
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_pdf(
    pages: list[str],
    xref_stream: bool = False,
    filter_mix: bool = False,
    filter_phase: int = 0,
) -> bytes:
    """A complete, valid PDF with one page per entry. Page text alternates
    the three text-show forms the spec allows — literal string ``(..) Tj``,
    hex string ``<..> Tj`` (byte-exact for any UTF-8 payload), and the
    ``TJ`` array with kerning numbers — so a round-trip exercises the
    extractor's whole operator surface.

    ``xref_stream=False`` (default): PDF 1.4, classic xref table.
    ``xref_stream=True``: PDF 1.5 — the catalog/pages/font/page objects
    are packed into a ``/Type /ObjStm`` object stream and the
    cross-reference is a ``/Type /XRef`` STREAM (W=[1 4 2], FlateDecode,
    PNG Up predictor 12 — the layout real-world writers emit), so the
    extractor's 1.5+ path is attested against the same ground truth.

    ``filter_mix=True`` rotates the content-stream encoding through the
    five text-capable ISO 32000 filters — FlateDecode, ASCIIHexDecode,
    the [/ASCII85Decode /FlateDecode] CHAIN, RunLengthDecode and
    LZWDecode — so a round-trip attests the whole filter surface."""
    objs: list[bytes] = []  # 1-based object bodies, in object-number order

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font,
    # 4..3+n page objects, 4+n..3+2n content streams
    kids = b" ".join(b"%d 0 R" % (4 + i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [ %s ] /Count %d >>" % (kids, n_pages)
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i in range(n_pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % (4 + n_pages + i)
        )
    for i, text in enumerate(pages):
        raw = text.encode("utf-8")
        if i % 3 == 0:
            show = b"(" + _esc_literal(raw) + b") Tj"
        elif i % 3 == 1:
            show = b"<" + raw.hex().encode("ascii") + b"> Tj"
        else:  # TJ array: split roughly in half with a kerning number
            h = max(1, len(raw) // 2)
            # split on a UTF-8 boundary
            while h < len(raw) and (raw[h] & 0xC0) == 0x80:
                h += 1
            show = (
                b"[ ("
                + _esc_literal(raw[:h])
                + b") -250 <"
                + raw[h:].hex().encode("ascii")
                + b"> ] TJ"
            )
        content = b"BT /F1 12 Tf 72 720 Td " + show + b" ET"
        fidx = (i + filter_phase) % 5
        if not filter_mix or fidx == 0:
            comp, fdecl = zlib.compress(content), b"/Filter /FlateDecode"
        elif fidx == 1:
            comp = content.hex().encode("ascii") + b">"
            fdecl = b"/Filter /ASCIIHexDecode"
        elif fidx == 2:
            import base64

            comp = base64.a85encode(zlib.compress(content)) + b"~>"
            fdecl = b"/Filter [ /ASCII85Decode /FlateDecode ]"
        elif fidx == 3:
            comp, fdecl = _rle_encode(content), b"/Filter /RunLengthDecode"
        else:
            comp, fdecl = _lzw_encode(content), b"/Filter /LZWDecode"
        objs.append(
            b"<< /Length %d %s >>\nstream\n" % (len(comp), fdecl)
            + comp
            + b"\nendstream"
        )

    if not xref_stream:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]  # object 0 is the free head
        for num, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
        xref_pos = len(out)
        out += b"xref\n0 %d\n" % (len(objs) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos)
        )
        return bytes(out)

    # --- PDF 1.5 tail: /ObjStm for the non-stream objects + /Type /XRef ---
    n_nonstream = 3 + n_pages  # catalog, pages, font, page dicts
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    byte_off: dict[int, int] = {}
    # content streams stay top-level (streams cannot live in an ObjStm)
    for j in range(n_nonstream, len(objs)):
        byte_off[j + 1] = len(out)
        out += b"%d 0 obj\n" % (j + 1) + objs[j] + b"\nendobj\n"
    header = bytearray()
    bodies = bytearray()
    for j in range(n_nonstream):
        header += b"%d %d " % (j + 1, len(bodies))
        bodies += objs[j] + b" "
    stm = bytes(header) + bytes(bodies)
    comp = zlib.compress(stm)
    objstm_num = len(objs) + 1
    xref_num = len(objs) + 2
    byte_off[objstm_num] = len(out)
    out += (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n" % (objstm_num, n_nonstream, len(header), len(comp))
        + comp
        + b"\nendstream\nendobj\n"
    )
    xref_pos = len(out)
    byte_off[xref_num] = xref_pos
    size = xref_num + 1
    rows = []
    for n in range(size):
        if n == 0:
            rows.append((0, 0, 65535))
        elif n <= n_nonstream:
            rows.append((2, objstm_num, n - 1))  # in the ObjStm, index n-1
        else:
            rows.append((1, byte_off[n], 0))
    # W = [1 4 2], PNG Up predictor (12) — the shape real writers emit
    prev = bytes(7)
    pred = bytearray()
    for t, f2, f3 in rows:
        raw = bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        pred.append(2)
        pred += bytes((raw[i] - prev[i]) & 0xFF for i in range(7))
        prev = raw
    xcomp = zlib.compress(bytes(pred))
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b"/Length %d >>\nstream\n" % (xref_num, size, len(xcomp))
        + xcomp
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
