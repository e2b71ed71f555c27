"""WARC (Web ARChive, ISO 28500) ingest with ZERO archive libraries —
the container web-scale training corpora actually ship in (Common Crawl
publishes everything as WARC): a pipeline that cannot open WARC cannot
even reach the HTML-extraction stage.

Parser (`parse_warc_records` / `extract_warc_records`): real ISO 28500
record framing — the ``WARC/1.x`` version line, CRLF header block
(``WARC-Type``, ``WARC-Target-URI``, ``Content-Length``), an exact
Content-Length payload block, and the mandatory CRLF CRLF record
separator. Both storage layouts are supported and dispatch on magic
bytes: plain concatenated records, and the per-record-gzip-member layout
Common Crawl uses (each record its own gzip member; members are inflated
sequentially with ``zlib`` — wbits=47 — and the concatenation re-framed).
``response`` records additionally split the HTTP message: status code
from the status line, body after the first blank line. Truncated or
malformed framing raises ValueError (honest failure, never partial
rows); NULL payloads yield a NULL-record row so missing media stays
visible as data.

Synthesizer (`make_warc`): a conformant writer for round-trip
attestation — any WARC reader can open its output.

Reference parity note: /root/reference is RDF/Mongo ETL with no archive
code; this module serves SURVEY.md §2.9 [EXT] source requirements.

Scale shape: ``extract_warc_records`` is map-only Arrow-batched
mapInPandas — no shuffle; memory rides one archive at a time.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

WARC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("rec_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("http_status", LongType()),
        StructField("content", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def _gunzip_members(raw: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the Common Crawl WARC
    layout: one member per record) into the plain byte stream."""
    out = bytearray()
    rest = raw
    while rest:
        d = zlib.decompressobj(47)
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC payload")
        rest = d.unused_data
    return bytes(out)


def parse_warc_records(payload: bytes) -> list[dict]:
    """Parse one WARC file (plain or per-record gzip) into a list of
    {rec_type, target_uri, http_status, content, n_bytes} dicts."""
    raw = bytes(payload)
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    if not raw.startswith(b"WARC/"):
        raise ValueError("not a WARC payload (missing WARC/ version line)")
    records = []
    i = 0
    while i < len(raw):
        if raw[i : i + 5] != b"WARC/":
            raise ValueError(f"WARC framing lost at byte {i}")
        hdr_end = raw.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = raw[i:hdr_end].split(b"\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "utf-8", errors="replace"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing a numeric Content-Length") from None
        body_at = hdr_end + 4
        if body_at + length > len(raw):
            raise ValueError("WARC record body truncated")
        block = raw[body_at : body_at + length]
        if raw[body_at + length : body_at + length + 4] != b"\r\n\r\n":
            raise ValueError("WARC record separator missing")
        rec_type = headers.get("warc-type", "")
        status = None
        content = block
        if rec_type == "response" and block[:5] == b"HTTP/":
            http_hdr_end = block.find(b"\r\n\r\n")
            if http_hdr_end < 0:
                raise ValueError("WARC response without an HTTP header block")
            status_line = block[: block.find(b"\r\n")].split(b" ")
            if len(status_line) >= 2 and status_line[1].isdigit():
                status = int(status_line[1])
            content = block[http_hdr_end + 4 :]
        try:
            text = content.decode("utf-8")
        except UnicodeDecodeError:
            text = None
        records.append(
            {
                "rec_type": rec_type,
                "target_uri": headers.get("warc-target-uri"),
                "http_status": status,
                "content": text,
                "n_bytes": len(content),
            }
        )
        i = body_at + length + 4
    return records


def extract_warc_records(df: DataFrame) -> DataFrame:
    """WARC-ingest operator: mapInPandas over binary payloads → one row
    per WARC record (doc_id, rec_type, target_uri, http_status, content,
    n_bytes). Map-only, Arrow-batched, no shuffle."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "rec_type", "target_uri",
                    "http_status", "content", "n_bytes",
                )
            }
            for i, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    out["doc_id"].append(i)
                    for k in ("rec_type", "target_uri", "http_status",
                              "content", "n_bytes"):
                        out[k].append(None)
                    continue
                for r in parse_warc_records(bytes(b)):
                    out["doc_id"].append(i)
                    for k in ("rec_type", "target_uri", "http_status",
                              "content", "n_bytes"):
                        out[k].append(r[k])
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, WARC_SCHEMA)


def make_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Conformant WARC writer for round-trip attestation. Each record
    dict: {rec_type, target_uri (optional), content (bytes or str),
    http_status (optional — wraps content in an HTTP/1.1 response)}.
    ``gzip_members=True`` emits the Common Crawl layout (one gzip member
    per record)."""
    out = bytearray()
    for n, r in enumerate(records):
        content = r["content"]
        if isinstance(content, str):
            content = content.encode("utf-8")
        if r.get("http_status") is not None:
            content = (
                b"HTTP/1.1 %d OK\r\nContent-Type: text/plain; charset=utf-8\r\n"
                b"Content-Length: %d\r\n\r\n" % (r["http_status"], len(content))
            ) + content
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r["rec_type"].encode("ascii"),
            b"WARC-Record-ID: <urn:uuid:%08d>" % n,
            b"WARC-Date: 2026-01-01T00:00:00Z",
        ]
        if r.get("target_uri"):
            headers.append(b"WARC-Target-URI: " + r["target_uri"].encode("ascii"))
        if r.get("http_status") is not None:
            headers.append(b"Content-Type: application/http; msgtype=response")
        headers.append(b"Content-Length: %d" % len(content))
        rec = b"\r\n".join(headers) + b"\r\n\r\n" + content + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)
