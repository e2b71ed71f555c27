"""Multimodal column-convention tests: binary payload schema, mapInPandas
batch behavior, decode stub, and payload-column pruning."""

import hashlib

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


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed (optional dep)")
def test_decode_images_real(spark):
    """With PIL available, decode_images returns true dimensions/format."""
    import io

    from PIL import Image

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(7, 5), "image/png", "{}"), (2, None, "image/png", "{}")],
        M.PAYLOAD_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in M.decode_images(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (7, 5)
    assert rows[1]["format"] == "PNG" and rows[1]["mode"] == "RGB"
    assert rows[2]["width"] is None  # missing media -> NULL features


@pytest.mark.skipif(_has_pil(), reason="PIL present; gate untestable")
def test_decode_images_without_pil_is_honest(spark):
    """Without PIL, decode_image falls through to the raising stub and the
    DataFrame operator fails with NotImplementedError — gated, not faked."""
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")
    df = spark.createDataFrame([(1, b"\x89PNG", "image/png", "{}")], M.PAYLOAD_SCHEMA)
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)) as ei:
        M.decode_images(df).collect()
    assert "NotImplementedError" in str(ei.value) or "decode_images requires PIL" in str(
        ei.value
    )


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
