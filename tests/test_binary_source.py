"""Binary-file source: whole-file rows with content-sniffed media types."""

import pytest

from ingest_fast_spark.sources.binary import read_binary_dir

FILES = {
    "a.png": bytes.fromhex("89504E470D0A1A0A") + b"fakepng",
    "b.jpg": bytes.fromhex("FFD8FFE0") + b"fakejpeg",
    "c.wav": b"RIFF\x24\x08\x00\x00WAVEfmt " + b"\x00" * 8,
    "d.webp": b"RIFF\x10\x00\x00\x00WEBPVP8 ",
    "e.mp3": b"ID3\x04\x00" + b"\x00" * 16,
    "f.bin": b"\x00\x01\x02\x03nothing",
}

EXPECTED = {
    "a.png": "image/png",
    "b.jpg": "image/jpeg",
    "c.wav": "audio/wav",
    "d.webp": "image/webp",
    "e.mp3": "audio/mpeg",
    "f.bin": "application/octet-stream",
}


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    for name, payload in FILES.items():
        (d / name).write_bytes(payload)
    return str(d)


def test_media_types_sniffed(spark, media_dir):
    rows = read_binary_dir(spark, media_dir).collect()
    got = {r["file_name"]: r["media_type"] for r in rows}
    assert got == EXPECTED


def test_content_and_length_roundtrip(spark, media_dir):
    rows = read_binary_dir(spark, media_dir).collect()
    by_name = {r["file_name"]: r for r in rows}
    for name, payload in FILES.items():
        assert bytes(by_name[name]["content"]) == payload
        assert by_name[name]["length"] == len(payload)


def test_glob_and_size_pruning(spark, media_dir):
    only_png = read_binary_dir(spark, media_dir, glob="*.png")
    assert [r["file_name"] for r in only_png.collect()] == ["a.png"]
    small = read_binary_dir(spark, media_dir, max_bytes=12)
    assert all(r["length"] <= 12 for r in small.collect())
    # the length predicate must prune at listing level, before content read
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "length" in plan


def test_ext_column(spark, media_dir):
    rows = read_binary_dir(spark, media_dir).collect()
    assert {r["ext"] for r in rows} == {"png", "jpg", "wav", "webp", "mp3", "bin"}
