"""Property-based tests: pack_sequences and merge_upsert vs pure-Python
reference implementations on random inputs (SURVEY.md §5 item 4 applied
to the curation operators)."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ingest_fast_spark.operators.merge import merge_upsert
from ingest_fast_spark.operators.pack import pack_sequences

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

doc_lens = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=25
)


def py_pack(lens, target):
    out, cum = {}, 0
    for doc_id, n in enumerate(lens):  # doc_id order == list order
        out[doc_id] = (cum // target, cum % target)
        cum += n
    return out


@given(doc_lens, st.integers(min_value=1, max_value=64))
@_settings
def test_pack_matches_reference(spark, lens, target):
    df = spark.createDataFrame(
        [(i, lens[i]) for i in range(len(lens))], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "n_tokens", "doc_id", target).collect()
    }
    assert got == py_pack(lens, target)


kv = st.dictionaries(
    st.integers(min_value=0, max_value=8),
    st.integers(min_value=-100, max_value=100),
    max_size=8,
)


def py_merge(target, updates):
    out = dict(target)
    out.update(updates)
    return out


@given(kv, kv)
@_settings
def test_merge_matches_reference(spark, target, updates):
    schema = "id bigint, v bigint"
    t = spark.createDataFrame(list(target.items()) or [], schema=schema)
    u = spark.createDataFrame(list(updates.items()) or [], schema=schema)
    got = {r["id"]: r["v"] for r in merge_upsert(t, u, ["id"]).collect()}
    assert got == py_merge(target, updates)


texts = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=120), min_size=1, max_size=8
)


def py_chunks(text, size=40, stride=30):
    # Mirrors Spark: split(trim(lower(text)), '\s+') — empty string -> [""]
    toks = re.split(r"\s+", text.strip().lower())
    return [
        (s + 1, toks[s : s + size]) for s in range(0, len(toks), stride)
    ]


@given(texts)
@_settings
def test_chunk_overlap_matches_reference(spark, docs):
    """text_chunk_overlap == a pure-Python sliding window: same start
    positions, same chunk contents, and stride-prefixes reconstruct the
    original token stream."""
    import os
    import tempfile

    from ingest_fast_spark.queries.llm import text_chunk_overlap

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = text_chunk_overlap(spark, d).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["start_pos"], r["chunk_text"].split(" ") if r["chunk_text"] else [""])
        )
    for doc_id, text in enumerate(docs):
        expect = py_chunks(text)
        chunks = sorted(got[doc_id])
        assert [(s, c) for s, c in chunks] == expect
        # Reconstruction: first `stride` tokens of each chunk + the full
        # final chunk == the original token stream.
        toks = []
        for i, (_, c) in enumerate(chunks):
            toks.extend(c if i == len(chunks) - 1 else c[:30])
        assert toks == re.split(r"\s+", text.strip().lower())
