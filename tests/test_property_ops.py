"""Property-based tests: pack_sequences and merge_upsert vs pure-Python
reference implementations on random inputs (SURVEY.md §5 item 4 applied
to the curation operators)."""

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
