"""Empty-input robustness: every registered query must run (not crash)
over schema-identical, zero-row tables. At 100 TB empty inputs are
routine — a new partition, a filtered-out source, a fresh stream — and
an operator that throws on them (instead of returning its empty result)
kills the whole job. This sweep caught two real bugs: the GEMM
similarity paths fed numpy a 1-D matrix when the broadcast corpus was
empty (operators/similarity.py)."""

import os

import pytest


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.limit(0).repartition(1).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


def test_every_query_survives_empty_tables(spark, empty_dir):
    import __spark_entry__ as E

    failures = {}
    for name, fn in sorted(E.queries().items()):
        try:
            fn(spark, empty_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a failure report
            failures[name] = str(ex).splitlines()[0][:120]
    assert not failures, f"{len(failures)} queries crash on empty input: {failures}"
