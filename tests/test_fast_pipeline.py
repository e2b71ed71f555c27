"""End-to-end FAST pipeline tests against an independent pure-Python oracle
implementing the deterministic semantics documented in
operators/fast_pipeline.py (derived from reference lib/ingest.js:242-295).
"""

import re

from pyspark.sql import functions as F

from ingest_fast_spark.functions.scalars import normalize_and_singularize_py
from ingest_fast_spark.operators import fast_pipeline as fp
from ingest_fast_spark.sources.nt import parse_nt_lines

PREF = "http://www.w3.org/2004/02/skos/core#prefLabel"
ALT = "http://www.w3.org/2004/02/skos/core#altLabel"
LBL = "http://www.w3.org/2000/01/rdf-schema#label"
SAME = "http://schema.org/sameAs"


def nt(s, p, o):
    obj = f"<{o}>" if o.startswith("http") else f'"{o}"'
    return f"<{s}> <{p}> {obj} ."


FAST = "http://id.worldcat.org/fast"
LC = "http://id.loc.gov/authorities/names"
VIAF = "http://viaf.org/viaf"

# Topical file: ids 1,2 (2 also appears in Geographic with extra data)
TOPICAL = [
    nt(f"{FAST}/1", PREF, "Apples and Pears"),
    nt(f"{FAST}/1", ALT, "Pommes (Fruit)"),
    nt(f"{FAST}/1", SAME, f"{LC}/n0001"),
    nt(f"{FAST}/1", LBL, "x"),  # dropped, length < 2
    nt(f"{FAST}/2", LBL, "Only A Label"),
    nt(f"{FAST}/NaN", PREF, "Bad Row"),
    nt(f"{LC}/n0001", LBL, "Apple Alias"),  # sameAsLabel feeding enrichment
    "not a triple",
]
GEOGRAPHIC = [
    nt(f"{FAST}/2", PREF, "Two Geo"),
    nt(f"{FAST}/2", ALT, "Zwei"),
    nt(f"{FAST}/3", PREF, "Three"),
]
# Event file: id 4 has a VIAF link -> excluded from fast table (P9);
# id 5 has none -> included.
EVENT = [
    nt(f"{FAST}/4", PREF, "Event With Viaf"),
    nt(f"{FAST}/4", SAME, f"{VIAF}/77"),
    nt(f"{FAST}/5", PREF, "Event Without Viaf"),
]
PERSONAL = [
    nt(f"{FAST}/6", PREF, "A Person"),
    nt(f"{FAST}/6", SAME, f"{LC}/p0001"),
    nt(f"{FAST}/7", PREF, "Viaf Person"),
    nt(f"{FAST}/7", SAME, f"{VIAF}/88"),
]

VIAF_TABLE = [
    # (_id, viaf, lcId, fast)
    ("v1", "77", None, [400]),
    ("v2", "88", "p9999", []),
    ("v3", "no-match", "p0001", [6]),  # already contains 6 -> stays [6]
    ("v4", "none", None, None),
]


def lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def triples_by_type(spark):
    return {
        "Topical": parse_nt_lines(lines_df(spark, TOPICAL)),
        "Geographic": parse_nt_lines(lines_df(spark, GEOGRAPHIC)),
        "Event": parse_nt_lines(lines_df(spark, EVENT)),
        "Personal": parse_nt_lines(lines_df(spark, PERSONAL)),
    }


def norm(s):
    return normalize_and_singularize_py(s)


def test_build_fast_table(spark):
    out = {r["_id"]: r.asDict() for r in fp.build_fast_table(triples_by_type(spark)).collect()}

    # id 1: pref label, alt label + sameAs-enriched alias, LC uri + segment
    d1 = out[1]
    assert d1["prefLabel"] == "Apples and Pears"
    assert d1["altLabel"] == sorted(["Pommes (Fruit)", "Apple Alias"])
    assert d1["sameAsLc"] == sorted([f"{LC}/n0001", "n0001"])
    assert d1["sameAsViaf"] == []
    assert d1["normalized"] == sorted(
        {norm("Apples and Pears"), norm("Pommes (Fruit)"), norm("Apple Alias")}
    )
    assert d1["type"] == "Topical"

    # id 2: merged across Topical (label only) and Geographic (pref + alt).
    d2 = out[2]
    assert d2["prefLabel"] == "Two Geo"  # max over {'Only A Label','Two Geo'}
    assert d2["altLabel"] == ["Zwei"]
    assert d2["type"] == "Geographic"  # longer record wins the type

    # id 4 excluded (Event with VIAF link), id 5 included
    assert 4 not in out
    assert out[5]["prefLabel"] == "Event Without Viaf"
    assert out[5]["type"] == "Event"

    # Personal (Agent file) records never reach the fast table
    assert 6 not in out and 7 not in out

    # NaN row dropped entirely
    assert all(k in (1, 2, 3, 5) for k in out)


def test_viaf_updates(spark):
    viaf = spark.createDataFrame(
        VIAF_TABLE, "_id string, viaf string, lcId string, fast array<bigint>"
    )
    out = {r["_id"]: r.asDict() for r in fp.build_viaf_updates(triples_by_type(spark), viaf).collect()}

    assert out["v1"]["fast"] == [4, 400]  # Event 4 linked via viaf=77
    assert out["v2"]["fast"] == [7]  # Personal 7 via viaf=88
    assert out["v3"]["fast"] == [6]  # Personal 6 via lcId, already present
    assert out["v4"]["fast"] == []  # untouched, null -> []
    assert len(out) == 4  # viaf table row count preserved


def test_merge_is_deterministic_under_union_order(spark):
    t = triples_by_type(spark)
    a = fp.build_fast_table(t).orderBy("_id").collect()
    b = fp.build_fast_table(dict(reversed(list(t.items())))).orderBy("_id").collect()
    assert a == b


def test_nan_and_malformed_never_survive(spark):
    parsed = fp.filter_triples(parse_nt_lines(lines_df(spark, TOPICAL)))
    assert parsed.filter(F.col("id").isNull() & (F.col("rec_type") == "fast")).count() == 0
    # short label dropped but the row still records the id (reference keeps
    # the {type:'fast', id} shell when the label is too short)
    shells = parsed.filter((F.col("id") == 1) & F.col("label").isNull() & F.col("prefLabel").isNull() & F.col("altLabel").isNull())
    assert shells.count() >= 1
