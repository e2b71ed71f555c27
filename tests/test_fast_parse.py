"""The reference's 9 parser goldens (reference test/fast_parse.test.js:8-80),
ported verbatim — run both through the pure-Python twin and through the
distributed Column-expression path; the two must agree.
"""

import pytest

from ingest_fast_spark.operators import fast_pipeline as fp
from ingest_fast_spark.sources.nt import parse_nt_lines, triple_to_obj_py

GOLDENS = [
    # (nt line, expected record or '')
    ("Not a triple text", ""),
    (
        "<http://id.worldcat.org/fast/799409> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://schema.org/Intangible> .",
        {"type": "fast", "id": 799409},
    ),
    (
        '<http://id.worldcat.org/fast/799409> <http://purl.org/dc/terms/identifier> "799409" .',
        {"type": "fast", "id": 799409},
    ),
    (
        "<http://id.worldcat.org/fast/1408092> <http://schema.org/sameAs> <http://viaf.org/viaf/143214773> .",
        {"type": "fast", "id": 1408092, "sameAsViaf": "http://viaf.org/viaf/143214773"},
    ),
    (
        "<http://id.worldcat.org/fast/1794112> <http://schema.org/sameAs> <http://id.loc.gov/authorities/names/no2008059410> .",
        {"type": "fast", "id": 1794112, "sameAsLc": "http://id.loc.gov/authorities/names/no2008059410"},
    ),
    (
        "<http://id.worldcat.org/fast/825323> <http://schema.org/sameAs> <http://id.loc.gov/authorities/subjects/sh85010894> .",
        {"type": "fast", "id": 825323, "sameAsLc": "http://id.loc.gov/authorities/subjects/sh85010894"},
    ),
    (
        '<http://id.worldcat.org/fast/1407208> <http://www.w3.org/2004/02/skos/core#prefLabel> "Regional Farm Policy Conference" .',
        {
            "type": "fast",
            "id": 1407208,
            "prefLabel": "Regional Farm Policy Conference",
            "normalized": "regional farm policy conference",
        },
    ),
    (
        '<http://id.worldcat.org/fast/1410700> <http://www.w3.org/2004/02/skos/core#altLabel> "Fiesta San Antonio (San Antonio, Tex.)" .',
        {
            "type": "fast",
            "id": 1410700,
            "altLabel": "Fiesta San Antonio (San Antonio, Tex.)",
            "normalized": "fiesta san antonio san antonio tex",
        },
    ),
    (
        '<http://id.worldcat.org/fast/1410700> <http://www.w3.org/2000/01/rdf-schema#label> "Carlsbad International Chess Tournament" .',
        {
            "type": "fast",
            "id": 1410700,
            "label": "Carlsbad International Chess Tournament",
            "normalized": "carlsbad international chess tournament",
        },
    ),
    (
        '<http://id.loc.gov/authorities/names/fst01715782> <http://www.w3.org/2000/01/rdf-schema#label> "Aviation insurance--War risks--Law and legislation" .',
        {
            "type": "sameAsLabel",
            "subject": "http://id.loc.gov/authorities/names/fst01715782",
            "label": "Aviation insurance--War risks--Law and legislation",
        },
    ),
]


@pytest.mark.parametrize("line,expected", GOLDENS)
def test_golden_python_twin(line, expected):
    got = triple_to_obj_py(line)
    if expected == "":
        assert got == ""
        return
    for key, value in expected.items():
        assert got[key] == value, f"{key}: {got.get(key)!r} != {value!r}"


def test_goldens_dataframe_path(spark):
    """Same goldens through the distributed parse: every expected field must
    appear in the parsed DataFrame row for its line."""
    lines = [(i, line) for i, (line, _) in enumerate(GOLDENS)]
    df = spark.createDataFrame(lines, "line_no int, value string")
    parsed = fp.filter_triples(parse_nt_lines(df)).collect()

    # line 0 is unparseable -> contributes no row
    assert all(r is not None for r in parsed)

    def rows_matching(**kw):
        return [
            r
            for r in parsed
            if all(getattr(r, k) == v for k, v in kw.items())
        ]

    assert rows_matching(rec_type="fast", id=799409)
    assert rows_matching(rec_type="fast", id=1408092, sameAsViaf="http://viaf.org/viaf/143214773")
    assert rows_matching(rec_type="fast", id=1794112, sameAsLc="http://id.loc.gov/authorities/names/no2008059410")
    assert rows_matching(rec_type="fast", id=825323, sameAsLc="http://id.loc.gov/authorities/subjects/sh85010894")
    assert rows_matching(
        rec_type="fast",
        id=1407208,
        prefLabel="Regional Farm Policy Conference",
        normalized="regional farm policy conference",
    )
    assert rows_matching(
        rec_type="fast",
        id=1410700,
        altLabel="Fiesta San Antonio (San Antonio, Tex.)",
        normalized="fiesta san antonio san antonio tex",
    )
    assert rows_matching(
        rec_type="fast",
        id=1410700,
        label="Carlsbad International Chess Tournament",
        normalized="carlsbad international chess tournament",
    )
    assert rows_matching(
        rec_type="sameAsLabel",
        subject="http://id.loc.gov/authorities/names/fst01715782",
        label="Aviation insurance--War risks--Law and legislation",
    )


def test_df_path_agrees_with_python_twin(spark):
    """Field-by-field agreement between the Column expressions and the
    pure-Python twin on every golden line."""
    parseable = [(line, exp) for line, exp in GOLDENS if exp != ""]
    df = spark.createDataFrame([(l,) for l, _ in parseable], "value string")
    rows = fp.filter_triples(parse_nt_lines(df)).collect()
    # 10 lines parse to 10 records (each golden line yields exactly one)
    assert len(rows) == len(parseable)
    for line, _ in parseable:
        twin = triple_to_obj_py(line)
        match = [
            r
            for r in rows
            if (r.id == twin.get("id") or (r.id is None and "id" not in twin))
            and r.rec_type == twin["type"]
            and (r.prefLabel == twin.get("prefLabel"))
            and (r.altLabel == twin.get("altLabel"))
            and (r.normalized == twin.get("normalized"))
        ]
        assert match, f"no DF row matches twin for line: {line}\ntwin={twin}"
