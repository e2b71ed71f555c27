"""Medium-scale NT ingest: a generated 120k-line corpus through the real
file path (read_nt → fused pipeline), verifying aggregate invariants that
are computable without materializing the corpus in Python."""

import os

from pyspark.sql import functions as F

from ingest_fast_spark import jobs


def test_nt_ingest_120k_lines(spark, tmp_path):
    n_ids = 10_000
    lines = []
    for i in range(n_ids):
        fast = f"http://id.worldcat.org/fast/{i + 1}"
        lines.append(
            f'<{fast}> <http://www.w3.org/2004/02/skos/core#prefLabel> "Term {i + 1}" .'
        )
        lines.append(
            f'<{fast}> <http://www.w3.org/2004/02/skos/core#altLabel> "Alias A{i % 97}" .'
        )
        lines.append(
            f"<{fast}> <http://schema.org/sameAs> "
            f"<http://id.loc.gov/authorities/names/n{i % 500}> ."
        )
        if i % 10 == 0:
            lines.append("malformed line that should be dropped")
    for j in range(500):
        lines.append(
            f"<http://id.loc.gov/authorities/names/n{j}> "
            f'<http://www.w3.org/2000/01/rdf-schema#label> "LC Label {j}" .'
        )
    src = tmp_path / "FASTTopical.nt"
    src.write_text("\n".join(lines))

    out_dir = str(tmp_path / "out")
    metrics = jobs.run_ingest(spark, str(tmp_path), out_dir)
    assert metrics["n_fast_docs"] == n_ids

    fast = spark.read.parquet(os.path.join(out_dir, "fast"))
    assert fast.count() == n_ids
    row = fast.filter(F.col("_id") == 1).collect()[0]
    assert row["prefLabel"] == "Term 1"
    # altLabel = own alias + the enrichment hit from the LC label index
    assert row["altLabel"] == ["Alias A0", "LC Label 0"]
    assert row["sameAsLc"] == [
        "http://id.loc.gov/authorities/names/n0", "n0",
    ]
    # every doc got its sameAs enrichment (all 500 LC URIs have labels)
    n_enriched = fast.filter(F.size("altLabel") >= 2).count()
    assert n_enriched == n_ids
