"""Output layout: size-targeted file counts and range layouts whose
parquet footers prove data skipping is possible."""

import glob
import os

import pyarrow.parquet as pq

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.sources.layout import sized_partitions, write_range_layout, write_sized


def parquet_files(path):
    return sorted(glob.glob(os.path.join(path, "part-*.parquet")))


def test_write_sized_controls_file_count(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    small_target = str(tmp_path / "many")
    big_target = str(tmp_path / "one")
    n_small = write_sized(e, small_target, target_file_bytes=2 * 1024)
    n_big = write_sized(e, big_target, target_file_bytes=10 * 1024 * 1024 * 1024)
    assert n_small == len(parquet_files(small_target)) > 1
    assert n_big == len(parquet_files(big_target)) == 1
    # same rows either way
    assert (
        spark.read.parquet(small_target).count()
        == spark.read.parquet(big_target).count()
        == e.count()
    )


def test_sized_partitions_scales_with_target(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert sized_partitions(e, 1024) > sized_partitions(e, 1024 * 1024 * 1024)


def test_range_layout_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "ranged")
    write_range_layout(e, path, "user_id", num_files=4)
    ranges = []
    for f in parquet_files(path):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["user_id"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint key ranges → file-level skipping works
