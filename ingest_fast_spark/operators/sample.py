"""Reproducible sampling for training-data pipelines.

`df.sample()` is seed-stable only for a fixed partitioning — repartition
the input and the sample changes. These samplers hash ROW CONTENT
(xxhash64 of a key column + seed), so membership is a pure function of
the data: stable across partitioning, cluster size, and engine restarts,
and expressible as a plain filter (pushes down, no shuffle, no RNG
state). This is how a 100 TB pipeline pins its eval/holdout split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Uniform bucket in [0, 1M) from content hash — pmod keeps it
    non-negative."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BUCKETS))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by hash(key, seed).
    Disjoint seeds give independent samples; (key, seed, fraction) fully
    reproduces the subset anywhere."""
    return df.filter(hash_bucket(F.col(key), seed) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    fraction (e.g. downsample web text, keep all books). Unlisted strata
    are dropped — the explicit-allowlist convention of `sampleBy`."""
    bucket = hash_bucket(F.col(key), seed)
    cond = F.lit(False)
    for value, frac in fractions.items():
        cond = cond | (
            (F.col(strata_col) == value) & (bucket < int(frac * _BUCKETS))
        )
    return df.filter(cond)


def train_holdout_split(
    df: DataFrame, key: str, holdout_fraction: float = 0.01, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, holdout) split on the same hash — a row
    is in exactly one side for any partitioning of the input."""
    cut = int(holdout_fraction * _BUCKETS)
    bucket = hash_bucket(F.col(key), seed)
    return df.filter(bucket >= cut), df.filter(bucket < cut)
