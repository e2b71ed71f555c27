"""Deterministic N× scale-up of a driver testdata directory.

The driver provides sf0.001/0.01/0.1 only; VERDICT r2 asked for one
larger-SF bench point to expose super-linear constants in the expensive
operators. This tool materializes an sf(0.1×MULT) directory from sf0.1
WITHOUT touching /root/testdata: each table is MULT offset copies, with
per-copy transforms chosen so workload DENSITY stays constant (the honest
scale-up — a naive union of identical copies would make every document 10×
duplicated and inflate near-dup pair counts ~MULT² instead of ~MULT):

  * documents  — doc_id offset; every token prefixed with a copy tag
                 (``c{i}``), so shingle/minhash/simhash structure within a
                 copy is preserved exactly while copies never collide;
                 copy 0 is the original corpus verbatim.
  * embeddings — vec_id offset; copy-dependent random ±1 sign flip per
                 dimension (an isometry: within-copy cosines are EXACTLY
                 preserved, cross-copy similarities are scrambled).
                 CAVEAT: at 64 dims, independent unit vectors collide at
                 cos>=0.4 with p~7e-4 (the random-cosine floor), which is
                 HIGHER than the driver generator's true cross-pair rate —
                 so scaled pair-emitting embedding queries overstate output
                 density by ~2-3x; bench.py keeps embedding-pair queries
                 out of its scale section for that reason.
  * lineitem / orders — order keys offset (join keys stay consistent);
                 dimension keys (custkey etc.) untouched so dim joins and
                 group cardinalities scale the TPC-H way.
  * events     — event/user ids offset: 10× users, same per-user history.
  * region nation customer supplier part — copied once (dimensions).

Everything is pure DataFrame ops writing parquet; generation at MULT=10
from sf0.1 is ~6M lineitem rows / 50k docs / 1M events.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIMS = ["region", "nation", "customer", "supplier", "part"]
KEY_OFFSET = 10_000_000


def _copies(df, mult: int, transform):
    out = None
    for i in range(mult):
        c = transform(df, i)
        out = c if out is None else out.unionByName(c)
    return out


def make_scaled(
    spark: SparkSession, src: str, dst: str, mult: int = 10, force: bool = False
) -> bool:
    """Materialize ``dst`` as a ``mult``× scale-up of ``src``. Reuses an
    existing directory whose manifest matches (src, mult). Returns True if
    data was (re)generated, False if reused."""
    manifest_path = os.path.join(dst, "_scale_manifest.json")
    want = {"src": src, "mult": mult, "version": 1}
    if not force and os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                if json.load(f) == want:
                    return False
        except (OSError, json.JSONDecodeError):
            pass

    os.makedirs(dst, exist_ok=True)
    rd = lambda t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))  # noqa: E731
    wr = lambda df, t: df.write.mode("overwrite").parquet(  # noqa: E731
        os.path.join(dst, f"{t}.parquet")
    )

    for t in DIMS:
        wr(rd(t), t)

    def doc_copy(df, i):
        if i == 0:
            return df
        # Prefix every token with the copy tag: within-copy token/shingle
        # structure (hence all dedup pair structure) is preserved exactly;
        # copies share no shingles at k>=1.
        text = F.regexp_replace("text", r"(\S+)", f"c{i}$1")
        return df.select(
            (F.col("doc_id") + i * KEY_OFFSET).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )

    wr(_copies(rd("documents"), mult, doc_copy), "documents")

    import numpy as np

    emb_src = rd("embeddings")
    first = emb_src.filter(F.col("embedding").isNotNull()).select(
        F.size("embedding").alias("n")
    ).first()
    dim = int(first["n"]) if first else 0

    def emb_copy(df, i):
        if i == 0 or dim == 0:
            return df
        # Per-copy i.i.d. random ±1 per dimension (seeded, driver-side
        # literal array) — an isometry: within-copy cosines are EXACTLY
        # preserved; the relative flip between any two copies hits ~50% of
        # dims, so cross-copy cosines of even identical source vectors
        # concentrate around 0 (a structured bit-pattern flip measured
        # 20× pair inflation here; true random signs measure ~mult×).
        signs = np.where(
            np.random.RandomState(1_000 + i).randint(0, 2, dim) == 1, -1.0, 1.0
        )
        sarr = F.array(*[F.lit(float(s)) for s in signs])
        flipped = F.zip_with(
            "embedding", sarr, lambda x, y: (x.cast("double") * y).cast("float")
        )
        return df.select(
            (F.col("vec_id") + i * KEY_OFFSET).alias("vec_id"),
            flipped.alias("embedding"),
            "label",
        )

    wr(_copies(emb_src, mult, emb_copy), "embeddings")

    def order_copy(df, i):
        return df.withColumn("o_orderkey", F.col("o_orderkey") + i * KEY_OFFSET)

    def line_copy(df, i):
        return df.withColumn("l_orderkey", F.col("l_orderkey") + i * KEY_OFFSET)

    wr(_copies(rd("orders"), mult, order_copy), "orders")
    wr(_copies(rd("lineitem"), mult, line_copy), "lineitem")

    def event_copy(df, i):
        return df.withColumn(
            "event_id", F.col("event_id") + i * KEY_OFFSET
        ).withColumn("user_id", F.col("user_id") + i * 1_000_000)

    wr(_copies(rd("events"), mult, event_copy), "events")

    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return True
