#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every query in __spark_entry__.queries() on Spark AND its oracle_sql()
on DuckDB over the same parquet tables, then compares row count, schema
(loosely: both frames canonicalized to int64/float64/naive-datetime), and
order-insensitive values (exact match after canonicalization).

Usage: python selfcheck.py [sf_dir] [query ...]
       python selfcheck.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a CORRECTNESS-style artifact covering
EVERY query run (the driver's recorded gate samples a 50-query prefix;
this file is the full-surface record — commit it per round so the whole
registry has an attested result, not just the sampled window).
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_integer_dtype(s):
            df[col] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[col] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            dt = s.dt.tz_convert("UTC").dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            df[col] = dt.astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.map(_canon_cell)
    return df


def _canon_cell(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, float):
        return None if np.isnan(v) else v
    if isinstance(v, (np.integer,)):
        return int(v)
    return v


def row_multiset(df: pd.DataFrame) -> list[tuple]:
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            problems.append(f"dtype[{col}]: spark={a[col].dtype} duck={b[col].dtype}")
    if not problems:
        ra, rb = row_multiset(a), row_multiset(b)
        if ra != rb:
            diff_idx = next((i for i, (x, y) in enumerate(zip(ra, rb)) if x != y), None)
            problems.append(
                f"values differ (first diff at sorted row {diff_idx}):\n"
                f"  spark: {ra[diff_idx] if diff_idx is not None else '...'}\n"
                f"  duck : {rb[diff_idx] if diff_idx is not None else '...'}"
            )
    return problems


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    record: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from ingest_fast_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            frame = fn(spark, sf_dir)
            # The driver's canonicalizer sort_values-hashes every cell and
            # DIES on array/map/struct cells (unhashable numpy arrays).
            # Round 4 proved the two harnesses can drift when this replica
            # is more lenient (it used to tuple-ify arrays and report "ok"
            # for queries the driver errored on) — so reject complex
            # output columns outright: registered queries must project to
            # scalar columns (array_join / explode) before returning.
            bad = [
                f"{fld.name}:{fld.dataType.simpleString()}"
                for fld in frame.schema.fields
                if fld.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                failed.append(name)
                record[name] = {
                    "status": "fail",
                    "err": f"complex-typed output columns {bad}: the driver "
                    "canonicalizer cannot hash these — flatten to scalars",
                }
                print(f"FAIL {name}: complex-typed output columns {bad}")
                continue
            sdf = frame.toPandas()
        except Exception as e:
            failed.append(name)
            record[name] = {"status": "fail", "err": f"spark: {e}"[:500]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            rows_only.append(name)
            record[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            failed.append(name)
            record[name] = {"status": "fail", "err": f"duckdb: {e}"[:500]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            record[name] = {
                "status": "fail",
                "spark_rows": len(sdf),
                "oracle_rows": len(ddf),
                "err": "; ".join(problems)[:500],
            }
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            passed.append(name)
            record[name] = {
                "status": "ok",
                "spark_rows": len(sdf),
                "oracle_rows": len(ddf),
            }
            print(f"OK   {name} ({len(sdf)} rows)")

    print(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    if failed:
        print("failed:", " ".join(failed))
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_ok": len(passed),
            "n_rows_only": len(rows_only),
            "n_failed": len(failed),
            "queries": record,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
