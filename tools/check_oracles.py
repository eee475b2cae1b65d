#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df_pandas):
    """Sort columns by name, canonicalize values, sort rows — the same
    order-insensitive shape the driver hashes."""
    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            # exact repr: stricter than any hash of formatted values, so a
            # PASS here implies a PASS under the driver's hash
            return repr(v)
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from xdump_spark.session import get_spark

    spark = get_spark("check_oracles", cpus=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata ships single files `{t}.parquet`; Spark-written
        # datasets (e.g. the sf1 soak) are DIRECTORIES of part files.
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    names = args.names or list(qs)
    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL  {name}: values differ at sorted row {diff}:")
            print(f"      spark:  {srows[diff]}")
            print(f"      duckdb: {orows[diff]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
