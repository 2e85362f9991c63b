"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query at sf0.01 in Spark AND its oracle SQL in DuckDB,
compare row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [--sf-dir DIR] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[str, list[str]]:
    """Order-insensitive canonical hash: sort columns by name, stringify
    (floats via repr of float64), sort rows, md5."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        else:
            df[c] = df[c].map(lambda v: repr(v) if pd.notna(v) else "NULL")
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False))
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return h, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from document_ai_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]",
                      shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{args.sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        if not problems:
            hs, rs = canon(sdf)
            ho, ro = canon(odf)
            if hs != ho:
                diff = [
                    (a, b) for a, b in zip(rs, ro) if a != b
                ][:3]
                problems.append(f"valuehash; first diffs: {diff}")
        # dtype advisory (driver may or may not check)
        dt = {
            c: (str(sdf[c].dtype), str(odf[c].dtype))
            for c in sdf.columns
            if c in odf.columns and str(sdf[c].dtype) != str(odf[c].dtype)
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            extra = f" dtypes~{dt}" if dt else ""
            print(f"OK    {name}: {len(sdf)} rows "
                  f"[{time.time()-t0:.1f}s]{extra}")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
