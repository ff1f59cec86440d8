"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, compares row count, column names/order-insensitive values
(sorted by all columns), and reports per-query PASS/FAIL.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from libpysal_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    a = spark_df[scols].sort_values(scols).reset_index(drop=True)
    b = duck_df[scols].sort_values(scols).reset_index(drop=True)
    if len(a) != len(b):
        return problems
    for c in scols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # BIT-EXACT float compare (VERDICT r5 #2): the driver hashes
            # values, so -0.0 vs +0.0 or 1-ulp drift must FAIL here too —
            # np.allclose treated -0.0 == 0.0 and let transform_c ship red.
            ab = av.astype(float).to_numpy().tobytes()
            bb = bv.astype(float).to_numpy().tobytes()
            ok = ab == bb
            mism = (
                av.astype(float).to_numpy().view(np.uint64)
                != bv.astype(float).to_numpy().view(np.uint64)
            )
        else:
            mism = (av.astype(object) != bv.astype(object)).to_numpy()
            ok = not mism.any()
        if not ok:
            idx = np.where(mism)[0][:3]
            problems.append(
                f"col {c}: {int(np.sum(mism))} mismatches, first rows {idx.tolist()} "
                f"spark={av.iloc[idx].tolist()} duck={bv.iloc[idx].tolist()}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    passed = failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failed += 1
            continue
        t1 = time.time()
        if name not in orc:
            print(f"WEAK {name}: no oracle, rows={len(sdf)} ({t1-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(orc[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed += 1
            continue
        t2 = time.time()
        problems = compare(sdf, ddf, name)
        if problems:
            print(f"FAIL {name}: rows={len(sdf)} ({t1-t0:.1f}s spark, {t2-t1:.1f}s duck)")
            for p in problems:
                print(f"   - {p}")
            failed += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} ({t1-t0:.1f}s spark, {t2-t1:.1f}s duck)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
