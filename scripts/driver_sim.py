"""Simulate the driver's t2 correctness gate on a BARE SparkSession.

The real driver builds its own vanilla session (no streamz_spark
session factory), so this must too — round 1's only systemic failure
was a conf that existed solely in our factory.

Usage: python scripts/driver_sim.py [sf_dir] [only_prefix ...]
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("driver-sim-bare")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            if name not in osql:
                results[name] = ("rows-only", len(spdf), round(time.time() - t0, 1))
                continue
            odf = con.execute(osql[name]).df()
            cols = sorted(spdf.columns)
            ocols = sorted(odf.columns)
            if cols != ocols:
                results[name] = ("SCHEMA-MISMATCH", f"{cols} vs {ocols}", round(time.time() - t0, 1))
                continue
            a = spdf.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
            b = odf.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
            if len(a) != len(b):
                results[name] = ("ROWS-MISMATCH", f"{len(a)} vs {len(b)}", round(time.time() - t0, 1))
            elif a.equals(b):
                results[name] = ("EXACT", len(a), round(time.time() - t0, 1))
            else:
                bad = [c for c in cols if not a[c].equals(b[c])]
                results[name] = ("VALUE-MISMATCH", f"cols={bad} dtypes={[(str(a[c].dtype), str(b[c].dtype)) for c in bad]}", round(time.time() - t0, 1))
        except Exception:
            results[name] = ("ERROR", traceback.format_exc().splitlines()[-1], round(time.time() - t0, 1))
        print(f"{name}: {results[name]}", flush=True)
    n_exact = sum(1 for v in results.values() if v[0] == "EXACT")
    n_rows = sum(1 for v in results.values() if v[0] == "rows-only")
    print(json.dumps({"exact": n_exact, "rows_only": n_rows, "total": len(results)}))
    bad = {k: v for k, v in results.items() if v[0] not in ("EXACT", "rows-only")}
    if bad:
        print("FAILURES:")
        for k, v in bad.items():
            print(" ", k, v)
    spark.stop()


if __name__ == "__main__":
    main()
