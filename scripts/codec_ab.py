"""A/B one shuffle-codec arm over shuffle-heavy catalog queries.

Guide §2.3: ``spark.io.compression.codec`` (default lz4) vs zstd
cannot be distinguished at sf0.1 (≤20 MB shuffles), so this probe runs
the shuffle-heaviest TPC-H entries on the 100× replica. One codec arm
per process (the codec is a core conf, fixed at JVM start); a wrapper
alternates arms so host-noise waves hit both sides.

Usage: python scripts/codec_ab.py <codec> [query ...]
Env: SPARK_GRAFT_SF_DIR (the replica dir), SPARK_GRAFT_BENCH_RUNS
(default 2). Prints one JSON line:
{"codec": ..., "queries": {name: {"wall_s": min, "walls": [...],
 "shuffle_write_bytes": ..., "executor_cpu_ms": ...}}}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from streamz_spark.benchmetrics import harvest_group_metrics
from streamz_spark.catalog import load_all
from streamz_spark.session import configure_builder

DEFAULT_QUERIES = [
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_suppliers",
]


def main() -> None:
    codec = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf10_tpch")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"codec_ab_{codec}")
        .config("spark.io.compression.codec", codec)
    )
    spark = configure_builder(builder, cpus=cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    registry = dict(load_all())
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    registry.update(EXTRA_REGISTRY)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    # warm JVM/footers so run 1 is not JIT-bound; must be a query the
    # replica dir can serve (partial replicas carry a table subset),
    # so reuse the first requested query as its own warm-up
    force(registry[names[0]].fn(spark, sf_dir))
    out = {}
    for name in names:
        walls = []
        group = None
        for i in range(runs):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            group = f"codec_ab::{name}::{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            force(registry[name].fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        m = harvest_group_metrics(spark, group) or {}
        out[name] = {
            "wall_s": min(walls),
            "walls": walls,
            "shuffle_write_bytes": m.get("shuffle_write_bytes"),
            "shuffle_write_records": m.get("shuffle_write_records"),
            "executor_cpu_ms": m.get("executor_cpu_ms"),
        }
        sc.setJobGroup("codec_ab::idle", "")
    print(json.dumps({"codec": codec, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
