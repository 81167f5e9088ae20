"""Time named catalog queries in isolation AND harvest their
deterministic execution metrics (stages/tasks/shuffle/CPU).

The wall column is min-of-N with the bench protocol's hygiene
(clearCache + Python & JVM GC between runs, noop sink); the metrics
come from the LAST run's job group via the AppStatusStore — they are
host-noise-free, which makes this the A/B tool of choice on this
round's steal-noisy host (OPTIMIZATION_r08.md, measurement protocol).

Usage: python scripts/metrics_probe.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS
(default 3). Prints one JSON line {name: {"wall_s": ..., "walls":
[...], <exec metrics>}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.benchmetrics import harvest_group_metrics
from streamz_spark.catalog import load_all
from streamz_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("metrics_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = dict(load_all())
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    registry.update(EXTRA_REGISTRY)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    force(registry[names[0]].fn(spark, sf_dir))  # warm JVM/footers
    out = {}
    for name in names:
        walls = []
        group = None
        for i in range(runs):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            group = f"probe::{name}::{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            force(registry[name].fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        m = harvest_group_metrics(spark, group) or {}
        out[name] = {"wall_s": min(walls), "walls": walls, **m}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
