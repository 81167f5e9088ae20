"""Time named catalog queries in isolation (min of N noop-sink runs).

Usage: python scripts/time_queries.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS (default 3)
Prints one JSON line {name: min_sec}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.catalog import load_all
from streamz_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("time_queries")
    registry = dict(load_all())
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    registry.update(EXTRA_REGISTRY)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm JVM/footers
    force(registry[names[0]].fn(spark, sf_dir))
    out = {}
    for name in names:
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            force(registry[name].fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
