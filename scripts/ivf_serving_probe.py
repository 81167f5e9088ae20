"""IVF ANN serving-shape scaling probe: a FIXED query workload against
a corpus N× larger — how an ANN index is actually consumed at 100 TB
(the self-query catalog entry is the all-pairs audit shape; its total
work is inherently ~n^1.5 with sqrt-n cells because the query count
scales WITH the corpus).

Measures ivf_ann(corpus, queries=workload) with sqrt-n cells at the
base SF and the N× replica; the workload is the base table's 2000
vectors both times. Expected per-query cost = n_probe · (n/√n) = 3√n
→ a 100× corpus costs ~10× (exponent 0.5 is the design ceiling; the
centroid k-means/seed setup is amortized noise at this scale).

Usage: python scripts/ivf_serving_probe.py [N] [base] [replica]
Defaults: N=100, base=/root/testdata/sf0.1, replica=<repo>/.scale/sf10.
"""

from __future__ import annotations

import gc
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.io import load_table
from streamz_spark.operators import similarity as sim
from streamz_spark.session import get_spark


def timed(spark, corpus, queries, runs=2) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        (
            sim.ivf_ann(corpus, k=5, centroids="seed", queries=queries)
            .write.format("noop").mode("overwrite").save()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replica = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".scale", "sf10")
    spark = get_spark("ivf-serving-probe")
    workload = load_table(spark, base, "embeddings").localCheckpoint()
    corpus_b = load_table(spark, base, "embeddings")
    corpus_r = load_table(spark, replica, "embeddings")
    timed(spark, corpus_b, workload, runs=1)  # warm
    t0 = timed(spark, corpus_b, workload)
    t1 = timed(spark, corpus_r, workload)
    ratio = t1 / t0
    exp = math.log(ratio) / math.log(n)
    nq = workload.count()
    print(f"| ivf_ann serving ({nq} fixed queries, sqrt-n cells) "
          f"| {t0:.2f} s | {t1:.2f} s | {ratio:.1f}x | {exp:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
