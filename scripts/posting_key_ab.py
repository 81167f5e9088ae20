"""Isolated A/B of the shingle POSTING EXCHANGE — the one stage
``approx_keys=True`` changes — string gram key vs xxhash64 int64 key.

The full ngram_jaccard_pairs query at the 100× replica is memory-
marginal on one box (the persisted shingle cache + pair-expansion
spill intermittently starve the sizes broadcast build, on unchanged
round-start code too — OPTIMIZATION_r09.md), so the honest measurement
of the key-width claim is the exchange itself: explode the shingle
sets and run the SAME posting aggregate (collect_list(id), the
ngram_jaccard_pairs shape) keyed by gram text vs by hash — no persist,
no sizes join, no pair expansion. min-of-N walls + job-group metrics.

Usage: python scripts/posting_key_ab.py
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS
(default 2), SPARK_GRAFT_AB_K (shingle width, default 3).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark.benchmetrics import harvest_group_metrics
from streamz_spark.io import ensure_scan_parallelism, load_table
from streamz_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    k = int(os.environ.get("SPARK_GRAFT_AB_K", "3"))
    spark = get_spark("posting_key_ab")
    spark.sparkContext.setLogLevel("ERROR")
    from streamz_spark.operators.text import add_word_kgrams

    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))

    def posting(approx: bool):
        sh = add_word_kgrams(
            docs.select(F.col("doc_id").alias("id"), "text"),
            "text", k, "sh", distinct=True,
        ).select("id", F.explode("sh").alias("shingle"))
        if approx:
            sh = sh.select("id", F.xxhash64("shingle").alias("shingle"))
        return (
            sh.groupBy("shingle")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") >= 2)
            .select(F.count_if(F.size("ids") <= 50).alias("n"))
        )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    force(posting(False))  # warm
    out = {}
    for arm, approx in (("exact_string_key", False), ("xxhash64_key", True)):
        walls = []
        group = None
        for i in range(runs):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            group = f"ab::{arm}::{i}"
            sc.setJobGroup(group, arm)
            t0 = time.perf_counter()
            force(posting(approx))
            walls.append(round(time.perf_counter() - t0, 3))
        m = harvest_group_metrics(spark, group)
        sc.setJobGroup("ab::idle", "")
        out[arm] = {"wall_s": min(walls), "walls": walls, **m}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
