"""A/B the ANN distance kernels (Catalyst exprs vs mapInArrow) on the
PQ encode and IVF cell-assignment stages, plus the end-to-end queries.

For each arm: min-of-N wall (noop force, cache/GC reset per run, the
bench protocol) + job-group exec metrics + an order-insensitive
xxhash64-sum checksum of the OUTPUT (bit-equality evidence at the
measured scale, complementing tests/test_dedup.py's collected
differentials at the test SF).

Usage: python scripts/ann_kernel_ab.py [pq|ivf|ivf_serving ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS
(default 2), SPARK_GRAFT_ANN_CELLS (default None -> sqrt sizing).
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
from streamz_spark.io import load_table
from streamz_spark.session import get_spark


def main() -> None:
    shapes = sys.argv[1:] or ["pq", "ivf", "ivf_serving"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    cells_env = os.environ.get("SPARK_GRAFT_ANN_CELLS")
    n_cells = int(cells_env) if cells_env else None
    spark = get_spark("ann_kernel_ab")
    spark.sparkContext.setLogLevel("ERROR")
    from streamz_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")

    def build(shape: str, kernel: str):
        if shape == "pq":
            return sim.pq_ann(emb, k=5, codebooks="seed", kernel=kernel)
        if shape == "ivf":
            return sim.ivf_ann(
                emb, k=5, n_cells=n_cells, n_probe=3, centroids="seed",
                kernel=kernel,
            )
        if shape == "ivf_serving":
            q = emb.filter(F.col("vec_id") < 100)
            return sim.ivf_ann(
                emb, k=5, n_cells=n_cells, n_probe=3, centroids="seed",
                queries=q, kernel=kernel,
            )
        raise ValueError(shape)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    out: dict = {}
    force(build(shapes[0], "sql"))  # warm JVM/footers
    for shape in shapes:
        out[shape] = {}
        for kernel in ("sql", "arrow"):
            walls = []
            group = None
            for i in range(runs):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                group = f"ab::{shape}::{kernel}::{i}"
                sc.setJobGroup(group, f"{shape}/{kernel}")
                t0 = time.perf_counter()
                force(build(shape, kernel))
                walls.append(round(time.perf_counter() - t0, 3))
            m = harvest_group_metrics(spark, group)
            sc.setJobGroup("ab::idle", "")
            # order-insensitive output checksum: bit-equality evidence
            df = build(shape, kernel)
            chk = df.select(
                F.sum(
                    F.xxhash64(F.concat_ws("|", *df.columns))
                    .cast("decimal(38,0)")
                ).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            out[shape][kernel] = {
                "wall_s": min(walls),
                "walls": walls,
                "checksum": str(chk["h"]),
                "rows": chk["n"],
                **m,
            }
        a, b = out[shape]["sql"], out[shape]["arrow"]
        out[shape]["bit_equal"] = (
            a["checksum"] == b["checksum"] and a["rows"] == b["rows"]
        )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
