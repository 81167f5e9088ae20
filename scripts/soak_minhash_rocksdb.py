"""RocksDB streaming-state soak: 10^6 rows through the state store.

Replays 62,500 documents (x16 LSH band rows = 1,000,000 bucket rows)
through ``streaming_minhash_neardup`` on the RocksDB provider with a
TTL shorter than the run, in 4 back-to-back availableNow micro-batches
— the measured point behind SCALE.md's "a year of ingest cannot OOM
the store". Prints one JSON line:

  {"docs": N, "band_rows": N*16, "batches": [...per-batch ms...],
   "state_rows": [...per-batch numRowsTotal...], "peak_state": ...,
   "final_state": ..., "pairs": ..., "planted_detected": ...,
   "wall_sec": ..., "rocksdb_artifacts": true}

Run standalone (own JVM, local[$SPARK_GRAFT_CPUS]):
  python scripts/soak_minhash_rocksdb.py [n_docs]
Driven by tests/test_rocksdb_state.py as a subprocess so the soak gets
full machine parallelism instead of the shared 8-core test session.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def main() -> dict:
    from streamz_spark.session import get_spark
    from streamz_spark.streaming.sources import from_directory
    from streamz_spark.streaming.stateful import streaming_minhash_neardup

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 62_500
    n_chunks, bands, ttl = 4, 16, 30.0
    spark = get_spark("soak_minhash_rocksdb")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)

    base = tempfile.mkdtemp(prefix="soak_minhash_")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    words = ",".join(f"'w{i:03d}'" for i in range(500))
    text_of = (
        "concat_ws(' ', transform(sequence(1, 12), j -> "
        f"element_at(array({words}), cast(pmod(hash({{base}} * 31 + j), 500) + 1 as int))))"
    )
    per = n_docs // n_chunks
    for i in range(n_chunks):
        (
            spark.range(i * per, (i + 1) * per)
            .select(
                F.col("id").alias("doc_id"),
                # unique random 12-token texts; every id%1000==1 doc
                # copies its predecessor => planted dup pairs
                F.when(
                    (F.col("id") % 1000) == 1,
                    F.expr(text_of.format(base="(id - 1)")),
                ).otherwise(F.expr(text_of.format(base="id"))).alias("text"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"chunk={i:05d}"))
        )

    stream = from_directory(
        spark, os.path.join(src, "chunk=*"), "doc_id long, text string",
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    out = streaming_minhash_neardup(
        stream, num_perm=64, bands=bands, min_est_jaccard=0.9, ttl=ttl
    )
    pairs: list = []
    t0 = time.time()
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, i: pairs.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + ProcessingTimeTimeout never self-terminates: once
    # the data drains, Spark keeps running empty ~1 s batches to fire
    # pending TTL timers (and the pair-dedup state never expires), so
    # awaitTermination would hang forever. Poll progress instead: stop
    # after every input row is processed AND one extra TTL window has
    # elapsed (so the timeout sweeps demonstrably evict).
    curve: dict = {}
    drained_at = None
    drained = False
    while time.time() - t0 < 850:
        time.sleep(2)
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            srows = max((o["numRowsTotal"] for o in ops), default=0)
            curve[p["batchId"]] = (
                p["batchDuration"], srows, int(p["numInputRows"]))
        if sum(v[2] for v in curve.values()) >= n_docs:
            drained_at = drained_at or time.time()
            if time.time() - drained_at > ttl + 15:
                drained = True
                break
        if not q.isActive:
            drained = sum(v[2] for v in curve.values()) >= n_docs
            break
    q.stop()
    wall = time.time() - t0
    exts = set()
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        for f in files:
            exts.add(f.rsplit(".", 1)[-1])
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i - 1, i) for i in range(1, n_docs, 1000)}
    ordered = [curve[k] for k in sorted(curve)]
    data_batches = [v for v in ordered if v[2] > 0]
    result = {
        "drained": bool(drained),
        "docs": sum(v[2] for v in ordered),
        "band_rows": sum(v[2] for v in ordered) * bands,
        "batches_ms": [v[0] for v in data_batches],
        "state_rows": [v[1] for v in data_batches],
        "n_sweep_batches": len(ordered) - len(data_batches),
        "peak_state": max((v[1] for v in ordered), default=0),
        "final_state": ordered[-1][1] if ordered else 0,
        "pairs": len(got_pairs),
        "planted": len(planted),
        "planted_detected": len(got_pairs & planted),
        "wall_sec": round(wall, 1),
        "rocksdb_artifacts": bool(exts & {"sst", "zip", "changelog"}),
        "ttl_sec": ttl,
    }
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)
    return result


if __name__ == "__main__":
    print(json.dumps(main()))
