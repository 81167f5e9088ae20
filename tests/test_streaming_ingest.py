"""End-to-end streaming corpus ingest: filelog (Kafka-semantics)
source → quality gate → fingerprint → state-backed exact dedup →
parquet sink, with checkpointed restart.

This is the training-data story run *as a stream*: the dedup state
(`dropDuplicates` on the content fingerprint) lives in the state
store, so duplicates are dropped across micro-batches AND across a
query restart — the cross-restart half is what distinguishes
state-backed dedup from per-batch `distinct()`.
"""

import json
import os

from pyspark.sql import functions as F

from streamz_spark.operators.text import fingerprint
from streamz_spark.streaming.datasources import filelog_append, from_filelog


def _run_ingest(spark, log, out_dir, ckpt):
    docs = (
        from_filelog(spark, log)
        .select(
            F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("value", "$.text").alias("text"),
        )
        # quality gate: drop empty/whitespace-only docs (map-side)
        .filter(F.length(F.trim("text")) > 0)
        .withColumn("fp", fingerprint("text", "fp"))
        # state-backed exact dedup on content fingerprint
        .dropDuplicates(["fp"])
    )
    q = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_ingest_dedup_across_restart(spark, tmp_path):
    log = str(tmp_path / "log")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rec(i, text):
        return json.dumps({"doc_id": i, "text": text})

    # batch 1: 4 docs — one intra-batch duplicate pair + one blank
    filelog_append(log, [rec(1, "alpha beta"), rec(2, "gamma delta"),
                         rec(3, "alpha beta"), rec(4, "   ")], partition=0)
    _run_ingest(spark, log, out_dir, ckpt)

    first = spark.read.parquet(out_dir)
    assert first.count() == 2  # 3 non-blank, minus 1 duplicate
    assert sorted(r.text for r in first.collect()) == ["alpha beta", "gamma delta"]

    # batch 2 (after restart): one dup of a batch-1 doc, one new doc
    filelog_append(log, [rec(5, "alpha beta"), rec(6, "epsilon zeta")], partition=0)
    _run_ingest(spark, log, out_dir, ckpt)

    final = spark.read.parquet(out_dir)
    # cross-restart state: doc 5's text was already ingested pre-restart
    assert final.count() == 3
    texts = sorted(r.text for r in final.collect())
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
    # offsets committed: log partition fully consumed exactly once
    ids = sorted(r.doc_id for r in final.collect())
    assert ids == [1, 2, 6]


def test_streaming_ingest_no_reprocessing_on_idle_restart(spark, tmp_path):
    log = str(tmp_path / "log")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    filelog_append(log, [json.dumps({"doc_id": 1, "text": "only doc"})], partition=0)
    _run_ingest(spark, log, out_dir, ckpt)
    _run_ingest(spark, log, out_dir, ckpt)  # no new data: must be a no-op
    assert spark.read.parquet(out_dir).count() == 1
