"""Checkpoint/restart continuation — the engine's answer to the
reference's start=/with_state resume tests (test_dataframes.py:993-1101):
stop a stateful streaming query, add more data, restart from the same
checkpoint, and assert state carried over.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from streamz_spark.io import load_table

from .conftest import SF_DIR


def test_stateful_agg_resumes_from_checkpoint(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    src_dir = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_state_")
    out_sink = tempfile.mkdtemp(prefix="ckpt_out_")

    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(os.path.join(src_dir, "chunk=0"))

    def run_query():
        src = (
            spark.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(src_dir, "chunk=*"))
        )
        agg = src.groupBy("user_id").agg(
            F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
        )

        def write(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_sink, f"epoch={batch_id}")
            )

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(write)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # phase 1: half the data
    run_query()
    # phase 2: add the second half, restart from the SAME checkpoint
    second.write.mode("overwrite").parquet(os.path.join(src_dir, "chunk=1"))
    run_query()

    # the latest epoch must aggregate over BOTH phases (state resumed,
    # phase-1 files not reprocessed as new)
    epochs = sorted(os.listdir(out_sink))
    final = spark.read.parquet(os.path.join(out_sink, epochs[-1])).toPandas()
    want = (
        ev.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    final = final.sort_values("user_id", ignore_index=True)
    want = want.sort_values("user_id", ignore_index=True)
    assert final["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(final["total"], want["total"], rtol=1e-9)

    for d in (src_dir, ckpt, out_sink):
        shutil.rmtree(d, ignore_errors=True)


def test_custom_stateful_op_resumes_from_checkpoint(spark):
    """applyInPandasWithState state (running totals) survives a query
    restart from the same checkpoint — the engine's start=/with_state
    resume (reference test_dataframes.py:993-1101) without user-managed
    state objects."""
    from pyspark.sql import functions as F

    from streamz_spark.streaming.stateful import running_sum

    src_dir = tempfile.mkdtemp(prefix="ckpt2_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt2_state_")
    collected: list = []

    rows1 = [(1, 10.0), (1, 20.0), (2, 5.0)]
    rows2 = [(1, 30.0), (2, 15.0)]
    schema = "user_id long, value double"

    def write_chunk(rows, i):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src_dir, f"chunk={i}"))

    def run_once():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(src_dir, "chunk=*"))
        )
        out = running_sum(src, "user_id")

        def sink(batch_df, batch_id):
            collected.append(batch_df.toPandas())

        q = (
            out.writeStream.outputMode("update").foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    write_chunk(rows1, 0)
    run_once()
    write_chunk(rows2, 1)
    run_once()  # restart: state must carry, chunk 0 must not reprocess

    import pandas as pd

    allu = pd.concat([c for c in collected if len(c)], ignore_index=True)
    final = allu.groupby("user_id")["running_sum"].last().sort_index()
    assert final.tolist() == [60.0, 20.0]  # 10+20+30, 5+15

    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_topk_resumes_from_checkpoint(spark):
    # kill the top-k similarity stream mid-corpus, restart from the
    # same checkpoint with the rest of the vectors: the resumed state
    # must carry the phase-1 top-k forward so the final answer equals
    # the batch brute-force operator over the WHOLE corpus
    from streamz_spark.operators.similarity import brute_force_topk
    from streamz_spark.streaming.stateful import streaming_topk_similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where("vec_id < 3")
    want = {
        (r["qid"], r["cid"], r["rank"])
        for r in brute_force_topk(emb, queries, k=3).collect()
    }

    src_dir = tempfile.mkdtemp(prefix="topk_src_")
    ckpt = tempfile.mkdtemp(prefix="topk_ckpt_")
    rows: list = []

    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    first.write.mode("overwrite").parquet(os.path.join(src_dir, "chunk=0"))

    def run_query():
        src = (
            spark.readStream.schema(emb.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(src_dir, "chunk=*"))
        )
        out = streaming_topk_similarity(src, queries, k=3)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda b, i: rows.append(b.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_query()
    second.write.mode("overwrite").parquet(os.path.join(src_dir, "chunk=1"))
    run_query()

    last: dict = {}
    for batch in rows:
        by_q: dict = {}
        for r in batch:
            by_q.setdefault(r["qid"], []).append(r)
        last.update(by_q)
    got = {
        (r["qid"], r["cid"], r["rank"]) for rs in last.values() for r in rs
    }
    assert got == want
