"""Incremental LSH near-dup detection (streaming_minhash_neardup):
new docs are checked against all prior history via band-bucket state."""

import pandas as pd
import pytest

from streamz_spark.streaming.sources import from_iterable
from streamz_spark.streaming.sinks import sink_to_list
from streamz_spark.streaming.stateful import streaming_minhash_neardup

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light")
NEAR = BASE.replace("afternoon", "evening")  # one-token edit ≈ high jaccard
OTHER = ("completely different content about distributed query engines "
         "optimizing shuffle exchange operators under adaptive execution plans")


def test_cross_batch_pair_detected(spark):
    chunks = [
        [(1, BASE), (2, OTHER)],   # batch 1: no pair
        [(3, NEAR)],               # batch 2: pairs with doc 1 from state
    ]
    src = from_iterable(spark, chunks, "doc_id long, text string")
    out = streaming_minhash_neardup(src, min_est_jaccard=0.5)
    batches = [b for b in sink_to_list(out) if len(b)]
    got = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
    pairs = set(zip(got["id_a"], got["id_b"])) if len(got) else set()
    assert (1, 3) in pairs
    assert all(p == (1, 3) for p in pairs)  # OTHER never pairs
    est = got.set_index(["id_a", "id_b"]).loc[(1, 3), "est_jaccard"]
    assert est >= 0.5


def test_intra_batch_and_no_self_pairs(spark):
    chunks = [[(1, BASE), (2, BASE), (3, OTHER)]]
    src = from_iterable(spark, chunks, "doc_id long, text string")
    out = streaming_minhash_neardup(src, min_est_jaccard=0.9)
    batches = [b for b in sink_to_list(out) if len(b)]
    got = pd.concat(batches, ignore_index=True)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert pairs == {(1, 2)}  # exact dup: est 1.0, once, no self-pairs
    assert got["est_jaccard"].iloc[0] == pytest.approx(1.0)


def test_ttl_evicts_expired_members_detects_fresh(spark, tmp_path):
    """State-size policy for unbounded ingest: with ttl set, members
    older than the TTL are pruned (no pair against expired history),
    while detection keeps working inside the window.

    Harness note: with ProcessingTimeTimeout the engine schedules
    batches continuously (timeout sweeps), so processAllAvailable never
    settles — progress is polled via recentProgress instead."""
    import time

    from streamz_spark.streaming.datasources import filelog_append, from_filelog

    def wait_for(cond, timeout=60, msg=""):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if cond():
                return
            time.sleep(0.2)
        raise TimeoutError(msg)

    def rows_in(q):
        return sum(int(p["numInputRows"]) for p in q.recentProgress)

    log = str(tmp_path / "log")
    filelog_append(log, [("1", BASE)])
    src = from_filelog(spark, log).selectExpr(
        "cast(key as long) as doc_id", "value as text"
    )
    # ttl must comfortably exceed one batch latency (the doc3->doc5 gap,
    # ~1-3 s with a Python stateful stage) yet keep the test short
    ttl = 8.0
    out = streaming_minhash_neardup(src, min_est_jaccard=0.5, ttl=ttl)

    rows = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # doc 1 fully absorbed into bucket state (batch committed)
        wait_for(lambda: rows_in(q) >= 1, msg="doc 1 never processed")
        time.sleep(ttl + 1.0)            # > ttl: doc 1 expires
        filelog_append(log, [("3", NEAR)])
        wait_for(lambda: rows_in(q) >= 2, msg="doc 3 never processed")
        filelog_append(log, [("5", NEAR)])
        # positive signal: the fresh pair appears
        wait_for(
            lambda: any((r["id_a"], r["id_b"]) == (3, 5) for r in rows),
            msg="fresh pair (3,5) not detected inside the TTL window",
        )
    finally:
        q.stop()

    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 3) not in pairs, "expired member produced a pair"
    assert (1, 5) not in pairs, "expired member produced a pair"
    assert (3, 5) in pairs
