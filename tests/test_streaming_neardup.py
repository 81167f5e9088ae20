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


def _run_ttl_stream(spark, log, ttl, drive):
    """Start the TTL'd near-dup stream over a filelog and call
    ``drive(q, rows, wait_processed, append)``.

    Harness note: with ProcessingTimeTimeout the engine schedules
    batches continuously (timeout sweeps), so processAllAvailable never
    settles — progress is polled via recentProgress instead."""
    import time

    from streamz_spark.streaming.datasources import filelog_append, from_filelog

    src = from_filelog(spark, log).selectExpr(
        "cast(key as long) as doc_id", "value as text"
    )
    out = streaming_minhash_neardup(src, min_est_jaccard=0.5, ttl=ttl)
    rows: list = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def wait_processed(n, timeout=120):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if sum(int(p["numInputRows"]) for p in q.recentProgress) >= n:
                return
            time.sleep(0.2)
        raise TimeoutError(f"stream never processed {n} input rows")

    try:
        drive(q, rows, wait_processed, lambda recs: filelog_append(log, recs))
    finally:
        q.stop()
    return {(r["id_a"], r["id_b"]) for r in rows}


def test_ttl_evicts_expired_members(spark, tmp_path):
    """Eviction half of the state-size policy: a member older than the
    TTL never pairs. Load-independent — the expiry sleep starts only
    AFTER doc 1's batch is confirmed committed, so doc 1's recorded
    seen-time is strictly older than ttl when doc 3 processes."""
    import time

    from streamz_spark.streaming.datasources import filelog_append

    log = str(tmp_path / "log")
    filelog_append(log, [("1", BASE)])
    ttl = 2.0

    def drive(q, rows, wait_processed, append):
        wait_processed(1)          # doc 1 absorbed into bucket state
        time.sleep(ttl + 1.0)      # > ttl: doc 1 expires
        append([("3", NEAR)])
        wait_processed(2)          # doc 3 compared against pruned state

    pairs = _run_ttl_stream(spark, str(tmp_path / "log"), ttl, drive)
    assert pairs == set(), f"expired member produced pairs: {pairs}"


def test_ttl_detects_inside_window(spark, tmp_path):
    """Detection half: with a TTL far larger than any batch latency,
    cross-batch pairs still surface — the TTL code path (per-member
    timestamps + ProcessingTimeTimeout) must not break detection."""
    import time

    from streamz_spark.streaming.datasources import filelog_append

    log = str(tmp_path / "log")
    filelog_append(log, [("1", BASE), ("2", OTHER)])

    def drive(q, rows, wait_processed, append):
        wait_processed(2)
        append([("3", NEAR)])
        t0 = time.time()
        while time.time() - t0 < 120 and not rows:
            time.sleep(0.2)

    pairs = _run_ttl_stream(spark, log, ttl=600.0, drive=drive)
    assert (1, 3) in pairs
    assert all(p == (1, 3) for p in pairs)


def test_streaming_duplicated_anchors_match_batch_anchor_set(spark):
    # ingest-time ExactSubstr anchors: replay docs in 3 micro-batches
    # (duplicated grams land ACROSS batches) and require the emitted
    # anchor set to equal the brute-force batch anchor relation — the
    # first occurrence must emit retroactively when its gram becomes
    # duplicated in a later batch, every occurrence exactly once
    from collections import Counter

    import pandas as pd

    from streamz_spark.streaming.sinks import sink_to_list
    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.stateful import streaming_duplicated_anchors

    k = 3
    boiler = "alpha beta gamma delta"          # shared 4-token run
    docs = [
        (1, f"{boiler} eps zeta eta"),          # batch 1: boiler's 1st copy
        (2, "zeta eps theta eta alpha"),        # batch 1: unique
        (3, f"theta {boiler} zeta"),            # batch 2: boiler's 2nd copy
        (4, "eps eps eps eps"),                 # batch 2: self-repeating gram
        (5, f"eta {boiler}"),                   # batch 3: 3rd copy
    ]
    chunks = [
        pd.DataFrame(docs[0:2], columns=["doc_id", "text"]),
        pd.DataFrame(docs[2:4], columns=["doc_id", "text"]),
        pd.DataFrame(docs[4:5], columns=["doc_id", "text"]),
    ]

    # brute-force anchor relation over the whole corpus
    grams = Counter()
    per_doc = {}
    for i, text in docs:
        toks = text.lower().split()
        gs = [" ".join(toks[p:p + k]) for p in range(len(toks) - k + 1)]
        per_doc[i] = gs
        grams.update(gs)
    want = {
        (i, p) for i, gs in per_doc.items()
        for p, g in enumerate(gs) if grams[g] >= 2
    }
    assert want, "test corpus must contain duplicated grams"

    out = streaming_duplicated_anchors(
        from_iterable(spark, chunks, "doc_id long, text string"), k=k
    )
    batches = sink_to_list(out, output_mode="append")
    emitted = [
        (int(r.id), int(r.pos))
        for b in batches if len(b)
        for r in b.itertuples(index=False)
    ]
    assert sorted(emitted) == sorted(want), (
        f"emitted {sorted(emitted)} want {sorted(want)}"
    )
    # exactly-once per occurrence
    assert len(emitted) == len(set(emitted))


def test_streaming_duplicated_anchors_rejects_cap_below_two(spark):
    # ADVICE r5: max_occurrences=1 used to slice with -0, silently
    # disabling the state cap — must now raise up front
    import pytest

    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.stateful import streaming_duplicated_anchors

    import pandas as pd

    src = from_iterable(
        spark, [pd.DataFrame([(1, "a b c")], columns=["doc_id", "text"])],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_occurrences"):
        streaming_duplicated_anchors(src, k=2, max_occurrences=1)
