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
