"""End-to-end Structured Streaming tests: replay test tables as
micro-batch streams, run the engine's operators, compare against the
batch result (the reference's stream-chunks-vs-full-frame oracle,
SURVEY.md §5.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.streaming import (
    from_iterable,
    replay_table,
    sink_to_list,
    sink_to_memory,
)
from streamz_spark.streaming.stateful import partition_batches, running_sum

from .conftest import SF_DIR


def test_streaming_groupby_agg_complete_mode(spark):
    """updating-stream semantics: final complete-mode emission == batch
    aggregate (reference test_dataframes.py:110-111 'compare final')."""
    src = replay_table(spark, SF_DIR, "events", n_chunks=3, chunk_col="event_id")
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )
    sink_to_memory(agg, "t_complete", output_mode="complete")
    got = spark.sql("SELECT * FROM t_complete").toPandas().sort_values("event_type", ignore_index=True)
    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .toPandas().sort_values("event_type", ignore_index=True)
    )
    assert got.n.tolist() == want.n.tolist()
    np.testing.assert_allclose(got.sum_value, want.sum_value, rtol=1e-9)


def test_streaming_map_filter_append_concat(spark):
    """streaming-stream semantics: concatenation of per-chunk emissions
    == whole-table result (reference test_pair_arithmetic,
    test_dataframes.py:241-251)."""
    src = replay_table(spark, SF_DIR, "events", n_chunks=3, chunk_col="event_id")
    mapped = src.filter(F.col("value") > 100).select(
        "event_id", (F.col("value") * 2).alias("doubled")
    )
    batches = sink_to_list(mapped)
    assert len(batches) >= 3  # one emission per chunk (+ possible empty)
    got = pd.concat(batches, ignore_index=True).sort_values("event_id", ignore_index=True)
    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.filter(F.col("value") > 100)
        .select("event_id", (F.col("value") * 2).alias("doubled"))
        .toPandas().sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_from_iterable_chunk_cadence(spark):
    """One micro-batch per emitted chunk — the reference's emit
    cadence (core.py:464-501) under maxFilesPerTrigger=1."""
    chunks = [
        [(1, 10.0), (2, 20.0)],
        [(3, 30.0)],
        [(4, 40.0), (5, 50.0)],
    ]
    src = from_iterable(spark, chunks, "id long, x double")
    batches = sink_to_list(src.select("id", "x"))
    sizes = sorted(len(b) for b in batches if len(b))
    assert sizes == [1, 2, 2]
    allrows = pd.concat(batches).sort_values("id")["x"].tolist()
    assert allrows == [10.0, 20.0, 30.0, 40.0, 50.0]


def test_stateful_running_sum_matches_batch_total(spark):
    """accumulate: per-key running total's final emission equals the
    batch per-key sum (reference scan, core.py:928-1026)."""
    src = replay_table(spark, SF_DIR, "events", n_chunks=3, chunk_col="event_id")
    out = running_sum(src.select("user_id", "value"), "user_id")
    batches = sink_to_list(out, output_mode="update")
    all_updates = pd.concat(batches, ignore_index=True)
    final = all_updates.groupby("user_id")["running_sum"].last()
    ev = load_table(spark, SF_DIR, "events")
    want = ev.groupBy("user_id").agg(F.sum("value").alias("s")).toPandas().set_index("user_id")["s"]
    final, want = final.sort_index(), want.sort_index()
    np.testing.assert_allclose(final.to_numpy(), want.to_numpy(), rtol=1e-9)


def test_partition_batches_count_flush(spark):
    """partition(n): full groups of n per key; leftovers stay buffered
    (reference core.py:1078-1165)."""
    chunks = [[(1, float(i)) for i in range(7)]]
    src = from_iterable(spark, chunks, "user_id long, value double")
    out = partition_batches(src, "user_id", n=3)
    batches = sink_to_list(out, output_mode="append")
    groups = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
    # 7 values → two full groups of 3, one leftover held in state
    assert len(groups) == 2
    assert all(len(b) == 3 for b in groups["batch"])


def test_streaming_time_window_with_watermark(spark):
    """windowed agg + watermark: late-data policy the reference lacks
    (SURVEY.md §2.5) — results match batch tumbling windows."""
    src = replay_table(spark, SF_DIR, "events", n_chunks=3, chunk_col="event_id")
    agg = (
        src.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("ws"), "n")
    )
    sink_to_memory(agg, "t_win", output_mode="complete")
    got = spark.sql("SELECT * FROM t_win").toPandas().sort_values("ws", ignore_index=True)
    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("ws"), "n")
        .toPandas().sort_values("ws", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_partition_unique_dedups_within_group(spark):
    """partition_unique (reference core.py:1168-1266)."""
    from streamz_spark.streaming.stateful import partition_unique

    chunks = [[(1, v) for v in [1.0, 1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0]]]
    src = from_iterable(spark, chunks, "user_id long, value double")
    out = partition_unique(src, "user_id", n=3)
    batches = sink_to_list(out, output_mode="append")
    groups = pd.concat(batches, ignore_index=True)
    flat = [v for b in groups["batch"] for v in b]
    assert len(flat) == len(set(flat))  # no dup within emitted values
    assert all(len(b) == 3 for b in groups["batch"])


def test_collect_until_flush(spark):
    """Stream.collect (reference core.py:1901-1945): flush-signal union."""
    from streamz_spark.streaming.stateful import collect_until_flush

    rows = [(1, 1.0, False), (1, 2.0, False), (1, 0.0, True),
            (1, 3.0, False), (1, 0.0, True)]
    src = from_iterable(spark, [rows], "user_id long, value double, is_flush boolean")
    out = collect_until_flush(src, "user_id")
    batches = sink_to_list(out, output_mode="append")
    got = pd.concat(batches, ignore_index=True)["collected"].tolist()
    assert [list(b) for b in got] == [[1.0, 2.0], [3.0]]


def test_streaming_frame_fluent_api(spark):
    """StreamingFrame compiles identically over a streaming source —
    the dataframe layer works end-to-end on readStream input."""
    from streamz_spark.frame import StreamingFrame

    src = replay_table(spark, SF_DIR, "events", n_chunks=3, chunk_col="event_id")
    sf = StreamingFrame(src)
    agg = sf[sf["value"] > 50].groupby("event_type")["value"].sum()
    sink_to_memory(agg.df, "t_fluent", output_mode="complete")
    got = spark.sql("SELECT * FROM t_fluent").toPandas().sort_values("event_type", ignore_index=True)
    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.filter(F.col("value") > 50).groupBy("event_type")
        .agg(F.sum("value").alias("value_sum"))
        .toPandas().sort_values("event_type", ignore_index=True)
    )
    assert got["event_type"].tolist() == want["event_type"].tolist()
    np.testing.assert_allclose(got["value_sum"], want["value_sum"], rtol=1e-9)


def test_count_window_sum_last_n(spark):
    """window(n=): sum over the last n rows seen per key (reference
    dataframe/core.py:129-169; deque state -> array state column)."""
    from streamz_spark.streaming.stateful import count_window_sum

    chunks = [[(1, float(v)) for v in [1, 2, 3]],
              [(1, float(v)) for v in [4, 5]]]
    src = from_iterable(spark, chunks, "user_id long, value double")
    out = count_window_sum(src, "user_id", n=3)
    batches = sink_to_list(out, output_mode="update")
    updates = pd.concat(batches, ignore_index=True)
    # after chunk 1: window=[1,2,3] sum 6; after chunk 2: window=[3,4,5] sum 12
    assert updates["window_sum"].tolist() == [6.0, 12.0]
    assert updates["window_len"].tolist() == [3, 3]


def test_integration_text_json_sdf_chain(spark):
    """The reference's end-to-end fixture F6 (test_dataframes.py:466-475):
    json text lines -> parse -> dataframe -> groupby sum."""
    import json

    rows = [[(i, json.dumps({"x": i % 3, "y": i})) for i in range(12)]]
    src = from_iterable(spark, rows, "seq long, value string")
    parsed = src.select(
        F.get_json_object("value", "$.x").cast("long").alias("x"),
        F.get_json_object("value", "$.y").cast("long").alias("y"),
    )
    agg = parsed.groupBy("x").agg(F.sum("y").alias("y_sum"))
    sink_to_memory(agg, "t_chain", output_mode="complete")
    got = spark.sql("SELECT * FROM t_chain").toPandas().sort_values("x", ignore_index=True)
    want = {0: sum(i for i in range(12) if i % 3 == 0),
            1: sum(i for i in range(12) if i % 3 == 1),
            2: sum(i for i in range(12) if i % 3 == 2)}
    assert dict(zip(got["x"], got["y_sum"])) == want


def test_stream_stream_join_with_watermarks(spark):
    """stream-stream inner equi-join with watermarks + time bound —
    the engine's keyed-join superset of the reference's structural
    combinators (SURVEY.md §2.5), running genuinely stream-to-stream."""
    src1 = replay_table(spark, SF_DIR, "events", n_chunks=2, chunk_col="event_id")
    src2 = replay_table(spark, SF_DIR, "events", n_chunks=2, chunk_col="event_id")
    clicks = (
        src1.filter(F.col("event_type") == "click")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .select("user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value"))
    )
    purchases = (
        src2.filter(F.col("event_type") == "purchase")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
                F.col("value").alias("p_value"))
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    batches = sink_to_list(joined.select("user_id", "click_ts", "p_ts"))
    got = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()

    ev = load_table(spark, SF_DIR, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    want = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert len(got) == want


def test_streaming_ewm_matches_batch(spark):
    """streaming EWM state continuation across micro-batches: with
    prefix-ordered chunks (streaming delivery order == event order, the
    reference's emit cadence), the final per-key emission equals the
    pandas EWM of the full sequence exactly."""
    from streamz_spark.streaming.stateful import ewm_mean_stream

    vals = {1: [10.0, 20.0, 30.0, 40.0, 50.0], 2: [5.0, 15.0, 25.0]}
    # prefix chunks: first two events per key, then the rest
    chunk1 = [(k, i, v) for k, vs in vals.items() for i, v in enumerate(vs[:2])]
    chunk2 = [(k, i + 2, v) for k, vs in vals.items() for i, v in enumerate(vs[2:])]
    src = from_iterable(spark, [chunk1, chunk2], "user_id long, event_id long, value double")
    out = ewm_mean_stream(src, "user_id", alpha=0.3, order_col="event_id")
    batches = sink_to_list(out, output_mode="update")
    final = pd.concat(batches, ignore_index=True).groupby("user_id")["ewm"].last()
    for k, vs in vals.items():
        want = pd.Series(vs).ewm(alpha=0.3, adjust=True).mean().iloc[-1]
        np.testing.assert_allclose(final[k], want, rtol=1e-12)


def test_empty_chunk_does_not_perturb_state(spark):
    """FIXTURES F2: an empty micro-batch must leave stateful results
    unchanged (the reference emits empty chunks in its agg matrices)."""
    chunks = [
        [(1, 10.0), (1, 20.0)],
        [],  # empty chunk
        [(1, 30.0)],
    ]
    src = from_iterable(spark, chunks, "user_id long, value double")
    out = running_sum(src, "user_id")
    batches = sink_to_list(out, output_mode="update")
    updates = pd.concat([b for b in batches if len(b)], ignore_index=True)
    assert updates["running_sum"].tolist() == [30.0, 60.0]


def test_online_linear_fit_converges(spark):
    """River-style online train (reference streamz/river.py): SGD state
    across micro-batches converges toward y = 2x + 1."""
    from streamz_spark.streaming.stateful import online_linear_fit

    rng = np.random.RandomState(3)
    chunks = []
    for _ in range(4):
        xs = rng.uniform(-1, 1, 50)
        chunks.append([(1, float(x), float(2 * x + 1 + 0.01 * rng.randn())) for x in xs])
    src = from_iterable(spark, chunks, "k long, x double, y double")
    out = online_linear_fit(src, "k", lr=0.3, epochs_per_batch=50)
    batches = sink_to_list(out, output_mode="update")
    final = pd.concat(batches, ignore_index=True).iloc[-1]
    assert abs(final["w"] - 2.0) < 0.2, final.to_dict()
    assert abs(final["b"] - 1.0) < 0.2, final.to_dict()
    assert final["mse"] < 0.05

def test_session_window_agg_matches_lag_gap_cumsum_batch(spark):
    """session_window_agg (built-in F.session_window) must carve the
    same sessions as the batch lag-gap-cumsum sessionize query: per
    user, the multiset of (n_events, session_value) agrees."""
    from streamz_spark.catalog import load_all
    from streamz_spark.operators.windows import session_window_agg

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = session_window_agg(
        ev, "ts", "30 minutes",
        aggs={"n_events": F.count(F.lit(1)),
              "session_value": F.round(F.sum("value"), 4)},
        keys=["user_id"],
    ).toPandas()
    want = load_all()["sessionize"].fn(spark, SF_DIR).toPandas()
    cols = ["user_id", "n_events", "session_value"]
    g = got[cols].sort_values(cols, ignore_index=True)
    w = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(g, w)


def test_session_window_agg_streaming_append(spark):
    """Streaming sessionization end-to-end: watermarked session_window
    in append mode emits closed sessions that match the batch result."""
    from streamz_spark.operators.windows import session_window_agg

    # chunks must arrive in event-time order: replaying by event_id % 3
    # interleaves hours of artificial lateness and the watermark rightly
    # drops those fragments — that would test the harness, not the op
    import numpy as np

    ev_pdf = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        .toPandas()
        .sort_values("ts", ignore_index=True)
    )
    chunks = np.array_split(ev_pdf, 3)
    src = from_iterable(spark, chunks, "user_id long, ts timestamp, value double")
    out = session_window_agg(
        src, "ts", "30 minutes",
        aggs={"n_events": F.count(F.lit(1))},
        keys=["user_id"],
        watermark="1 hour",
    )
    batches = sink_to_list(out, output_mode="append")
    got = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
    assert len(got) > 0, "no sessions closed under the watermark"
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = session_window_agg(
        ev, "ts", "30 minutes",
        aggs={"n_events": F.count(F.lit(1))}, keys=["user_id"],
    ).toPandas()
    # append mode can only emit sessions the watermark has passed —
    # every emitted session must appear verbatim in the batch result
    key = ["user_id", "session_start", "session_end", "n_events"]
    merged = got[key].merge(want[key], on=key, how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), merged[merged["_merge"] != "both"]


def test_unique_within_watermark_bounded_state(spark):
    """Stream.unique(ts_col=, watermark=): dropDuplicatesWithinWatermark
    — dedup state is evicted once the watermark passes (the reference's
    unique(maxsize=) memory bound re-expressed as a time bound; the
    only deployable streaming unique at scale).

    Dups inside the watermark window are dropped; the same value
    re-arriving with a much later event time (after the watermark
    passed its first occurrence) is emitted again — exactly the
    documented within-watermark contract."""
    from streamz_spark.core import Stream

    chunks = [
        # batch 1: v=1 twice (dup within window), v=2 once
        [(0, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:00:05", 1.0),
         (2, "2024-01-01 00:00:10", 2.0)],
        # batches 2-3: day-later events ADVANCE the watermark (state
        # eviction runs at the END of a batch with the watermark
        # computed from the batch before, so the re-arrival needs two
        # batches of separation from the advance)
        [(3, "2024-01-02 00:00:00", 3.0)],
        [(4, "2024-01-02 00:10:00", 4.0)],
        # batch 4: v=1 re-arrives long after its state was evicted
        [(5, "2024-01-02 00:30:00", 1.0)],
    ]
    src = from_iterable(
        spark, chunks, "seq long, ts_s string, value double"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = Stream(src).unique("value", ts_col="ts", watermark="10 minutes")
    batches = sink_to_list(out.to_frame().select("seq", "value"))
    got = pd.concat([b for b in batches if len(b)], ignore_index=True)
    # first occurrences of 1.0/2.0/3.0/4.0 survive; the day-later 1.0
    # in the final batch is re-admitted because its first occurrence's
    # state was evicted once the watermark passed it
    assert sorted(got["value"].tolist()) == [1.0, 1.0, 2.0, 3.0, 4.0]
    assert set(got["seq"]) == {0, 2, 3, 4, 5}
