"""RocksDB state-store provider runs (SCALE.md 'streaming state').

SCALE.md claims the stateful operators shard state into a
RocksDB-backed store at production scale; these tests actually run
that provider locally (it ships inside Spark — no extra jar):

1. the streaming near-dup TTL path under RocksDB, cross-batch pair
   detection + eviction intact;
2. a 10^6-row ingest through a keyed stateful accumulate with 10^4
   state keys — state row count read back from query progress, result
   differential-checked against the batch plan.

Both tests assert RocksDB artifacts (sst/zip/changelog files) exist in
the checkpoint's state directory, so a silently-ignored conf can't
fake a pass.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb(spark):
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, ROCKSDB)
    yield spark
    if prev is None:
        spark.conf.unset(_PROVIDER_CONF)
    else:
        spark.conf.set(_PROVIDER_CONF, prev)


def _assert_rocksdb_artifacts(checkpoint: str):
    exts = set()
    for root, _dirs, files in os.walk(os.path.join(checkpoint, "state")):
        for f in files:
            exts.add(f.rsplit(".", 1)[-1])
    assert exts & {"sst", "zip", "changelog"}, (
        f"no RocksDB artifacts under {checkpoint}/state — provider not active? exts={exts}"
    )


def test_rocksdb_neardup_ttl_cross_batch(rocksdb, tmp_path):
    # the TTL'd near-dup path (ProcessingTimeTimeout: availableNow never
    # settles, so drive with a processingTime trigger + progress polls)
    # on the RocksDB provider, with an explicit checkpoint we can audit
    from streamz_spark.streaming.datasources import filelog_append, from_filelog
    from streamz_spark.streaming.stateful import streaming_minhash_neardup

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    near = base.replace("afternoon", "evening")
    log = str(tmp_path / "log")
    filelog_append(log, [("1", base)])

    src = from_filelog(rocksdb, log).selectExpr(
        "cast(key as long) as doc_id", "value as text"
    )
    out = streaming_minhash_neardup(src, min_est_jaccard=0.5, ttl=600.0)
    rows: list = []
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
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
        wait_processed(1)
        filelog_append(log, [("3", near)])
        t0 = time.time()
        while time.time() - t0 < 120 and not rows:
            time.sleep(0.2)
    finally:
        q.stop()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 3) in pairs and all(p == (1, 3) for p in pairs), pairs
    _assert_rocksdb_artifacts(ckpt)


def test_rocksdb_million_row_keyed_state(rocksdb, tmp_path):
    # 10^6 ingested rows in 4 micro-batches over 10^4 state keys:
    # the SCALE.md sizing point. Wall time is printed for SCALE.md;
    # state row count comes from the query's own progress metrics.
    from streamz_spark.streaming.sources import from_directory
    from streamz_spark.streaming.stateful import running_sum

    n_rows, n_keys, n_chunks = 1_000_000, 10_000, 4
    src = str(tmp_path / "src")
    per = n_rows // n_chunks
    for i in range(n_chunks):
        (
            rocksdb.range(i * per, (i + 1) * per)
            .select(
                (F.col("id") % n_keys).alias("user_id"),
                (F.col("id") % 97).cast("double").alias("value"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"chunk={i:05d}"))
        )
    stream = from_directory(
        rocksdb, os.path.join(src, "chunk=*"), "user_id long, value double",
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    sums = running_sum(stream, "user_id")

    batches: list = []
    ckpt = str(tmp_path / "ckpt2")
    writer = (
        sums.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, i: batches.append((i, b.toPandas())))
    )
    t0 = time.perf_counter()
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(600), "stream did not drain"
    dt = time.perf_counter() - t0
    progress = q.recentProgress
    state_rows = max(
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    )
    assert state_rows == n_keys, state_rows
    _assert_rocksdb_artifacts(ckpt)

    # differential: final per-key running sums == batch groupBy
    import pandas as pd

    batches.sort(key=lambda t: t[0])
    final = (
        pd.concat(
            [b.assign(__b=i) for i, (_, b) in enumerate(batches) if len(b)],
            ignore_index=True,
        )
        .sort_values("__b")
        .groupby("user_id", as_index=False)
        .last()
        .drop(columns="__b")
    )
    want = (
        rocksdb.range(n_rows)
        .select(
            (F.col("id") % n_keys).alias("user_id"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        .groupBy("user_id")
        .agg(F.sum("value").alias("running_sum"))
        .toPandas()
    )
    m = final.merge(want, on="user_id", suffixes=("_got", "_want"))
    assert len(m) == n_keys
    assert (m["running_sum_got"] == m["running_sum_want"]).all()
    print(
        f"\nrocksdb 1M-row ingest: {dt:.2f}s wall, {n_keys} state rows, "
        f"{n_chunks} micro-batches"
    )


_TWS_AVAILABLE = __import__("streamz_spark.streaming.tws", fromlist=["tws_runtime_available"]).tws_runtime_available()
tws_gate = pytest.mark.skipif(
    not _TWS_AVAILABLE,
    reason="transformWithState needs a google.protobuf runtime (none in "
    "site-packages AND no recoverable offline bundle — probed by "
    "streamz_spark.streaming.tws.ensure_protobuf_runtime; see "
    "scripts/probe_tws.py)",
)


@tws_gate
def test_tws_running_sum_matches_classic(rocksdb, tmp_path):
    # transformWithStateInPandas (Spark 4 typed-state API) differential
    # vs the applyInPandasWithState implementation on the same replay
    import pandas as pd

    from streamz_spark.streaming.sinks import sink_to_list
    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.stateful import running_sum
    from streamz_spark.streaming.tws import running_sum_tws

    chunks = [
        pd.DataFrame({"user_id": [1, 2, 1], "value": [1.0, 2.0, 3.0]}),
        pd.DataFrame({"user_id": [2, 2, 3], "value": [5.0, 7.0, 11.0]}),
    ]

    def last_per_key(batches):
        allb = pd.concat(
            [b.assign(__b=i) for i, b in enumerate(batches) if len(b)],
            ignore_index=True,
        )
        return (
            allb.sort_values("__b").groupby("user_id", as_index=False).last()
            .drop(columns="__b").sort_values("user_id", ignore_index=True)
        )

    got_tws = last_per_key(
        sink_to_list(
            running_sum_tws(
                from_iterable(rocksdb, chunks, "user_id long, value double"),
                "user_id",
            ),
            output_mode="update",
        )
    )
    got_classic = last_per_key(
        sink_to_list(
            running_sum(
                from_iterable(rocksdb, chunks, "user_id long, value double"),
                "user_id",
            ),
            output_mode="update",
        )
    )
    pd.testing.assert_frame_equal(got_tws, got_classic)
    assert got_tws["running_sum"].tolist() == [4.0, 14.0, 11.0]


@tws_gate
def test_tws_count_window_matches_classic(rocksdb):
    import pandas as pd

    from streamz_spark.streaming.sinks import sink_to_list
    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.stateful import count_window_sum
    from streamz_spark.streaming.tws import count_window_sum_tws

    chunks = [
        pd.DataFrame({"user_id": [1] * 4, "value": [1.0, 2.0, 3.0, 4.0]}),
        pd.DataFrame({"user_id": [1] * 2, "value": [5.0, 6.0]}),
    ]
    mk = lambda: from_iterable(rocksdb, chunks, "user_id long, value double")
    tws = pd.concat(
        [b for b in sink_to_list(count_window_sum_tws(mk(), "user_id", n=3),
                                 output_mode="update") if len(b)],
        ignore_index=True,
    )
    classic = pd.concat(
        [b for b in sink_to_list(count_window_sum(mk(), "user_id", n=3),
                                 output_mode="update") if len(b)],
        ignore_index=True,
    )
    # per-batch emits: after batch1 tail=[2,3,4] sum 9; after batch2
    # tail=[4,5,6] sum 15
    assert tws["window_sum"].tolist() == classic["window_sum"].tolist() == [9.0, 15.0]
    assert tws["window_len"].tolist() == [3, 3]


def test_tws_requires_rocksdb(spark):
    import pandas as pd
    import pytest

    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.tws import running_sum_tws

    # default (HDFS-backed) provider: actionable error, not a Py4J dump
    chunks = [pd.DataFrame({"user_id": [1], "value": [1.0]})]
    src = from_iterable(spark, chunks, "user_id long, value double")
    with pytest.raises(RuntimeError, match="RocksDB state store|protobuf"):
        running_sum_tws(src, "user_id")


def test_rocksdb_zip_latest_stream(rocksdb, tmp_path):
    # the live zip_latest combinator on the RocksDB provider: two
    # side-tagged chunks replay through the keyed state store and each
    # left event pairs with the latest right value seen so far
    import pandas as pd

    from streamz_spark.streaming.sources import from_directory
    from streamz_spark.streaming.stateful import zip_latest_stream

    src = str(tmp_path / "zsrc")
    rows = [
        # (key, ts_sec, side, value): side 0 = right feed, 1 = left
        (1, 10, 0, 100.0), (1, 20, 1, 1.0), (1, 30, 0, 200.0),
        (2, 15, 1, 5.0),
    ]
    rows2 = [
        (1, 40, 1, 2.0),          # pairs with 200.0 carried in state
        (2, 45, 0, 300.0), (2, 50, 1, 6.0),
    ]
    for i, chunk in enumerate((rows, rows2)):
        rocksdb.createDataFrame(
            [(k, float(t), s, v) for k, t, s, v in chunk],
            "user_id long, tsec double, side int, value double",
        ).selectExpr(
            "user_id", "timestamp_seconds(tsec) as ts", "side", "value"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk={i:05d}")
        )
    stream = from_directory(
        rocksdb, os.path.join(src, "chunk=*"),
        "user_id long, ts timestamp, side int, value double",
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    out = zip_latest_stream(
        stream.filter(F.col("side") == 1),
        stream.filter(F.col("side") == 0),
        key="user_id",
    )
    batches: list = []
    ckpt = str(tmp_path / "zckpt")
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, i: batches.append(b.toPandas()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = (
        pd.concat(batches, ignore_index=True)
        .sort_values(["user_id", "ts"], ignore_index=True)
    )
    want = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "value": [1.0, 2.0, 5.0, 6.0],
            "latest_right": [100.0, 200.0, None, 300.0],
        }
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["value"].tolist() == want["value"].tolist()
    assert got["latest_right"].fillna(-1).tolist() == want["latest_right"].fillna(-1).tolist()
    _assert_rocksdb_artifacts(ckpt)



def test_rocksdb_minhash_soak_million_band_rows():
    """SCALE.md 'a year of ingest cannot OOM the store', measured:
    10^6 rows THROUGH THE STATE STORE (62,500 docs x 16 LSH band
    rows) on the RocksDB provider with a TTL (30 s) shorter than the
    run, across 4 availableNow micro-batches. Runs as a subprocess
    with its own local[$cpus] JVM (scripts/soak_minhash_rocksdb.py):
    the shared 8-core test session leaves 3/4 of the machine idle and
    the soak is Python-state-worker-bound — measured 572 s in-session
    vs ~3 min standalone. Asserts every row processed, planted
    near-dup pairs detected, TTL eviction engaged (peak state well
    below the cumulative 10^6 inserts), RocksDB artifacts present.
    The per-batch latency / state-size curve is printed and recorded
    in SCALE.md."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "soak_minhash_rocksdb.py",
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(os.cpu_count() or 8))
    proc = subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    r = json.loads(proc.stdout.strip().splitlines()[-1])
    print(f"\nminhash soak: {r}")
    assert r["drained"], "soak stream did not drain"
    assert r["docs"] >= 62_500 and r["band_rows"] >= 1_000_000
    assert r["rocksdb_artifacts"]
    # 10^6 bucket rows inserted; TTL bounds the live set to ~the most
    # recent batches instead of full history
    assert r["peak_state"] < 700_000, r
    assert r["final_state"] < r["band_rows"], "TTL eviction never engaged"
    assert r["planted_detected"] >= int(r["planted"] * 0.9), r


@tws_gate
def test_tws_declarative_ttl_expires_value_state(rocksdb, tmp_path):
    # the TWS capability the classic API can't express: the state
    # store itself expires idle entries (getValueState ttlDurationMs)
    # — no hand-rolled timestamp arrays, no timeout sweeps. had_state
    # makes expiry observable from the output: a key re-arriving
    # within the TTL sees its state; after a silent TTL it does not.
    from streamz_spark.streaming.datasources import filelog_append, from_filelog
    from streamz_spark.streaming.tws import latest_value_ttl_tws

    # wide margins: batch scheduling latency (worker startup, 300ms
    # trigger) must stay well inside the TTL for the "within" probe
    ttl_ms = 15_000
    log = str(tmp_path / "ttl_log")
    filelog_append(log, [("1", "10.0")])
    src = from_filelog(rocksdb, log).selectExpr(
        "cast(key as long) as user_id", "cast(value as double) as value"
    )
    out = latest_value_ttl_tws(src, "user_id", ttl_ms=ttl_ms)
    rows: list = []
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_rows(n, timeout=90):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if len(rows) >= n:
                return
            time.sleep(0.2)
        raise TimeoutError(f"only {len(rows)} of {n} emits arrived")

    try:
        wait_rows(1)
        # re-arrive WITHIN the TTL: state must still exist
        filelog_append(log, [("1", "11.0")])
        wait_rows(2)
        # go silent past the TTL, then re-arrive: state must be gone
        time.sleep(ttl_ms / 1000 + 5)
        filelog_append(log, [("1", "12.0")])
        wait_rows(3)
    finally:
        q.stop()
    by_value = {r["latest"]: r["had_state"] for r in rows}
    assert by_value[10.0] is False          # first ever event: no state
    assert by_value[11.0] is True           # within TTL: state visible
    assert by_value[12.0] is False, rows    # after silent TTL: expired


@tws_gate
def test_tws_mapstate_frequencies_matches_batch(rocksdb):
    # MapState (the third typed state variable) keeps a per-key
    # histogram across micro-batches; the final emission per key must
    # equal the batch groupBy count over the full replay
    import pandas as pd

    from streamz_spark.streaming.sinks import sink_to_list
    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.tws import frequencies_tws

    chunks = [
        pd.DataFrame({"user_id": [1, 1, 2], "event_type": ["a", "b", "a"]}),
        pd.DataFrame({"user_id": [1, 2, 2], "event_type": ["a", "a", "c"]}),
    ]
    batches = sink_to_list(
        frequencies_tws(
            from_iterable(rocksdb, chunks, "user_id long, event_type string"),
            "user_id",
        ),
        output_mode="update",
    )
    allb = pd.concat(
        [b.assign(__b=i) for i, b in enumerate(batches) if len(b)],
        ignore_index=True,
    )
    final = (
        allb.sort_values("__b")
        .groupby(["user_id", "category"], as_index=False)
        .last()
        .drop(columns="__b")
    )
    got = {
        (r.user_id, r.category): r["count"] for _, r in final.iterrows()
    }
    want = {(1, "a"): 2, (1, "b"): 1, (2, "a"): 2, (2, "c"): 1}
    assert got == want, got


@tws_gate
def test_tws_timer_closes_idle_session(rocksdb, tmp_path):
    # the timer capability: after gap_ms of silence the session closes
    # and emits FROM handleExpiredTimer — no new input for the key.
    # Events in two quick batches merge into one session (the timer
    # slides); the emit appears only after the gap elapses.
    from streamz_spark.streaming.datasources import filelog_append, from_filelog
    from streamz_spark.streaming.tws import session_gap_tws

    # wide margin: the second event must be processed well inside the
    # gap despite batch-scheduling latency
    gap_ms = 15_000
    log = str(tmp_path / "sess_log")
    filelog_append(log, [("1", "10.0")])
    src = from_filelog(rocksdb, log).selectExpr(
        "cast(key as long) as user_id", "cast(value as double) as value"
    )
    out = session_gap_tws(src, "user_id", gap_ms=gap_ms)
    rows: list = []
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_input(n, timeout=90):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if sum(int(p["numInputRows"]) for p in q.recentProgress) >= n:
                return
            time.sleep(0.2)
        raise TimeoutError("input never processed")

    try:
        wait_input(1)
        filelog_append(log, [("1", "32.0")])  # same session: slides the timer
        wait_input(2)
        assert not rows, "session closed while events were still arriving"
        t0 = time.time()
        while time.time() - t0 < gap_ms / 1000 + 45 and not rows:
            time.sleep(0.3)
    finally:
        q.stop()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r["user_id"], r["n_events"], r["total"]) == (1, 2, 42.0), rows


def test_protobuf_recovery_scoped_to_protobuf_only():
    # ADVICE r5: the offline-bundle recovery must not expose the
    # bundle's other vendored top-level packages (appengine, oauth2,
    # pyglib) to the driver/workers, must APPEND (installed packages
    # always win), and must only engage when protobuf is missing
    import importlib.util
    import os
    import sys

    from streamz_spark.streaming.tws import ensure_protobuf_runtime

    src = ensure_protobuf_runtime()
    if src is None:
        pytest.skip("no protobuf runtime in this environment")
    if src == "site-packages":
        return  # nothing was wired; nothing to scope-check
    entries = [p for p in sys.path if p != src and "pb_shim" in p]
    assert entries, "bundle recovery should go through the scoped shim"
    shim = entries[0]
    assert sys.path.index(shim) > 0  # appended, not prepended
    # only google.protobuf resolves through the shim — none of the
    # bundle's other vendored packages leak into the import system
    assert importlib.util.find_spec("google.protobuf") is not None
    for vendored in ("google.appengine", "google.pyglib"):
        assert importlib.util.find_spec(vendored) is None
    # workers inherit the same scoped entry
    assert shim in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_streaming_pretrain_pipeline_restart_continuation(rocksdb, tmp_path):
    # VERDICT r5 #2: the streaming pretraining-pipeline counterpart
    # must survive a mid-corpus restart on the RocksDB provider — the
    # LSH bucket state persists in the checkpoint, so near-dup pairs
    # spanning the restart boundary (doc in chunk 1, its dup in chunk
    # 3) are still detected, and the combined pair set equals a
    # one-shot run over the whole corpus
    import glob

    from pyspark.sql import functions as F

    from streamz_spark.io import load_table
    from streamz_spark.streaming.sources import from_directory
    from streamz_spark.streaming.stateful import streaming_minhash_neardup

    from .conftest import SF_DIR
    from .test_stream_batch_matrix import _quality_lang_filter

    spark = rocksdb
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = (int(hi) - int(lo) + 4) // 4
    src_dir, out_dir, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    os.makedirs(src_dir)

    def write_chunk(i):
        docs.filter(
            (F.col("doc_id") >= int(lo) + i * span)
            & (F.col("doc_id") < int(lo) + (i + 1) * span)
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"chunk={i:05d}")
        )

    def run_query():
        stream = _quality_lang_filter(
            from_directory(
                spark, os.path.join(src_dir, "chunk=*"), docs.schema,
                one_file_per_trigger=True, pathGlobFilter="*.parquet",
            )
        )
        q = (
            streaming_minhash_neardup(
                stream, num_perm=64, bands=16, min_est_jaccard=0.0, k=3
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # first half of the corpus, then STOP (availableNow drains + exits)
    write_chunk(0); write_chunk(1)
    run_query()
    mid_pairs = {
        (r.id_a, r.id_b) for r in spark.read.parquet(out_dir).collect()
    }
    _assert_rocksdb_artifacts(ckpt)

    # second half arrives after the restart: bucket state from the
    # checkpoint must pair new docs against pre-restart members
    write_chunk(2); write_chunk(3)
    run_query()
    got = {(r.id_a, r.id_b) for r in spark.read.parquet(out_dir).collect()}
    assert got >= mid_pairs

    # one-shot reference over the same corpus (fresh state/checkpoint)
    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    stream = _quality_lang_filter(
        from_directory(
            spark, os.path.join(src_dir, "chunk=*"), docs.schema,
            one_file_per_trigger=True, pathGlobFilter="*.parquet",
        )
    )
    q = (
        streaming_minhash_neardup(
            stream, num_perm=64, bands=16, min_est_jaccard=0.0, k=3
        )
        .writeStream.format("parquet")
        .option("path", ref_out)
        .option("checkpointLocation", ref_ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    want = {(r.id_a, r.id_b) for r in spark.read.parquet(ref_out).collect()}
    assert got == want, (
        f"restarted run found {len(got)} pairs, one-shot {len(want)}"
    )
    # cross-restart pairs actually exist (doc before the boundary
    # paired with a doc after it) — otherwise this test proves nothing
    boundary = int(lo) + 2 * span
    assert any(a < boundary <= b for a, b in got), (
        "corpus has no near-dup pair spanning the restart boundary"
    )


def test_streaming_semdedup_rocksdb_cross_batch_and_ttl(rocksdb, tmp_path):
    # ingest-time SemDeDup on the production provider: a duplicate
    # arriving BATCHES after its original must pair via the cell state
    # (cross-batch detection), and with a ttl an idle member must be
    # evicted so a later duplicate does NOT pair (bounded state under
    # unbounded ingest — the same contract as streaming_minhash_neardup)
    import json

    import pandas as pd

    from streamz_spark.streaming.datasources import filelog_append, from_filelog
    from streamz_spark.streaming.sinks import sink_to_list
    from streamz_spark.streaming.sources import from_iterable
    from streamz_spark.streaming.stateful import streaming_semdedup

    spark = rocksdb
    base = [1.0] * 8
    off = [0.0] * 7 + [30.0]
    cents = [(0, base), (1, off)]
    chunks = [
        pd.DataFrame({"vec_id": [1, 2], "embedding": [base, off]}),
        pd.DataFrame({"vec_id": [3], "embedding": [[0.0] * 8]}),  # no dup
        pd.DataFrame({"vec_id": [4], "embedding": [base]}),       # dup of 1
    ]
    out = sink_to_list(
        streaming_semdedup(
            from_iterable(spark, chunks, "vec_id long, embedding array<double>"),
            cents, threshold=0.95,
        )
    )
    pairs = {(int(r.id_a), int(r.id_b)) for b in out if len(b)
             for r in b.itertuples(index=False)}
    assert (1, 4) in pairs  # cross-batch via RocksDB cell state
    assert all(a == 1 and b == 4 for a, b in pairs), pairs

    # TTL arm: ProcessingTimeTimeout means availableNow never settles
    # (same caveat as test_rocksdb_neardup_ttl_cross_batch), so drive
    # with a processingTime trigger and real wall-clock between docs
    log = str(tmp_path / "sd_log")
    filelog_append(log, [json.dumps({"vec_id": 10, "v": base})])
    src = from_filelog(spark, log).selectExpr(
        "cast(get_json_object(value, '$.vec_id') as long) as vec_id",
        "from_json(get_json_object(value, '$.v'), 'array<double>') as embedding",
    )
    rows: list = []
    q = (
        streaming_semdedup(src, cents, threshold=0.95, ttl=1.0)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sd_ckpt"))
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .trigger(processingTime="300 milliseconds")
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
        wait_processed(1)
        time.sleep(2.5)  # let doc 10 age past the 1 s TTL
        filelog_append(log, [json.dumps({"vec_id": 11, "v": base})])
        wait_processed(2)
        time.sleep(1.5)  # a few more triggers so any pair would surface
    finally:
        q.stop()
    assert not rows, f"TTL-expired member must not pair: {rows}"


def test_rocksdb_streaming_topk_similarity(rocksdb, tmp_path):
    # streaming top-k ANN on the RocksDB provider: replay the
    # embeddings table in chunks with an explicit checkpoint, assert
    # the final per-query top-k equals the batch brute-force operator
    # and that state stayed bounded (numRowsTotal == |queries| keys —
    # one k-pair state row per query, corpus-size-independent)
    from streamz_spark.io import load_table
    from streamz_spark.operators.similarity import brute_force_topk
    from streamz_spark.streaming.sources import replay_table
    from streamz_spark.streaming.stateful import streaming_topk_similarity

    from .conftest import SF_DIR

    emb = load_table(rocksdb, SF_DIR, "embeddings")
    queries = emb.where("vec_id < 5")
    want = {
        (r["qid"], r["cid"], r["rank"])
        for r in brute_force_topk(emb, queries, k=3).collect()
    }

    stream = replay_table(rocksdb, SF_DIR, "embeddings", chunk_col="vec_id")
    out = streaming_topk_similarity(stream, queries, k=3)
    batches: list = []
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, i: batches.append((i, b.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    last: dict = {}
    for i, rows in sorted(batches):
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["qid"], []).append(r)
        for qid, rs in by_q.items():
            last[qid] = rs
    got = {
        (r["qid"], r["cid"], r["rank"])
        for rs in last.values()
        if isinstance(rs, list)
        for r in rs
    }
    assert got == want
    # bounded state: one state row per query key
    n_state = max(
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert n_state == 5, n_state
    _assert_rocksdb_artifacts(ckpt)


def test_rocksdb_heavy_hitters_restart(rocksdb, tmp_path):
    """Ingest-time Misra-Gries sketch on RocksDB, killed mid-stream and
    resumed from the checkpoint: the carried per-shard counters must
    still yield a candidate set covering every true heavy hitter
    (verified = batch exact), with state bounded at shards rows."""
    import tempfile

    from streamz_spark.io import load_table
    from streamz_spark.queries.extra import _HH_K, _HH_KEY
    from streamz_spark.streaming.stateful import streaming_heavy_hitters

    from .conftest import SF_DIR

    shards = 4
    ev = load_table(rocksdb, SF_DIR, "events").select(F.expr(_HH_KEY).alias("key"))
    n = ev.count()
    want = {
        (r["key"], r["cnt"])
        for r in ev.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * _HH_K > F.lit(n))
        .collect()
    }

    src_dir = tempfile.mkdtemp(prefix="hh_src_")
    ckpt = tempfile.mkdtemp(prefix="hh_ckpt_")
    full = load_table(rocksdb, SF_DIR, "events")
    full.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(src_dir, "chunk=0")
    )
    emits: list = []

    def run_query():
        src = (
            rocksdb.readStream.schema(full.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src_dir, "chunk=*"))
        ).select(F.expr(_HH_KEY).alias("key"))
        out = streaming_heavy_hitters(src, "key", k=_HH_K, shards=shards)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda b, i: emits.append(b.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    run_query()  # phase 1: half the stream, then the query ends
    full.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "chunk=1")
    )
    q = run_query()  # phase 2: resume from checkpoint with the rest

    final: dict = {}
    for batch in emits:
        for r in batch:
            final[r["shard"]] = r
    cand = sorted({int(k) for r in final.values() for k in r["keys"]})
    assert len(cand) <= shards * _HH_K
    got = {
        (r["key"], r["cnt"])
        for r in ev.filter(F.col("key").isin(cand))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * _HH_K > F.lit(n))
        .collect()
    }
    assert got == want
    n_state = max(
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert n_state <= shards, n_state
    _assert_rocksdb_artifacts(ckpt)
