"""PySpark-4 Python DataSource API sources (SURVEY.md §2.2 gap-close).

Covers the reference sources that have no built-in Spark equivalent:

| reference                          | here                              |
|------------------------------------|-----------------------------------|
| from_kafka[_batched]               | ``from_filelog`` — a CLEARLY-     |
| (sources.py:392-762)               | MARKED file-backed substitute     |
|                                    | with real Kafka *consumer*        |
|                                    | semantics: partitions, monotonic  |
|                                    | offsets, checkpointed exactly-    |
|                                    | once recovery, distributed reads  |
|                                    | (the real connector path is       |
|                                    | sources.from_kafka, jar-gated)    |
| from_http_server (sources.py:274)  | ``from_http_server``              |
| from_process (sources.py:333)      | ``from_process``                  |
| from_q (sources.py:842)            | ``from_q`` (queue→log bridge)     |
| from_websocket (sources.py:799)    | ``from_websocket`` (lib-gated)    |
| from_mqtt (sources.py:880)         | ``from_mqtt`` (lib-gated)         |

Design notes (100 TB hat): the *log* source is the scale path — offset
ranges shard per log-partition into InputPartitions, so reads execute
on executors and parallelism equals partition count, exactly like the
Kafka connector. The HTTP/process/queue sources are driver-side
SimpleDataSourceStreamReader prototyping sources (low-volume edge
ingestion), mirroring the reference's single-threaded event-loop
sources; production volume belongs on the log/Kafka path.
"""

from __future__ import annotations

import json
import os
import queue as _queue
import threading
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = [
    "filelog_append",
    "from_filelog",
    "from_http_server",
    "from_process",
    "from_q",
    "from_websocket",
    "from_mqtt",
    "register_datasources",
    "to_filelog",
]

_EPOCH_US = 1_000_000


def _us_to_naive_utc(us: int) -> datetime:
    return datetime.fromtimestamp(us / _EPOCH_US, tz=timezone.utc).replace(tzinfo=None)


# ---------------------------------------------------------------------------
# File-backed partitioned log (Kafka-substitute; see module docstring)
# ---------------------------------------------------------------------------

def filelog_append(path: str, records, partition: int = 0) -> int:
    """Append records to one log partition; returns the new end offset.

    The producer analogue of the reference's to_kafka (sinks.py:116).
    Each call writes ONE immutable segment file named
    ``<start-offset>-<count>.jsonl`` (atomic tmp+rename), so concurrent
    readers never see partial segments. Records: str | (key, value) |
    dict with key/value.
    """
    pdir = os.path.join(path, f"p={partition}")
    os.makedirs(pdir, exist_ok=True)
    rows = []
    now_us = int(time.time() * _EPOCH_US)
    for rec in records:
        if isinstance(rec, tuple):
            key, value = rec
        elif isinstance(rec, dict):
            key, value = rec.get("key"), rec.get("value")
        else:
            key, value = None, rec
        rows.append({"key": key, "value": value, "ts": now_us})
    tmp = os.path.join(pdir, f".tmp-{os.getpid()}-{now_us}.jsonl")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # os.link is atomic-fail-if-exists: two concurrent producers that
    # computed the same start offset cannot clobber each other — the
    # loser recomputes the end offset and retries (compare-and-swap).
    while True:
        start = _partition_end_offset(pdir)
        final = os.path.join(pdir, f"{start:012d}-{len(rows)}.jsonl")
        try:
            os.link(tmp, final)
            break
        except FileExistsError:
            continue
    os.unlink(tmp)
    return start + len(rows)


def _segments(pdir: str) -> list[tuple[int, int, str]]:
    """[(start_offset, count, filepath)] sorted by start offset."""
    out = []
    if not os.path.isdir(pdir):
        return out
    for name in os.listdir(pdir):
        if name.startswith(".") or not name.endswith(".jsonl"):
            continue
        stem = name[: -len(".jsonl")]
        start_s, _, count_s = stem.partition("-")
        out.append((int(start_s), int(count_s), os.path.join(pdir, name)))
    out.sort()
    return out


def _partition_end_offset(pdir: str) -> int:
    segs = _segments(pdir)
    return segs[-1][0] + segs[-1][1] if segs else 0


def _log_partitions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(path) if d.startswith("p=")
    )


class _FileLogStreamReader(DataSourceStreamReader):
    """Offset model identical to the Kafka source: a dict of
    ``{partition: next_offset}``; ranges shard into one InputPartition
    per log partition and are read ON EXECUTORS."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("filelog source requires option 'path'")
        self.from_beginning = options.get("startingoffsets", "earliest") != "latest"

    def initialOffset(self) -> dict:
        if self.from_beginning:
            return {str(p): 0 for p in _log_partitions(self.path)}
        return {
            str(p): _partition_end_offset(os.path.join(self.path, f"p={p}"))
            for p in _log_partitions(self.path)
        }

    def latestOffset(self) -> dict:
        return {
            str(p): _partition_end_offset(os.path.join(self.path, f"p={p}"))
            for p in _log_partitions(self.path)
        }

    def partitions(self, start: dict, end: dict):
        parts = []
        for p, e in end.items():
            s = start.get(p, 0)
            if e > s:
                parts.append(InputPartition((self.path, int(p), s, e)))
        # nothing new: Spark still wants >=1 partition for the batch plan
        return parts or [InputPartition((self.path, -1, 0, 0))]

    def read(self, partition):
        path, pid, start, end = partition.value
        if pid < 0:
            return
        pdir = os.path.join(path, f"p={pid}")
        for seg_start, count, fpath in _segments(pdir):
            if seg_start + count <= start or seg_start >= end:
                continue
            with open(fpath) as f:
                for i, line in enumerate(f):
                    off = seg_start + i
                    if off < start or off >= end:
                        continue
                    rec = json.loads(line)
                    yield (
                        rec.get("key"),
                        rec.get("value"),
                        pid,
                        off,
                        _us_to_naive_utc(rec["ts"]),
                    )

    def commit(self, end: dict) -> None:
        # Segments are immutable and replayable; retention/compaction is
        # the producer's concern (like Kafka's broker-side retention).
        pass


class FileLogDataSource(DataSource):
    """``format("filelog")`` — partitioned append-only JSONL log."""

    @classmethod
    def name(cls) -> str:
        return "filelog"

    def schema(self) -> str:
        # mirrors the Kafka source's projection after the usual
        # CAST(key/value AS STRING)
        return "key string, value string, partition int, offset long, timestamp timestamp"

    def streamReader(self, schema):
        return _FileLogStreamReader(self.options)


# ---------------------------------------------------------------------------
# Driver-side edge sources (SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------

class _BufferedSimpleReader(SimpleDataSourceStreamReader):
    """Shared offset plumbing: a background producer appends rows to an
    in-memory list; offsets are indexes into it. readBetweenOffsets
    replays from the retained buffer; commit(end) trims rows below the
    committed offset so long-running sources don't grow without bound
    (at-least-once across driver restarts only within buffer lifetime —
    same guarantee level as the reference's non-Kafka sources, which
    lose in-flight data on crash)."""

    def __init__(self):
        self._buf: list[tuple] = []
        self._base = 0  # absolute offset of _buf[0]
        self._lock = threading.Lock()
        self._started = False

    # Spark pickles the reader into the execution plan (the prefetch
    # wrapper ships buffered rows to executors); locks/threads/servers
    # must stay driver-side. The buffer itself is a plain list and
    # travels fine for readBetweenOffsets replay.
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_lock"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def _start(self) -> None:  # pragma: no cover - overridden
        raise NotImplementedError

    def _ensure_started(self):
        if not self._started:
            self._started = True
            self._start()

    def _append(self, row: tuple):
        with self._lock:
            self._buf.append(row)

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        self._ensure_started()
        with self._lock:
            end = self._base + len(self._buf)
            rows = list(self._buf[max(start["index"] - self._base, 0):])
        return iter(rows), {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        with self._lock:
            lo = max(start["index"] - self._base, 0)
            hi = max(end["index"] - self._base, 0)
            return iter(self._buf[lo:hi])

    def commit(self, end: dict) -> None:
        # committed rows can't be replayed again — release them
        with self._lock:
            drop = max(end["index"] - self._base, 0)
            if drop:
                del self._buf[:drop]
                self._base += drop


class _HTTPServerReader(_BufferedSimpleReader):
    def __init__(self, options):
        super().__init__()
        self.host = options.get("host", "localhost")
        self.port = int(options.get("port", 9999))

    def _start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        append = self._append

        class Handler(BaseHTTPRequestHandler):
            # reference from_http_server (sources.py:310-329): POST body
            # becomes one event; 200 ack after buffering.
            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode("utf-8", "replace")
                append((body, self.path, _us_to_naive_utc(int(time.time() * _EPOCH_US))))
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        server = ThreadingHTTPServer((self.host, self.port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()


class HTTPServerDataSource(DataSource):
    """``format("http_server")`` — reference from_http_server
    (sources.py:274-329): an HTTP endpoint whose POST bodies become
    rows (body, path, timestamp)."""

    @classmethod
    def name(cls) -> str:
        return "http_server"

    def schema(self) -> str:
        return "body string, path string, timestamp timestamp"

    def simpleStreamReader(self, schema):
        return _HTTPServerReader(self.options)


class _ProcessReader(_BufferedSimpleReader):
    def __init__(self, options):
        super().__init__()
        cmd = options.get("cmd")
        if not cmd:
            raise ValueError("process source requires option 'cmd'")
        self.cmd = cmd
        self.with_stderr = options.get("with_stderr", "false").lower() == "true"
        self.with_end_signal = options.get("with_end_signal", "false").lower() == "true"

    def _start(self):
        import subprocess

        proc = subprocess.Popen(
            self.cmd,
            shell=True,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT if self.with_stderr else subprocess.DEVNULL,
            text=True,
        )

        def pump():
            for line in proc.stdout:
                self._append((line.rstrip("\n"), _us_to_naive_utc(int(time.time() * _EPOCH_US))))
            proc.wait()
            if self.with_end_signal:
                # reference with_end_streams sentinel (sources.py:352-357)
                self._append((None, _us_to_naive_utc(int(time.time() * _EPOCH_US))))

        threading.Thread(target=pump, daemon=True).start()


class ProcessDataSource(DataSource):
    """``format("process")`` — reference from_process (sources.py:333-388):
    run a shell command, one row per stdout line."""

    @classmethod
    def name(cls) -> str:
        return "process"

    def schema(self) -> str:
        return "line string, timestamp timestamp"

    def simpleStreamReader(self, schema):
        return _ProcessReader(self.options)


# ---------------------------------------------------------------------------
# registration + user-facing helpers
# ---------------------------------------------------------------------------

def register_datasources(spark: SparkSession) -> None:
    """Register all Python data sources on a session. Re-registration
    replaces the previous entry and is cheap, so no caching — an
    id(spark)-keyed cache would break when a new session reuses a
    collected session's memory address."""
    for cls in (FileLogDataSource, HTTPServerDataSource, ProcessDataSource):
        spark.dataSource.register(cls)


def from_filelog(
    spark: SparkSession, path: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Stream a partitioned file-backed log with Kafka consumer
    semantics — the in-container substitute for from_kafka (the real
    connector needs the spark-sql-kafka jar; see sources.from_kafka)."""
    register_datasources(spark)
    return (
        spark.readStream.format("filelog")
        .option("path", path)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def from_http_server(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """HTTP POST endpoint → stream of (body, path, timestamp)."""
    register_datasources(spark)
    return (
        spark.readStream.format("http_server")
        .option("host", host).option("port", str(port)).load()
    )


def from_process(
    spark: SparkSession, cmd: str,
    with_stderr: bool = False, with_end_signal: bool = False,
) -> DataFrame:
    """Subprocess stdout → stream of (line, timestamp)."""
    register_datasources(spark)
    return (
        spark.readStream.format("process")
        .option("cmd", cmd)
        .option("with_stderr", str(with_stderr).lower())
        .option("with_end_signal", str(with_end_signal).lower())
        .load()
    )


def to_filelog(
    df: DataFrame, path: str,
    value_col: str | None = None, key_col: str | None = None,
    partition: int = 0, num_partitions: int | None = None, timeout: int = 300,
):
    """foreachBatch producer onto the file-backed log — the substitute
    for reference to_kafka (sinks.py:116-195). Each micro-batch appends
    immutable segments (at-least-once: a retried batch re-appends;
    Kafka's producer has the same default semantics without idempotence).

    The append runs EXECUTOR-side via ``foreachPartition`` — each Spark
    task writes its own segment directly into the log's partition dir
    (``filelog_append``'s os.link compare-and-swap makes concurrent
    appenders safe), so sink throughput scales with the cluster instead
    of being capped by a driver collect. The log dir must be on storage
    all executors can reach — true for the local-mode test substitute
    and for any shared filesystem.

    ``num_partitions`` with a ``key_col`` gives Kafka's keyed routing:
    records go to ``crc32(key) % num_partitions``. When routing is
    active the batch is repartitioned on the computed target first, so
    exactly ONE task owns each target partition per micro-batch — one
    segment per (batch, target), making per-key order within a batch
    well-defined (the owning task's row order) as well as across
    batches. Without routing, all records land in the fixed
    ``partition``.
    """
    from pyspark.sql import functions as F

    from streamz_spark.streaming.sinks import sink_foreach_batch

    log_path, vcol_opt, kcol, fixed_part, n_parts = (
        path, value_col, key_col, partition, num_partitions,
    )

    def send(batch_df, batch_id):
        vcol = vcol_opt or next(c for c in batch_df.columns if c != kcol)
        cols = [kcol, vcol] if kcol else [vcol]
        sel = batch_df.select(*cols)
        routed = bool(kcol and n_parts)
        if routed:
            # target = crc32(utf-8 key) & 0x7FFFFFFF % n (sign bit
            # cleared); null keys route like the string "None" (Python
            # str() semantics — crc32(NULL) would otherwise yield a
            # NULL target and a poisonous "p=None" partition dir).
            # Repartitioning on the TARGET id — not the raw key —
            # guarantees one task per target partition.
            target_expr = (
                F.crc32(
                    F.coalesce(F.col(kcol).cast("string"), F.lit("None"))
                    .cast("binary")
                )
                .bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(n_parts)
            ).cast("int")
            sel = sel.withColumn("__target", target_expr).repartition(
                n_parts, "__target"
            )

        def append_partition(rows):
            # runs on the executor; one filelog segment per (task, target)
            by_target: dict[int, list] = {}
            for r in rows:
                if routed:
                    by_target.setdefault(r["__target"], []).append(
                        (r[kcol], str(r[vcol]))
                    )
                elif kcol:
                    by_target.setdefault(fixed_part, []).append(
                        (r[kcol], str(r[vcol]))
                    )
                else:
                    by_target.setdefault(fixed_part, []).append(str(r[vcol]))
            for target, records in by_target.items():
                filelog_append(log_path, records, partition=target)

        sel.foreachPartition(append_partition)

    return sink_foreach_batch(df, send, timeout=timeout)


def from_q(
    spark: SparkSession, q: "_queue.Queue", log_dir: str, poll_interval: float = 0.05
) -> DataFrame:
    """Driver-side queue → stream (reference from_q, sources.py:842-877).

    A live Queue can't cross the DataSource option boundary (strings
    only), so a daemon thread drains it into a filelog partition and
    the stream reads the log — which also upgrades the reference's
    at-most-once queue semantics to replayable offsets."""

    def drain():
        while True:
            items = []
            try:
                items.append(q.get(timeout=poll_interval))
                while True:
                    items.append(q.get_nowait())
            except _queue.Empty:
                pass
            if items:
                filelog_append(log_dir, [str(x) for x in items])

    threading.Thread(target=drain, daemon=True).start()
    return from_filelog(spark, log_dir)


def from_websocket(spark: SparkSession, host: str, port: int, log_dir: str, **connect_kwargs) -> DataFrame:
    """Websocket server → stream (reference from_websocket,
    sources.py:799-839). Uses the ``websockets`` package when
    installed; otherwise the built-in RFC 6455 fallback
    (streaming/ws.py) serves the same live path — no gate either way.
    Messages land in a filelog partition, which upgrades the
    reference's fire-and-forget delivery to replayable offsets."""
    try:
        import websockets  # noqa: F401

        import asyncio

        async def handler(ws):  # pragma: no cover - needs websockets lib
            async for msg in ws:
                filelog_append(log_dir, [msg if isinstance(msg, str) else msg.decode()])

        async def serve():  # pragma: no cover
            async with websockets.serve(handler, host, port, **connect_kwargs):
                await asyncio.Future()

        threading.Thread(target=lambda: asyncio.run(serve()), daemon=True).start()
    except ImportError:
        from streamz_spark.streaming.ws import WSServer

        WSServer(host, port, lambda msg: filelog_append(log_dir, [msg])).start()
    return from_filelog(spark, log_dir)


def from_mqtt(spark: SparkSession, host: str, port: int, topic: str, log_dir: str) -> DataFrame:
    """MQTT subscription → stream (reference from_mqtt,
    sources.py:880-932). Uses ``paho-mqtt`` when installed; otherwise
    the built-in MQTT 3.1.1 QoS-0 fallback (streaming/mqtt.py) — live
    either way. Messages land in a filelog partition keyed by topic,
    upgrading the reference's fire-and-forget delivery to replayable
    offsets."""
    try:
        import paho.mqtt.client as mqtt  # noqa: F401

        def on_message(client, userdata, msg):  # pragma: no cover - needs paho
            filelog_append(log_dir, [(msg.topic, msg.payload.decode())])

        client = mqtt.Client()  # pragma: no cover
        client.on_message = on_message  # pragma: no cover
        client.connect(host, port)  # pragma: no cover
        client.subscribe(topic)  # pragma: no cover
        client.loop_start()  # pragma: no cover
    except ImportError:
        from streamz_spark.streaming.mqtt import MQTTClient

        client = MQTTClient(host, port)
        client.subscribe(
            topic, lambda t, payload: filelog_append(log_dir, [(t, payload)])
        )
    return from_filelog(spark, log_dir)
