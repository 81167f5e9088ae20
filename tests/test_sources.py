"""Live-source tests: TCP socket word count — the reference's
network wordcount example (streamz tests/test_sources.py:51,
examples/network_wordcount.py) on the Spark socket source.
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

from streamz_spark.streaming.sources import from_socket

LINES = ["hello world", "hello spark", "world of streams"]
EXPECTED = {"hello": 2, "world": 2, "spark": 1, "of": 1, "streams": 1}


def test_socket_wordcount(spark):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        for line in LINES:
            conn.sendall((line + "\n").encode())
        time.sleep(10)  # keep the connection open while Spark polls
        conn.close()

    threading.Thread(target=serve, daemon=True).start()

    lines = from_socket(spark, "127.0.0.1", port)
    words = (
        lines.select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word").count()
    )
    q = (
        words.writeStream.outputMode("complete").format("memory")
        .queryName("t_wc").trigger(processingTime="500 milliseconds").start()
    )
    try:
        deadline = time.time() + 45
        total_expected = sum(EXPECTED.values())
        while time.time() < deadline:
            time.sleep(1)
            n = spark.sql("SELECT sum(count) FROM t_wc").first()[0]
            if n and n >= total_expected:
                break
        got = {r["word"]: r["count"] for r in spark.sql("SELECT * FROM t_wc").collect()}
    finally:
        q.stop()
        server.close()
    assert got == EXPECTED


def test_rate_source_produces_rows(spark):
    """from_periodic / PeriodicDataFrame / Random equivalent: the rate
    source emits (timestamp, value) rows on a timer."""
    import time
    from streamz_spark.streaming.sources import from_rate

    src = from_rate(spark, rows_per_second=50)
    q = (src.writeStream.outputMode("append").format("memory")
         .queryName("t_rate").trigger(processingTime="250 milliseconds").start())
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            time.sleep(1)
            n = spark.sql("SELECT count(*) FROM t_rate").first()[0]
            if n and n > 20:
                break
    finally:
        q.stop()
    assert n > 20


def test_from_periodic_callback(spark):
    import pandas as pd

    from streamz_spark.streaming.sources import from_periodic

    calls = {"n": 0}

    def cb():
        calls["n"] += 1
        return pd.DataFrame({"v": [calls["n"]]})

    df = from_periodic(spark, cb, "v long", rows_per_second=5)
    assert df.isStreaming
    q = (
        df.writeStream.format("memory").queryName("periodic_rows")
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT * FROM periodic_rows").count() >= 2:
                break
            time.sleep(0.3)
        vals = [r["v"] for r in spark.sql("SELECT v FROM periodic_rows").collect()]
        assert len(vals) >= 2 and len(set(vals)) == len(vals)  # one fresh frame per tick
    finally:
        q.stop()


def test_random_stream_schema(spark):
    from streamz_spark.streaming.sources import random_stream

    df = random_stream(spark, rows_per_second=50, seed=7)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "x", "y", "z"}
    import time

    q = (
        df.writeStream.format("memory").queryName("rand_rows")
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql("SELECT x, y FROM rand_rows").collect()
            if len(rows) >= 5:
                break
            time.sleep(0.3)
        assert all(0.0 <= r["x"] <= 1.0 for r in rows)
    finally:
        q.stop()


def test_filenames_source(spark, tmp_path):
    import time

    from streamz_spark.streaming.sources import filenames

    d = tmp_path / "incoming"
    d.mkdir()
    (d / "a.txt").write_text("ignored contents")
    df = filenames(spark, str(d))
    q = (
        df.writeStream.format("memory").queryName("fname_rows")
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        deadline = time.time() + 30
        seen = []
        while time.time() < deadline:
            seen = [r["filename"] for r in spark.sql("SELECT filename FROM fname_rows").collect()]
            if len(seen) >= 1:
                break
            time.sleep(0.3)
        assert any(s.endswith("a.txt") for s in seen)
        (d / "b.txt").write_text("more")
        deadline = time.time() + 30
        while time.time() < deadline:
            seen = [r["filename"] for r in spark.sql("SELECT filename FROM fname_rows").collect()]
            if len(seen) >= 2:
                break
            time.sleep(0.3)
        assert any(s.endswith("b.txt") for s in seen)
    finally:
        q.stop()


# -- Kafka option-contract (format capture, verified to the jar boundary) --
#
# The real connector jar is absent in this image (scripts/probe_kafka.py:
# jar, broker binary, confluent-kafka lib and network/DNS all absent), so
# the live e2e cannot run. These tests pin the half we own: from_kafka /
# to_kafka must forward format + every option EXACTLY as
# readStream/writeStream.format("kafka") expects — when a jar appears,
# the forwarders go live unchanged.


class _RecorderStream:
    """Stands in for DataStreamReader/Writer: records format + options."""

    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.started = False

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.started = True
        return self

    def start(self):
        self.started = True
        return self


class _FakeSpark:
    def __init__(self, rec):
        self._rec = rec

    @property
    def readStream(self):
        return self._rec


class _FakeFrame:
    def __init__(self, rec):
        self._rec = rec

    @property
    def writeStream(self):
        return self._rec


def test_from_kafka_forwards_options_exactly():
    from streamz_spark.streaming.sources import from_kafka

    rec = _RecorderStream()
    out = from_kafka(
        _FakeSpark(rec), "broker1:9092,broker2:9092", "crawl-docs",
        startingOffsets="earliest", maxOffsetsPerTrigger="50000",
        minPartitions="64", failOnDataLoss="false",
    )
    assert out is rec and rec.started
    assert rec.fmt == "kafka"
    assert rec.opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "crawl-docs",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",
        "minPartitions": "64",
        "failOnDataLoss": "false",
    }


def test_to_kafka_forwards_options_exactly():
    from streamz_spark.streaming.sinks import to_kafka

    rec = _RecorderStream()
    out = to_kafka(
        _FakeFrame(rec), "broker1:9092", "kept-docs",
        checkpoint="/ckpt/kafka-sink",
        **{"kafka.compression.type": "lz4"},
    )
    assert out is rec and rec.started
    assert rec.fmt == "kafka"
    assert rec.opts == {
        "kafka.bootstrap.servers": "broker1:9092",
        "topic": "kept-docs",
        "checkpointLocation": "/ckpt/kafka-sink",
        "kafka.compression.type": "lz4",
    }


def test_kafka_forwarders_raise_actionable_error_without_jar(spark):
    # the REAL reader path, up to the jar boundary: without the
    # connector the load()/start() failure is rewrapped with the exact
    # spark.jars.packages coordinate a user needs
    import pyspark.sql.functions as F
    import pytest

    from streamz_spark.streaming.sinks import to_kafka
    from streamz_spark.streaming.sources import from_kafka

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        from_kafka(spark, "localhost:9092", "topic")
    sdf = spark.readStream.format("rate").load().select(
        F.col("value").cast("string")
    )
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        to_kafka(sdf, "localhost:9092", "topic")
