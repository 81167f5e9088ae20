"""Streaming sinks (reference: streamz/sinks.py — SURVEY.md §2.2).

| reference                          | here                          |
|------------------------------------|-------------------------------|
| sink(func) (sinks.py:27)           | ``sink_foreach_batch``        |
| sink_to_list (core.py:571)         | ``sink_to_list`` (test staple)|
| sink_to_textfile (sinks.py:77)     | ``sink_to_directory``         |
| to_kafka (sinks.py:116)            | writeStream.format("kafka")   |

``sink_to_list`` is the engine's analogue of the reference's core test
harness: run the stream to completion (availableNow) and collect each
micro-batch's result as a pandas frame, in batch order.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame


def run_available_now(writer, timeout: int = 300):
    """Start a writeStream with the availableNow trigger and block until
    it drains — the synchronous replay harness used by all tests.

    awaitTermination(timeout) returns False when the query is still
    running: stop it and raise, rather than returning silently truncated
    per-batch results."""
    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming query did not drain within {timeout}s (availableNow)"
        )
    return q


def sink_to_list(
    df: DataFrame, output_mode: str = "append", timeout: int = 300
) -> list:
    """Collect per-micro-batch pandas frames into a Python list —
    reference Stream.sink_to_list (core.py:571-585). Returns the list
    of (batch_id, pandas.DataFrame) in batch order."""
    out: list = []

    def collect(batch_df, batch_id):
        out.append((batch_id, batch_df.toPandas()))

    writer = df.writeStream.outputMode(output_mode).foreachBatch(collect)
    run_available_now(writer, timeout)
    out.sort(key=lambda t: t[0])
    return [pdf for _, pdf in out]


def updating_to_list(frame, timeout: int = 300, max_rows: int = 1_000_000) -> list:
    """Run an *updating* StreamingFrame (a streaming aggregate, possibly
    with composed downstream ops) and collect its value after every
    micro-batch — the reference's updating-stream semantics where
    ``sdf.x.sum()`` re-emits its current value per input chunk and can
    feed further expressions / re-aggregation
    (dataframe/tests/test_dataframes.py:469,671).

    Spark rejects a second streaming aggregation in one plan, so
    StreamingFrame defers everything past the first aggregate into a
    ``_post`` closure; here the first aggregate runs in **complete**
    output mode (full updated state each batch — small: one row per
    group) and ``_post`` recomputes the downstream pipeline on that
    static micro-batch output. Scale note: only the first aggregation
    touches the raw stream; the per-batch recompute is over #groups
    rows, which is the same cost profile as the reference's in-memory
    updating recompute.

    DRIVER-SIZE BOUND: this harness materializes each complete-mode
    result on the driver (``toPandas`` per micro-batch) — correct for
    the reference's single-stream semantics, but an unbounded groupby
    key space would otherwise OOM the driver silently. ``max_rows``
    caps the per-batch materialization (only ``max_rows + 1`` rows are
    ever fetched) and raises actionably; for a large key space use the
    keyed distributed path, :func:`streamz_spark.streaming.stateful.accumulate`.
    """
    base = frame._base if frame._base is not None else frame.df
    post = frame._post
    out: list = []

    def handle(batch_df, batch_id):
        res = post(batch_df) if post is not None else batch_df
        pdf = res.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise RuntimeError(
                f"updating_to_list: batch {batch_id} exceeds max_rows="
                f"{max_rows} — the complete-mode result no longer fits "
                "the driver-side harness; use "
                "streamz_spark.streaming.stateful.accumulate (keyed, "
                "distributed) or raise max_rows explicitly"
            )
        out.append((batch_id, pdf))

    writer = base.writeStream.outputMode("complete").foreachBatch(handle)
    run_available_now(writer, timeout)
    out.sort(key=lambda t: t[0])
    return [pdf for _, pdf in out]


def sink_foreach_batch(df: DataFrame, func, output_mode: str = "append", timeout: int = 300):
    """Apply ``func(batch_df, batch_id)`` per micro-batch — reference
    Stream.sink (sinks.py:27-73); exactly-once when func is idempotent."""
    writer = df.writeStream.outputMode(output_mode).foreachBatch(func)
    return run_available_now(writer, timeout)


def to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str | None = None,
    **options,
):
    """Kafka sink — reference to_kafka (sinks.py:116-195). A thin
    forwarder onto ``writeStream.format("kafka")``: the frame must
    carry a ``value`` column (string/binary) and may carry ``key`` /
    ``headers`` / ``partition``, exactly the connector's contract.
    Delivery is the connector's native at-least-once (the reference's
    producer offers the same without idempotence); checkpointing makes
    retries batch-scoped.

    Environment-gated like :func:`streamz_spark.streaming.sources.from_kafka`:
    requires the spark-sql-kafka connector jar (absent in this image —
    scripts/probe_kafka.py documents the probe). Option forwarding is
    pinned up to the jar boundary by tests/test_sources.py's
    format-capture contract tests.
    """
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        return writer.start()
    except Exception as exc:
        # rewrap ONLY the missing-connector-jar failure with the fix-it
        # coordinate; anything else (bad checkpoint path, invalid option,
        # auth error) propagates unchanged so the real cause is visible
        msg = str(exc)
        if (
            "Failed to find data source: kafka" in msg
            or "Failed to find the data source: kafka" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "ClassNotFoundException" in msg
        ):
            raise RuntimeError(
                "Kafka sink requires the spark-sql-kafka connector on the "
                "classpath (spark.jars.packages org.apache.spark:spark-sql-kafka-0-10_2.13)."
            ) from exc
        raise


def sink_to_memory(
    df: DataFrame, name: str, output_mode: str = "append", timeout: int = 300
):
    """Memory sink: results queryable as ``SELECT * FROM <name>``."""
    writer = df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    return run_available_now(writer, timeout)


def sink_to_directory(
    df: DataFrame, path: str, fmt: str = "parquet",
    checkpoint: str | None = None, timeout: int = 300,
):
    """File sink with checkpointed exactly-once semantics — reference
    sink_to_textfile (sinks.py:77-112), upgraded from its best-effort
    append to WAL-tracked output files."""
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="streamz_spark_ckpt_")
    writer = (
        df.writeStream.outputMode("append").format(fmt)
        .option("path", path).option("checkpointLocation", checkpoint)
    )
    return run_available_now(writer, timeout)


def _rows_as_payloads(batch_df, value_col: str | None):
    col = value_col or batch_df.columns[0]
    for r in batch_df.select(col).toLocalIterator():
        yield r[0]


def to_websocket(df: DataFrame, uri: str, value_col: str | None = None,
                 ws_kwargs: dict | None = None, timeout: int = 300):
    """Send one column's values over a websocket — reference to_websocket
    (sinks.py:199-232). Uses the ``websockets`` package when installed,
    else the built-in RFC 6455 client (streaming/ws.py) — live either
    way. Connection per micro-batch via foreachBatch, at-least-once."""
    try:
        import websockets

        import asyncio

        def send(batch_df, batch_id):  # pragma: no cover - needs websockets lib
            async def run():
                async with websockets.connect(uri, **(ws_kwargs or {})) as ws:
                    for payload in _rows_as_payloads(batch_df, value_col):
                        await ws.send(payload)
            asyncio.run(run())
    except ImportError:
        from streamz_spark.streaming.ws import WSClient, parse_ws_uri

        def send(batch_df, batch_id):
            host, port, path = parse_ws_uri(uri)
            client = WSClient(host, port, path)
            try:
                for payload in _rows_as_payloads(batch_df, value_col):
                    client.send(payload if isinstance(payload, str) else payload.decode())
            finally:
                client.close()

    return sink_foreach_batch(df, send, timeout=timeout)


def to_mqtt(df: DataFrame, host: str, port: int, topic: str,
            value_col: str | None = None, keepalive: int = 60, timeout: int = 300):
    """Publish one column's values to an MQTT topic — reference to_mqtt
    (sinks.py:236-273). Uses ``paho-mqtt`` when installed, else the
    built-in MQTT 3.1.1 QoS-0 client (streaming/mqtt.py) — live either
    way. One connection per micro-batch, at-least-once."""
    try:
        import paho.mqtt.client as mqtt

        def send(batch_df, batch_id):  # pragma: no cover - needs paho
            client = mqtt.Client()
            client.connect(host, port, keepalive)
            for payload in _rows_as_payloads(batch_df, value_col):
                client.publish(topic, payload)
            client.disconnect()
    except ImportError:
        from streamz_spark.streaming.mqtt import MQTTClient

        def send(batch_df, batch_id):
            client = MQTTClient(host, port, keepalive=keepalive)
            try:
                for payload in _rows_as_payloads(batch_df, value_col):
                    client.publish(topic, payload)
            finally:
                client.disconnect()

    return sink_foreach_batch(df, send, timeout=timeout)
