"""Streaming sources (reference: streamz/sources.py — SURVEY.md §2.2).

| reference                       | here                              |
|---------------------------------|-----------------------------------|
| from_iterable (sources.py:766)  | ``from_iterable`` — chunks → temp
|                                 | parquet dir → file stream (one
|                                 | micro-batch per chunk w/ maxFiles)|
| from_textfile / filenames       | ``from_directory`` (file source   |
| (sources.py:117,174)            | discovers new files)              |
| from_periodic / PeriodicDataFrame| ``from_rate`` (rate source +     |
| (sources.py:86, dataframe/core.py:988) | optional map)              |
| from_tcp (sources.py:213)       | ``from_socket``                   |
| from_kafka[_batched]            | ``from_kafka`` (needs the Kafka   |
| (sources.py:392,483)            | connector jar on the classpath;   |
|                                 | gated with a clear error)         |

The reference's hand-rolled offset planner + RefCounter ack
(sources.py:508-626, at-least-once) is replaced by Spark checkpointing
(exactly-once for transactional/idempotent sinks) — strictly stronger.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def from_directory(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    one_file_per_trigger: bool = False,
    **options,
) -> DataFrame:
    """File-discovery source (new files in ``path`` become micro-batches)."""
    reader = spark.readStream.schema(schema)
    if one_file_per_trigger:
        reader = reader.option("maxFilesPerTrigger", "1")
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(path)


def from_iterable(
    spark: SparkSession,
    chunks: Iterable,
    schema: StructType | str,
    tmp_dir: str | None = None,
) -> DataFrame:
    """Replay an iterable of row-chunks as a stream, one micro-batch per
    chunk (the per-chunk emission cadence the reference's tests rely on,
    SURVEY.md §7 'per-chunk emission alignment').

    Each chunk (a list of rows or a pandas frame) is written as one
    parquet file; ``maxFilesPerTrigger=1`` makes each file one batch.
    """
    tmp_dir = tmp_dir or tempfile.mkdtemp(prefix="streamz_spark_src_")
    import pandas as pd

    for i, chunk in enumerate(chunks):
        if isinstance(chunk, pd.DataFrame):
            df = spark.createDataFrame(chunk, schema=schema)
        else:
            df = spark.createDataFrame(list(chunk), schema=schema)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp_dir, f"chunk={i:05d}"))
    return from_directory(
        spark, os.path.join(tmp_dir, "chunk=*"), schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )


def replay_table(
    spark: SparkSession, sf_dir: str, name: str, n_chunks: int = 4,
    chunk_col: str | None = None, tmp_dir: str | None = None,
) -> DataFrame:
    """Replay a test table as a stream of ``n_chunks`` micro-batches."""
    from pyspark.sql import functions as F

    from streamz_spark.io import load_table

    df = load_table(spark, sf_dir, name)
    key = chunk_col or df.columns[0]
    tmp_dir = tmp_dir or tempfile.mkdtemp(prefix=f"streamz_spark_{name}_")
    for i in range(n_chunks):
        df.filter(F.col(key) % n_chunks == i).write.mode("overwrite").parquet(
            os.path.join(tmp_dir, f"chunk={i:05d}")
        )
    return from_directory(
        spark, os.path.join(tmp_dir, "chunk=*"), df.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )


def from_rate(spark: SparkSession, rows_per_second: int = 10, micro_batch: bool = False) -> DataFrame:
    """Periodic source: (timestamp, value) rows on a timer — reference
    from_periodic / PeriodicDataFrame / Random demo source."""
    fmt = "rate-micro-batch" if micro_batch else "rate"
    return spark.readStream.format(fmt).option("rowsPerSecond", str(rows_per_second)).load()


def from_socket(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """TCP text source, one line per row — reference from_tcp (sources.py:213)."""
    return (
        spark.readStream.format("socket")
        .option("host", host).option("port", str(port)).load()
    )


def from_kafka(
    spark: SparkSession, bootstrap_servers: str, subscribe: str, **options
) -> DataFrame:
    """Kafka source — reference from_kafka_batched (sources.py:483-762).

    Offset tracking, partition discovery, and batching are native
    (checkpoint + maxOffsetsPerTrigger/minPartitions options). Requires
    the spark-sql-kafka connector jar; raises a clear error without it.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # connector jar absent in this image
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector on the "
            "classpath (spark.jars.packages org.apache.spark:spark-sql-kafka-0-10_2.13)."
        ) from exc


def from_periodic(
    spark: SparkSession, callback, schema: StructType | str,
    rows_per_second: int = 2,
) -> DataFrame:
    """Call ``callback()`` once per tick and emit its rows — reference
    from_periodic (sources.py:86-106). The rate source provides the
    timer; an Arrow-batched mapInPandas applies the callback per tick
    row (callback returns a pandas DataFrame matching ``schema``)."""
    import pandas as pd

    def tick(batches):
        for pdf in batches:
            out = [callback() for _ in range(len(pdf))]
            if out:
                yield pd.concat(out, ignore_index=True)

    # coalesce(1): the reference's callback is single-threaded state —
    # one task applies it sequentially (low-volume source by design)
    return from_rate(spark, rows_per_second).coalesce(1).mapInPandas(tick, schema=schema)


def periodic_dataframe(
    spark: SparkSession, datafn, schema: StructType | str,
    rows_per_second: int = 2,
) -> DataFrame:
    """streamz PeriodicDataFrame (dataframe/core.py:988-1053):
    ``datafn(last, now)`` returns a pandas frame per tick; ``last``/
    ``now`` are pandas Timestamps like the reference's kwargs."""
    import pandas as pd

    def tick(batches):
        last = pd.Timestamp.now()
        for pdf in batches:
            for _ in range(len(pdf)):
                now = pd.Timestamp.now()
                out = datafn(last=last, now=now)
                last = now
                if len(out):
                    yield out

    return from_rate(spark, rows_per_second).coalesce(1).mapInPandas(tick, schema=schema)


def random_stream(spark: SparkSession, rows_per_second: int = 10, seed: int | None = None) -> DataFrame:
    """Random demo frame source — streamz Random (dataframe/core.py:1056-1074):
    columns (x uniform, y normal-ish, z index-like) on a timer. Pure
    JVM expressions (F.rand/F.randn), no Python in the hot path."""
    from pyspark.sql import functions as F

    base = from_rate(spark, rows_per_second)
    kw = {"seed": seed} if seed is not None else {}
    return base.select(
        F.col("timestamp"),
        F.rand(**kw).alias("x"),
        F.randn(**kw).alias("y"),
        F.col("value").alias("z"),
    )


def filenames(spark: SparkSession, path_glob: str) -> DataFrame:
    """Emit newly-arrived file names — reference filenames
    (sources.py:174-209). The binaryFile source's discovery does the
    polling; projecting only (path, modificationTime) lets Spark skip
    reading content."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .load(path_glob)
        .select(F.col("path").alias("filename"), "modificationTime")
    )
