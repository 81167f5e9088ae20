"""Table loading with schema normalization.

The reference engine types streams via a required ``example`` frame
(streamz/collection.py:176-181); here the parquet footer *is* the
schema and Catalyst's analyzer propagates it. The one wrinkle is
TIMESTAMP(NANOS) columns, which Spark reads only as raw int64 under
``spark.sql.legacy.parquet.nanosAsLong`` — we detect them from the
parquet footer (pyarrow) and convert to timestamp_ntz losslessly.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["load_table", "load_tables", "register_views", "ensure_scan_parallelism", "TABLES"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return ()
    import pyarrow as pa

    return tuple(
        f.name for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, normalizing ns-timestamp columns.

    Works on any caller-supplied SparkSession: reading TIMESTAMP(NANOS)
    parquet requires ``spark.sql.legacy.parquet.nanosAsLong`` (a runtime
    SQL conf), so we set it here rather than relying on the session
    factory in :mod:`streamz_spark.session`.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos_cols:
        # ns int64 -> µs by *truncating* integer division (`div`), matching
        # how DuckDB reads the same file as TIMESTAMP(us). Float division
        # would round and diverge on rows with sub-µs bits (~99% of rows).
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ensure_scan_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a low-split scan out to the cluster's parallelism before
    compute-heavy narrow work (per-row regex, shingling, array folds).

    Parquet is only splittable at row-group boundaries, so a file
    written as one row group scans as ONE task no matter how many cores
    exist — the classic small-input serialization trap (the local
    testdata is exactly this shape, and real pipelines hit it on
    re-compacted or operator-written inputs). The round-robin
    repartition costs one shuffle of the input bytes, which is only
    paid when the scan has fewer splits than cores — i.e. when the
    input is at most ~cores x 128 MB. At 100 TB the scan arrives with
    thousands of natural splits and this is a plan-unchanged no-op; it
    never *reduces* partitioning.
    """
    if df.isStreaming:
        # no .rdd on a streaming plan; micro-batch parallelism is the
        # source's concern (maxFilesPerTrigger / partition count)
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
