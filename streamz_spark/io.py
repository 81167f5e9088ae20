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

__all__ = ["load_table", "load_tables", "register_views", "TABLES"]

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
    """Read one test table, normalizing ns-timestamp columns."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _nanos_ts_columns(path):
        # ns int64 -> µs -> timestamp_ntz (data is µs-resolution; lossless)
        df = df.withColumn(
            col, F.timestamp_micros((F.col(col) / 1000).cast("long")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
