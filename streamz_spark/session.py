"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set fleet-wide on a real
cluster: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), shuffle partitions sized to cores (not the 200 default),
Arrow enabled for the pandas-UDF slow path, UTC session timezone so
results are comparable against UTC-naive oracles (duckdb).

``spark.sql.legacy.parquet.nanosAsLong`` is required because the test
tables store TIMESTAMP(NANOS) which Spark's vectorized parquet reader
otherwise rejects; `streamz_spark.io.load_table` converts those longs
back to timestamps by integer ns→µs truncation (matching the DuckDB
oracles' epoch_us semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "configure_builder"]


def configure_builder(builder: SparkSession.Builder, *, cpus: int | None = None) -> SparkSession.Builder:
    """Apply this engine's standard configs to a SparkSession builder."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # shuffle/spill/checkpoint block codec: zstd halves shuffle
        # bytes vs the lz4 default at equal-or-lower executor CPU on
        # this engine's workload mix — measured on the 100x replicas
        # over the six shuffle-heaviest entries (interleaved A/B,
        # plans/r08/codec_ab_results.jsonl): bytes ratio 0.42-0.65,
        # min-wall better in 5/6, CPU 0.63-1.40 (q21's 1.3-1.4 CPU
        # premium buys its 2.2x byte cut). At sf0.1 (<=20 MB shuffles)
        # the codecs are indistinguishable, so the local bench stays
        # comparable. SPARK_GRAFT_IO_CODEC=lz4 reverts.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )


def get_spark(app_name: str = "streamz_spark", *, cpus: int | None = None) -> SparkSession:
    """Create (or fetch) the tuned local SparkSession."""
    # before the JVM starts: recover an offline google.protobuf runtime
    # into PYTHONPATH so transformWithStateInPandas Python workers
    # (which inherit this process's environment) can import it
    from streamz_spark.streaming.tws import ensure_protobuf_runtime

    ensure_protobuf_runtime()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    spark = configure_builder(builder, cpus=cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
