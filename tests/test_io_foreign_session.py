"""Regression: load_table must work on sessions the repo didn't build.

Round-1 failure mode: ``spark.sql.legacy.parquet.nanosAsLong`` was set
only in :func:`streamz_spark.session.get_spark`, so the driver's
vanilla SparkSession crashed with PARQUET_TYPE_ILLEGAL on every
events read. ``load_table`` now sets the conf itself (it is a runtime
SQL conf) and converts ns->us by *truncating* integer division to
match DuckDB's read of the same file.
"""

from __future__ import annotations

import pandas as pd

from streamz_spark.io import load_table

from .conftest import SF_DIR


def test_load_table_sets_nanos_conf_itself(spark):
    # Simulate a foreign session: the conf is absent at call time.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, SF_DIR, "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_ns_to_us_truncates_like_duckdb(spark, duck):
    # ~99% of events rows carry sub-us bits; DuckDB truncates ns->us.
    # Float division would round and diverge on ~13% of rows.
    sdf = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    spdf = sdf.toPandas().sort_values("event_id", ignore_index=True)
    odf = duck.execute(
        "SELECT event_id, ts FROM events ORDER BY event_id"
    ).df()
    assert (
        pd.to_datetime(spdf["ts"]).astype("datetime64[us]").tolist()
        == pd.to_datetime(odf["ts"]).astype("datetime64[us]").tolist()
    )


def test_ensure_scan_parallelism_fans_low_split_scan(spark):
    from streamz_spark.io import ensure_scan_parallelism, load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    assert docs.rdd.getNumPartitions() == 1  # single-row-group parquet
    fanned = ensure_scan_parallelism(docs)
    target = spark.sparkContext.defaultParallelism
    assert fanned.rdd.getNumPartitions() == target
    # row set unchanged
    assert fanned.count() == docs.count()


def test_ensure_scan_parallelism_noop_on_well_split_input(spark):
    from streamz_spark.io import ensure_scan_parallelism

    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 10_000, numPartitions=target + 4)
    out = ensure_scan_parallelism(df)
    # already >= cluster parallelism: plan must be returned unchanged —
    # at real scale this is the only branch ever taken, so the helper
    # never adds a shuffle to a naturally-split 100 TB scan
    assert out is df


def test_ensure_scan_parallelism_never_touches_rdd(spark, monkeypatch):
    # the split probe must be plan-only (inputFiles + file metadata):
    # .rdd forces full physical planning through the RDD bridge on
    # every operator invocation and is unsupported under Spark Connect
    from pyspark.sql import DataFrame

    from streamz_spark.io import ensure_scan_parallelism, load_table

    from .conftest import SF_DIR

    def boom(self):
        raise AssertionError("ensure_scan_parallelism touched .rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    docs = load_table(spark, SF_DIR, "documents")
    fanned = ensure_scan_parallelism(docs)
    assert fanned is not docs  # single-row-group parquet still fans out
    rng = spark.range(0, 100)
    assert ensure_scan_parallelism(rng) is rng  # no file scan: unchanged


def test_ensure_scan_parallelism_composes_without_double_shuffle(spark):
    # operators that each defensively call the helper must not stack
    # repartitions: the second call sees the explicit Repartition in
    # the analyzed plan and returns the frame unchanged
    from streamz_spark.io import ensure_scan_parallelism, load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    once = ensure_scan_parallelism(docs)
    assert once is not docs
    twice = ensure_scan_parallelism(once)
    assert twice is once
