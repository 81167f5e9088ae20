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


def test_ensure_scan_parallelism_guard_survives_narrow_transforms(spark):
    # the compose-guard tag is schema metadata, which projections and
    # renames of tagged columns carry through — so operator chains
    # with narrow transforms between two fan-out calls still don't
    # stack repartitions
    from pyspark.sql import functions as F

    from streamz_spark.io import ensure_scan_parallelism, load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    once = ensure_scan_parallelism(docs)
    derived = once.withColumn("n_chars", F.length("text")).select(
        F.col("doc_id").alias("id"), "n_chars"
    )
    assert ensure_scan_parallelism(derived) is derived


def test_ensure_scan_parallelism_uses_no_private_jdf():
    # VERDICT r5 #4: the compose-guard must not inspect plans via the
    # private _jdf handle (breaks silently on Connect-style sessions)
    import inspect

    import streamz_spark.io as io_mod

    assert "_jdf" not in inspect.getsource(io_mod)


def test_parse_byte_conf_spark_legal_forms():
    from streamz_spark.io import _parse_byte_conf

    assert _parse_byte_conf("134217728b") == 134217728
    assert _parse_byte_conf("128m") == 128 * 1024**2
    assert _parse_byte_conf("128mb") == 128 * 1024**2
    assert _parse_byte_conf("1gb") == 1024**3
    assert _parse_byte_conf("64kb") == 64 * 1024
    assert _parse_byte_conf("2tb") == 2 * 1024**4
    assert _parse_byte_conf(" 42 ") == 42
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parse_byte_conf("abc")


def test_file_scan_splits_nonsplittable_and_stale_cache(tmp_path):
    import os

    from streamz_spark.io import _effective_scan_splits

    # non-splittable compressed text counts as ONE split however big
    gz = tmp_path / "big.json.gz"
    gz.write_bytes(b"\x1f\x8b" + b"0" * 4096)
    assert _effective_scan_splits((str(gz),), 1024) == 1

    # overwriting a file at the same path must re-estimate (cache is
    # keyed on size+mtime, not just path)
    txt = tmp_path / "data.txt"
    txt.write_bytes(b"x" * 1000)
    assert _effective_scan_splits((str(txt),), 512) == 2
    txt.write_bytes(b"x" * 4000)
    os.utime(txt, ns=(1, 1))  # force a distinct mtime either way
    assert _effective_scan_splits((str(txt),), 512) == 8


def test_ensure_scan_parallelism_keyed_fanout(spark):
    # keys= hash-partitions instead of round-robin: no
    # sortBeforeRepartition pass, and a downstream partial aggregate
    # keyed on the same column sees each key in exactly one partition
    # (round-robin duplicated its state across all of them —
    # approx_sketches' round-8 rewrite)
    from pyspark.sql import functions as F

    from streamz_spark.io import ensure_scan_parallelism, load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    fanned = ensure_scan_parallelism(ev, keys=("user_id",))
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in plan, plan
    assert "roundrobin" not in plan.lower(), plan
    # same rows, and each user_id in exactly one partition
    assert fanned.count() == ev.count()
    spread = (
        fanned.withColumn("p", F.spark_partition_id())
        .groupBy("user_id").agg(F.countDistinct("p").alias("np"))
        .agg(F.max("np")).collect()[0][0]
    )
    assert spread == 1
