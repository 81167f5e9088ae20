"""Accuracy bounds for the approximate-sketch operators (no SQL oracle:
sketch internals are engine-specific; we bound the error instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import load_all
from streamz_spark.io import load_table

from .conftest import SF_DIR


def test_approx_sketches_within_bounds(spark):
    reg = load_all()
    got = {r["event_type"]: r for r in reg["approx_sketches"].fn(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        ).collect()
    }
    for et, row in got.items():
        rel = abs(row["approx_users"] - exact[et]["n_users"]) / exact[et]["n_users"]
        assert rel <= 0.1, (et, rel)  # HLL default rsd=5%
        # percentile_approx default accuracy 10000 → tight on small data
        assert abs(row["p50_approx"] - exact[et]["p50"]) <= 10.0
