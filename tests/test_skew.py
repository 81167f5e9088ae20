"""Salting utilities: results must equal the unsalted plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.operators.skew import salted_agg, salted_join

from .conftest import SF_DIR


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    got = (
        salted_agg(ev, "event_type", {"n": ("value", "count"), "mx": ("value", "max")})
        .toPandas().sort_values("event_type", ignore_index=True)
    )
    want = (
        ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .toPandas().sort_values("event_type", ignore_index=True)
    )
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["mx"], want["mx"])


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    cust = customer.withColumnRenamed("c_custkey", "o_custkey")
    got = salted_join(orders, cust, "o_custkey").count()
    want = orders.join(cust, "o_custkey").count()
    assert got == want
