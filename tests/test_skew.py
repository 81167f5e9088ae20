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


def test_salted_join_hot_threshold_matches_plain(spark):
    # planted skew: one hot key with 800 rows, forty cold keys with 5
    # each; hot-only salting must return EXACTLY the plain-join rows
    # (cold arm untouched, hot arm salted, union complete)
    rows = [(i, "hot") for i in range(800)] + [
        (1000 + i, f"k{i % 40}") for i in range(200)
    ]
    big = spark.createDataFrame(rows, "row_id long, k string")
    small = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", 2 + i) for i in range(40)], "k string, attr int"
    )
    got = (
        salted_join(big, small, "k", hot_threshold=100)
        .toPandas().sort_values(["row_id"], ignore_index=True)
    )
    want = (
        big.join(small, "k")
        .toPandas().sort_values(["row_id"], ignore_index=True)
    )
    assert got[["row_id", "k", "attr"]].equals(want[["row_id", "k", "attr"]])
    # no hot keys above threshold -> pure plain-join fallthrough
    got2 = salted_join(big, small, "k", hot_threshold=10_000).count()
    assert got2 == len(want)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(big, small, "k", hot_threshold=100, how="left")


class TestSkewProfile:
    def test_planted_hot_key(self, spark):
        from streamz_spark.operators.skew import skew_profile

        rows = [(i, "hot") for i in range(800)] + [
            (1000 + i, f"k{i % 40}") for i in range(200)
        ]
        df = spark.createDataFrame(rows, "row_id long, k string")
        prof = skew_profile(df, "k", top=5).collect()
        assert prof[0]["key"] == "hot"
        assert prof[0]["n_rows"] == 800
        assert prof[0]["share_ppm"] == 800_000
        assert prof[0]["rank"] == 1
        # cumulative share is monotone and ends <= 1_000_000
        cums = [r["cum_share_ppm"] for r in prof]
        assert cums == sorted(cums) and cums[-1] <= 1_000_000

    def test_validation(self, spark):
        import pytest

        from streamz_spark.operators.skew import skew_profile

        df = spark.createDataFrame([(1, "a")], "row_id long, k string")
        with pytest.raises(ValueError):
            skew_profile(df, "k", top=0)
