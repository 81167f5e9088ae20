"""Differential tests vs pandas for order-dependent window ops —
the reference's own oracle strategy (test_dataframes.py:755-765 EWM,
:557-571 cumulative) transplanted to the Spark engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from streamz_spark.io import load_table
from streamz_spark.operators import windows as ops

from .conftest import SF_DIR


def test_ewm_mean_matches_pandas(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    got = (
        ops.ewm_mean(ev, "event_id", "value", "ewm", alpha=0.3, partition_by=["user_id"])
        .toPandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    pdf = ev.toPandas().sort_values(["user_id", "event_id"], ignore_index=True)
    expected = pdf.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=True).mean()
    )
    np.testing.assert_allclose(got["ewm"].to_numpy(), expected.to_numpy(), rtol=1e-12)


def test_ewm_global_single_key(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "value").limit(500)
    got = (
        ops.ewm_mean(ev, "event_id", "value", "ewm", span=10)
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    pdf = ev.toPandas().sort_values("event_id", ignore_index=True)
    expected = pdf["value"].ewm(span=10, adjust=True).mean()
    np.testing.assert_allclose(got["ewm"].to_numpy(), expected.to_numpy(), rtol=1e-12)


def test_ewm_vectorized_matches_scalar_loop():
    # pure-numpy differential: blocked fast path vs the bit-exact scalar
    # recurrence, 10k-row keys, several alphas incl. extremes where the
    # naive d^(-j) vectorization would under/overflow without blocking
    from streamz_spark.operators.windows import _ewm_adjust_vectorized

    rng = np.random.default_rng(7)
    x = rng.normal(50.0, 20.0, size=10_000)
    for alpha in (0.01, 0.1, 0.3, 0.7, 0.99, 1.0):
        decay = 1.0 - alpha
        num = den = 0.0
        loop = np.empty(len(x))
        for i, v in enumerate(x):
            num = v + decay * num
            den = 1.0 + decay * den
            loop[i] = num / den
        fast = _ewm_adjust_vectorized(x, decay)
        np.testing.assert_allclose(fast, loop, rtol=1e-12)


def test_ewm_vectorized_spark_path(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    exact = (
        ops.ewm_mean(ev, "event_id", "value", "ewm", alpha=0.3,
                     partition_by=["user_id"], bit_exact=True)
        .toPandas().sort_values(["user_id", "event_id"], ignore_index=True)
    )
    fast = (
        ops.ewm_mean(ev, "event_id", "value", "ewm", alpha=0.3,
                     partition_by=["user_id"], bit_exact=False)
        .toPandas().sort_values(["user_id", "event_id"], ignore_index=True)
    )
    np.testing.assert_allclose(
        fast["ewm"].to_numpy(), exact["ewm"].to_numpy(), rtol=1e-12
    )


def test_cumprod_matches_pandas(spark):
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", (1.0 + F.col("value") / 1000).alias("growth")
    )
    got = (
        ops.cumulative(ev, "event_id", "growth", "prod", "cum_prod", ["user_id"])
        .toPandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    pdf = ev.toPandas().sort_values(["user_id", "event_id"], ignore_index=True)
    expected = pdf.groupby("user_id")["growth"].cumprod()
    np.testing.assert_allclose(got["cum_prod"].to_numpy(), expected.to_numpy(), rtol=1e-9)


def test_rolling_matches_pandas(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    got = (
        ops.rolling_count_window(
            ev, "event_id", {"roll_mean": ("value", "mean")}, n=5, partition_by=["user_id"]
        )
        .toPandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    pdf = ev.toPandas().sort_values(["user_id", "event_id"], ignore_index=True)
    expected = pdf.groupby("user_id")["value"].transform(
        lambda s: s.rolling(5, min_periods=1).mean()
    )
    np.testing.assert_allclose(got["roll_mean"].to_numpy(), expected.to_numpy(), rtol=1e-12)
