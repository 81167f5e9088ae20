"""Accuracy bounds for the approximate-sketch operators.

The catalog entry scores the sketches as within-tolerance-of-exact
booleans (sketch internals are engine-specific); this test asserts
the booleans are actually true, i.e. the tolerance check has teeth.
"""

from __future__ import annotations

from streamz_spark.catalog import load_all

from .conftest import SF_DIR


def test_approx_sketches_within_bounds(spark):
    reg = load_all()
    rows = reg["approx_sketches"].fn(spark, SF_DIR).collect()
    assert rows, "no groups returned"
    for row in rows:
        assert row["hll_within_5pct"], row
        assert row["p50_within_tolerance"], row
