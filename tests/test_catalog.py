"""Differential gate: every catalog query vs its DuckDB oracle.

This is a local mirror of the driver's t2 correctness check — every
`queries()` entry with an oracle must match on row count, column
names, and values (order-insensitive) at the test scale factor.
"""

from __future__ import annotations

import pytest

from streamz_spark.catalog import load_all

from .conftest import SF_DIR, assert_frames_match

REGISTRY = load_all()
ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(name, spark, duck):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if qd.oracle is None:
        # rows-only check (non-SQL-expressible op): plan must execute
        assert spark_pdf is not None
        return
    oracle_pdf = duck.execute(qd.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf)
