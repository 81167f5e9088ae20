"""Shared pytest fixtures: one Spark session + duckdb oracle harness.

Mirrors the reference's differential-testing strategy (SURVEY.md §5.2):
run the engine's query and an independent oracle (duckdb here, pandas
in the reference) over the same input and assert equality.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.io import TABLES
from streamz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("streamz_spark_tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol=1e-9):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row count differs: {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            np.testing.assert_allclose(
                av.astype(float).to_numpy(), bv.astype(float).to_numpy(),
                rtol=rtol, atol=1e-12, err_msg=f"column {col}", equal_nan=True,
            )
        elif pd.api.types.is_datetime64_any_dtype(av) or pd.api.types.is_datetime64_any_dtype(bv):
            assert (
                pd.to_datetime(av).astype("datetime64[us]").tolist()
                == pd.to_datetime(bv).astype("datetime64[us]").tolist()
            ), f"column {col} differs"
        else:
            assert av.tolist() == bv.tolist(), f"column {col} differs"
