"""Pandas UDF definitions.

NOTE: deliberately NO ``from __future__ import annotations`` here —
PySpark infers the UDF eval type from *evaluated* type hints, and
postponed (string) annotations break that inference.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def linear_map(s: pd.Series) -> pd.Series:
    """Demonstrates Stream.map with an arbitrary Python callable on the
    Arrow-vectorized path (streamz core.py:679-719)."""
    return s * 2.0 + 1.0
