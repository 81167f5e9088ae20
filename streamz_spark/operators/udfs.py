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


def async_map(fn, dtype: str = "double", max_concurrency: int = 64):
    """Arrow-batched async map: runs the coroutine ``fn(value)`` for
    every element of each batch concurrently on one event loop, with
    output order matching input order — the reference's map_async
    semantics (streamz core.py:722-835: parallel evaluation, ordered
    emission) realized inside the Pandas-UDF batch.

    Spark already parallelizes *across* partitions; this adds I/O
    concurrency *within* a batch (the case async map exists for:
    per-element RPC/HTTP lookups whose latency would otherwise be paid
    serially). ``max_concurrency`` bounds in-flight coroutines so a
    10k-row Arrow batch can't open 10k sockets at once.
    """
    import asyncio

    @F.pandas_udf(dtype)
    def _udf(s: pd.Series) -> pd.Series:
        async def run_all(values):
            sem = asyncio.Semaphore(max_concurrency)

            async def one(x):
                async with sem:
                    return await fn(x)

            # gather preserves argument order regardless of completion order
            return await asyncio.gather(*[one(x) for x in values])

        res = asyncio.run(run_all(list(s)))
        return pd.Series(res, index=s.index)

    return _udf
