"""Scalar-function helpers shared by queries and the frame API."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["stable_round", "stable_round_sql"]


def stable_round(col: Column, k: int) -> Column:
    """Deterministic cross-engine rounding: FLOOR(x·10^k + 0.5)/10^k.

    Native ROUND differs between engines on half-grid values (Spark:
    HALF_UP on the shortest decimal repr; duckdb: scale-and-llround),
    so two bit-identical doubles can round differently. This formula
    is plain IEEE multiply/add/floor/divide — identical inputs give
    identical outputs everywhere, and ulp-level input noise only
    matters within ~1 ulp of a grid edge.
    """
    s = float(10**k)
    return F.floor(col * s + 0.5) / s


def stable_round_sql(expr: str, k: int) -> str:
    """The same formula as SQL text for duckdb oracles."""
    s = 10**k
    return f"FLOOR(({expr}) * {s} + 0.5) / {s}"
