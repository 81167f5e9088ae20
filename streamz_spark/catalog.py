"""Query catalog: the operator-coverage registry.

Every operator from SURVEY.md §2 that this engine implements gets a
named entry here: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) an equivalent ANSI-SQL oracle that DuckDB
runs over the same parquet tables. The driver's correctness gate
compares the two (row count + schema + order-insensitive value hash),
so aggregate/computed columns must carry identical aliases on both
sides.

Entries are registered by the modules in ``streamz_spark.queries``;
importing that package populates ``REGISTRY``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QueryDef", "REGISTRY", "register", "load_all"]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the coverage registry."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import all query modules, populating REGISTRY, and return it."""
    from streamz_spark import queries  # noqa: F401  (import side effect)

    return REGISTRY
