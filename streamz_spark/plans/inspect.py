"""Programmatic access to the formatted physical plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf  # local (classic) mode; not Spark Connect
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan (PushedFilters)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_string(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (ReadSchema) — the pruning check."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_string(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def _count_op(df: DataFrame, op: str) -> int:
    """Count physical operators by their numbered-detail headers —
    formatted explain prints each op twice (tree sketch + detail), so a
    plain substring count double-counts."""
    return len(re.findall(rf"\(\d+\) {op}\b", explain_string(df)))


def broadcast_join_count(df: DataFrame) -> int:
    return _count_op(df, "BroadcastHashJoin") + _count_op(df, "BroadcastNestedLoopJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return _count_op(df, "SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators, excluding
    broadcast exchanges)."""
    s = explain_string(df)
    return len(re.findall(r"\(\d+\) Exchange", s))
