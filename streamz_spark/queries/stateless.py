"""Stateless row-surface operators (SURVEY.md §2 Phase 1).

Each query demonstrates one reference operator re-expressed as pure
Catalyst (projection/filter/expression/explode/union/dedup), so
predicate pushdown, column pruning, and whole-stage codegen apply
untouched. Reference citations per query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "map_select",
    # per-row arithmetic: identical IEEE ops in identical order on both
    # engines are bit-exact — no rounding (rounding itself diverges:
    # Spark HALF_UP on shortest-repr vs duckdb scale-and-round)
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
        FROM lineitem
    """,
    doc="Stream.map(func) / sdf.assign — streamz core.py:679-719; elementwise exprs stay in codegen",
)
def map_select(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@register(
    "filter_mask",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE value > 100 AND event_type IN ('purchase', 'click')
    """,
    doc="sdf[sdf.x > 4] boolean-mask filter — streamz dataframe/core.py:239-246",
)
def filter_mask(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("value") > 100) & F.col("event_type").isin("purchase", "click")
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "query_string",
    oracle="""
        SELECT event_id, value FROM events
        WHERE value > 50 AND value < 150 AND user_id % 2 = 0
    """,
    doc="sdf.query('x > 1 and x < 4') — streamz dataframe/core.py:294-296; SQL-string predicate",
)
def query_string(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter("value > 50 AND value < 150 AND user_id % 2 = 0").select(
        "event_id", "value"
    )


@register(
    "assign_columns",
    oracle="""
        SELECT event_id, value,
               value * 1.1 AS value_taxed,
               CAST(value > 100 AS BOOLEAN) AS is_high,
               CAST(ABS(value - 100.0) AS DOUBLE) AS dist
        FROM events
    """,
    doc="sdf.assign(z=...) / setitem — streamz dataframe/core.py:255-292; OperatorMixin dunders collection.py:51-152",
)
def assign_columns(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "value").withColumns(
        {
            "value_taxed": F.col("value") * 1.1,
            "is_high": F.col("value") > 100,
            "dist": F.abs(F.col("value") - 100.0),
        }
    )


@register(
    "pluck_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    doc="Stream.pluck + map(json.loads) — streamz core.py:1862-1898, test_dataframes.py:468; from_json builtin",
)
def pluck_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "flatten_explode",
    oracle="""
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
        FROM documents
        WHERE length(trim(text)) > 0
    """,
    doc="Stream.flatten / concat — streamz core.py:1732-1773; explode is the UDTF path",
)
def flatten_explode(spark, sf_dir):
    from streamz_spark.operators.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(tokenize("text")).alias("word")
    )


@register(
    "union_streams",
    oracle="""
        SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    """,
    doc="Stream.union — streamz core.py:1842-1859; unionByName",
)
def union_streams(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "error")
    return a.unionByName(b)


@register(
    "unique_by_key",
    oracle="""
        SELECT user_id, event_type, MIN(event_id) AS first_event_id
        FROM events
        GROUP BY user_id, event_type
    """,
    doc="Stream.unique(key=...) — streamz core.py:1776-1839; deterministic representative (min id) instead of dropDuplicates' arbitrary row",
)
def unique_by_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


@register(
    "starmap_struct",
    oracle="""
        SELECT event_id,
               value * (CAST(user_id % 5 AS DOUBLE) + 1.0) AS weighted
        FROM events
    """,
    doc="Stream.starmap — streamz core.py:838-881; tuple-splat == multi-column expression",
)
def starmap_struct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    pair = F.struct(F.col("value"), (F.col("user_id") % 5).cast("double").alias("w"))
    return ev.select(
        "event_id",
        (pair.getField("value") * (pair.getField("w") + 1.0)).alias("weighted"),
    )


@register(
    "map_pandas_udf",
    oracle="""
        SELECT event_id, value * 2.0 + 1.0 AS mapped
        FROM events
    """,
    doc="Stream.map with arbitrary Python callable — streamz core.py:679-719; Arrow-batched pandas UDF (the sanctioned slow path)",
)
def map_pandas_udf(spark, sf_dir):
    from streamz_spark.operators.udfs import linear_map

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", linear_map("value").alias("mapped"))


@register(
    "slice_events",
    oracle="""
        SELECT event_id, value FROM (
            SELECT event_id, value,
                   ROW_NUMBER() OVER (ORDER BY event_id) AS rn
            FROM events
        ) WHERE rn > 100 AND rn <= 200 AND (rn - 101) % 3 = 0
    """,
    doc="Stream.slice(start, end, step) — streamz core.py:1029-1075; monotonic id + filter",
)
def slice_events(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.orderBy("event_id")
    return (
        ev.select("event_id", "value", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 200) & ((F.col("rn") - 101) % 3 == 0))
        .select("event_id", "value")
    )
