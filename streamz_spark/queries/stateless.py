"""Stateless row-surface operators (SURVEY.md §2 Phase 1).

Each query demonstrates reference operators re-expressed as pure
Catalyst (projection/filter/expression/explode), so predicate
pushdown, column pruning, and whole-stage codegen apply untouched.
Reference citations per query. Consolidated to one entry per §2
family (driver evaluates ≤50 registry entries): map+assign chain in
one query, mask+query-string chain in one query, starmap via both the
struct-splat and Arrow-UDF paths in one query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "map_assign",
    # per-row arithmetic: identical IEEE ops in identical order on both
    # engines are bit-exact — no rounding (rounding itself diverges:
    # Spark HALF_UP on shortest-repr vs duckdb scale-and-round)
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
               CAST(l_extendedprice * (1 - l_discount) > 30000.0 AS BOOLEAN) AS is_big,
               CAST(ABS(l_extendedprice * (1 - l_discount) - 30000.0) AS DOUBLE) AS dist
        FROM lineitem
    """,
    doc="Stream.map(func) — streamz core.py:679-719 — chained with "
        "sdf.assign(z=...)/setitem (dataframe/core.py:255-292) and the "
        "OperatorMixin dunders (collection.py:51-152): elementwise exprs "
        "stay in codegen",
)
def map_assign(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    mapped = li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )
    return mapped.withColumns(
        {
            "is_big": F.col("revenue") > 30000.0,
            "dist": F.abs(F.col("revenue") - 30000.0),
        }
    )


@register(
    "filter_query_pluck",
    oracle="""
        SELECT event_id, user_id, event_type, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE value > 100 AND event_type IN ('purchase', 'click')
          AND value < 400 AND user_id % 2 = 0
    """,
    doc="sdf[sdf.x > 4] boolean-mask filter (streamz dataframe/"
        "core.py:239-246) chained with sdf.query('x > 1 and x < 4') "
        "(dataframe/core.py:294-296) and Stream.pluck + map(json.loads) "
        "(core.py:1862-1898): Column predicate + SQL-string predicate "
        "compose into one pushed-down scan filter; the JSON pluck is the "
        "from_json/get_json_object builtin on the surviving rows",
)
def filter_query_pluck(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    masked = ev.filter(
        (F.col("value") > 100) & F.col("event_type").isin("purchase", "click")
    )
    return masked.filter("value < 400 AND user_id % 2 = 0").select(
        "event_id", "user_id", "event_type", "value",
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
    "starmap_pandas_udf",
    oracle="""
        SELECT event_id,
               value * (CAST(user_id % 5 AS DOUBLE) + 1.0) AS weighted,
               value * 2.0 + 1.0 AS mapped
        FROM events
    """,
    doc="Stream.starmap (streamz core.py:838-881; tuple-splat == "
        "multi-column struct expression) + Stream.map with an arbitrary "
        "Python callable (core.py:679-719) as an Arrow-batched pandas UDF "
        "— the sanctioned slow path — side by side on the same rows",
)
def starmap_pandas_udf(spark, sf_dir):
    from streamz_spark.operators.udfs import linear_map

    ev = load_table(spark, sf_dir, "events")
    pair = F.struct(F.col("value"), (F.col("user_id") % 5).cast("double").alias("w"))
    return ev.select(
        "event_id",
        (pair.getField("value") * (pair.getField("w") + 1.0)).alias("weighted"),
        linear_map("value").alias("mapped"),
    )
