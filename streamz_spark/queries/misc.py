"""Remaining §2 surface: set operations, the scalar-function library,
accumulate/partition batch forms.

The scalar library is engine surface the reference lacks (its users
call pandas methods through map — SURVEY.md §2.5); exposed here as
F.* builtins with duckdb-mirrored semantics.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "set_intersect",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="INTERSECT set op (engine superset; §2.5 absent-in-reference list)",
)
def set_intersect(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'signup'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="EXCEPT set op: signed-up users who never purchased",
)
def set_except(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)  # EXCEPT DISTINCT (exceptAll would keep surplus dups)


@register(
    "union_distinct",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        UNION
        SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    doc="UNION (distinct) set op",
)
def union_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register(
    "scalar_function_library",
    oracle="""
        SELECT o_orderkey,
               upper(o_orderstatus) AS status_upper,
               substr(o_orderpriority, 1, 1) AS prio_code,
               concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
               length(o_orderpriority) AS prio_len,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
               sqrt(o_totalprice) AS price_sqrt,
               o_totalprice % 1000.0 AS price_mod,
               CAST(abs(o_totalprice - 100000.0) AS DOUBLE) AS price_dist,
               greatest(o_totalprice, 100000.0) AS price_floor
        FROM orders
    """,
    doc="scalar function library: string/date/math builtins (F.*), mirrored 1:1 in duckdb (sqrt/abs/mod are IEEE-exact; ln/exp are libm-dependent and excluded from hash checks)",
)
def scalar_function_library(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate")).alias("order_dow"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_totalprice") % 1000.0).alias("price_mod"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor"),
    )


@register(
    "accumulate_scan",
    # list_sum over the in-order frame = sequential left-to-right sum,
    # bit-identical to Spark's running aggregation (duckdb's windowed SUM
    # block-accumulates and drifts by ulps above ~32 rows)
    oracle="""
        SELECT event_id, user_id,
               list_sum(list(value) OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS acc
        FROM events
    """,
    doc="Stream.accumulate/scan (streamz core.py:928-1026): algebraic binop compiles to a cumulative window; general binop → streaming.stateful.accumulate",
)
def accumulate_scan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    return ev.select("event_id", "user_id", F.sum("value").over(w).alias("acc"))


@register(
    "partition_groups",
    oracle="""
        WITH t AS (
            SELECT event_id, value,
                   CAST(floor((ROW_NUMBER() OVER (ORDER BY event_id) - 1) / 4) AS BIGINT) AS grp
            FROM events
        )
        SELECT grp, COUNT(*) AS n,
               ROUND(SUM(value), 4) AS group_sum,
               MIN(event_id) AS first_event
        FROM t GROUP BY grp
    """,
    doc="Stream.partition(n) (streamz core.py:1078-1165): count-batching as group-index aggregation",
)
def partition_groups(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.orderBy("event_id")
    grp = F.floor((F.row_number().over(w) - 1) / 4).cast("long")
    return (
        ev.select("event_id", "value", grp.alias("grp"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("group_sum"),
            F.min("event_id").alias("first_event"),
        )
    )


@register(
    "dayofweek_semantics_check",
    oracle="""
        SELECT CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow, COUNT(*) AS n
        FROM orders GROUP BY 1
    """,
    doc="guard query: Spark dayofweek (1=Sunday) vs duckdb dayofweek (0=Sunday) — verified aligned via +1 shift",
)
def dayofweek_semantics_check(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.dayofweek("o_orderdate").alias("dow")).agg(
        F.count(F.lit(1)).alias("n")
    )
