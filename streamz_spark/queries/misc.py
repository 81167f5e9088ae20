"""Remaining §2 surface: set operations, the scalar-function library,
accumulate+slice, partition batching.

The scalar library is engine surface the reference lacks (its users
call pandas methods through map — SURVEY.md §2.5); exposed here as
F.* builtins with duckdb-mirrored semantics.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "set_ops",
    oracle="""
        SELECT 'intersect' AS op, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error')
        UNION ALL
        SELECT 'except' AS op, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'signup'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT 'union_distinct' AS op, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            UNION
            SELECT user_id FROM events WHERE event_type = 'signup')
        UNION ALL
        SELECT 'union_all' AS op, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id FROM events WHERE event_type = 'error')
    """,
    doc="set-operation family in one tagged output: INTERSECT / EXCEPT "
        "(distinct) / UNION-distinct (engine superset, §2.5 "
        "absent-in-reference list) + UNION ALL, which is Stream.union "
        "(streamz core.py:1842-1859, unionByName)",
)
def set_ops(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")

    def side(etype):
        return ev.filter(F.col("event_type") == etype).select("user_id")

    purchase, error, signup = side("purchase"), side("error"), side("signup")
    tagged = [
        purchase.intersect(error).select(F.lit("intersect").alias("op"), "user_id"),
        signup.subtract(purchase).select(F.lit("except").alias("op"), "user_id"),
        purchase.union(signup).distinct().select(F.lit("union_distinct").alias("op"), "user_id"),
        purchase.unionByName(error).select(F.lit("union_all").alias("op"), "user_id"),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


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
    doc="scalar function library: string/date/math builtins (F.*), mirrored "
        "1:1 in duckdb (sqrt/abs/mod are IEEE-exact; ln/exp are "
        "libm-dependent and excluded from hash checks). order_dow doubles "
        "as the dayofweek semantics guard: Spark 1=Sunday vs duckdb "
        "0=Sunday, aligned via the +1 shift in the oracle",
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
    "accumulate_slice",
    # list_sum over the in-order frame = sequential left-to-right sum,
    # bit-identical to Spark's running aggregation (duckdb's windowed SUM
    # block-accumulates and drifts by ulps above ~32 rows)
    oracle="""
        WITH acc AS (
            SELECT event_id, user_id,
                   list_sum(list(value) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS acc,
                   ROW_NUMBER() OVER (ORDER BY event_id) AS rn
            FROM events
        )
        SELECT event_id, user_id, acc
        FROM acc
        WHERE rn > 100 AND rn <= 4000 AND (rn - 101) % 3 = 0
    """,
    doc="Stream.accumulate/scan (streamz core.py:928-1026: algebraic binop "
        "compiles to a cumulative window; general binop → "
        "streaming.stateful.accumulate) composed with Stream.slice(start, "
        "end, step) (core.py:1029-1075: monotonic id + filter) over the "
        "scan output",
)
def accumulate_slice(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    from streamz_spark.operators.order import global_index

    acc = ev.select(
        "event_id", "user_id", F.sum("value").over(w).alias("acc")
    )
    # distributed position recovery (no keyless row_number single task)
    return (
        global_index(acc, ["event_id"], "rn", zero_based=False)
        .filter((F.col("rn") > 100) & (F.col("rn") <= 4000) & ((F.col("rn") - 101) % 3 == 0))
        .select("event_id", "user_id", "acc")
    )


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
    from streamz_spark.operators.order import global_index

    ev = load_table(spark, sf_dir, "events")
    indexed = global_index(
        ev.select("event_id", "value"), ["event_id"], "__rn", zero_based=False
    )
    grp = F.floor((F.col("__rn") - 1) / 4).cast("long")
    return (
        indexed.select("event_id", "value", grp.alias("grp"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("group_sum"),
            F.min("event_id").alias("first_event"),
        )
    )
