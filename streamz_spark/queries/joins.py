"""Join surface (SURVEY.md §2.5): key joins the reference lacks, plus
Spark-first re-expressions of its structural combinators — zip
(sequence-number equi-join), zip_latest / combine_latest (as-of).

Scale notes inline: dimension sides broadcast (no shuffle of the fact
table), as-of uses the union-and-carry trick (one shuffle on the by
key, no per-key pandas loop), anti/semi joins stay as real SEMI/ANTI
plans (no distinct + inner-join detour).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table
from streamz_spark.operators import joins as ops


@register(
    "join_star_schema",
    oracle="""
        SELECT c.c_mktsegment,
               n.n_name,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 4) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY c.c_mktsegment, n.n_name
    """,
    doc="key equi-join over star schema. Hint only on nation (25 rows, "
        "scale-invariant); customer is 150k×sf so AQE decides that join "
        "— broadcast at small sf, shuffle at the 100 TB target",
)
def join_star_schema(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


@register(
    "join_left_null_handling",
    oracle="""
        SELECT n.n_name,
               COUNT(c.c_custkey) AS n_customers,
               ROUND(COALESCE(SUM(c.c_acctbal), 0), 4) AS total_balance
        FROM nation n
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000
        GROUP BY n.n_name
    """,
    doc="left outer join with unmatched-side nulls",
)
def join_left_null_handling(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    cond = (customer.c_nationkey == nation.n_nationkey) & (customer.c_acctbal > 9000)
    return (
        nation.join(customer, cond, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 4).alias("total_balance"),
        )
    )


@register(
    "join_semi_anti",
    oracle="""
        SELECT 'semi' AS op, c_nationkey, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        UNION ALL
        SELECT 'anti' AS op, c_nationkey, COUNT(*) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
    """,
    doc="left_semi (EXISTS) + left_anti (NOT EXISTS) joins in one tagged "
        "output — reference has no joins; Spark-native SEMI/ANTI plans "
        "(no distinct + inner-join detour)",
)
def join_semi_anti(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("semi").alias("op"), "c_nationkey", "n_customers")
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("anti").alias("op"), "c_nationkey", "n_customers")
    )
    return semi.unionByName(anti)


@register(
    "asof_join_enrich",
    oracle="""
        SELECT a.event_id, a.user_id, a.value,
               b.value AS last_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
    doc="zip_latest / as-of enrichment — streamz core.py:1948-1992; union-tag-carry, one shuffle on user_id",
)
def asof_join_enrich(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = ops.asof_join(
        clicks, purchases, on="ts", by=["user_id"], right_cols=["value"],
        direction="backward",
    )
    return out.select(
        "event_id", "user_id", "value",
        F.col("value_right").alias("last_purchase_value"),
    )


@register(
    "zip_positional",
    oracle="""
        WITH a AS (SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS seq, event_id, value
                   FROM events WHERE event_type = 'view'),
             b AS (SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS seq, event_id AS event_id_b, value AS value_b
                   FROM events WHERE event_type = 'click')
        SELECT a.seq AS seq, a.event_id AS s0_event_id, a.value AS s0_value,
               b.event_id_b AS s1_event_id, b.value_b AS s1_value
        FROM a JOIN b ON a.seq = b.seq
    """,
    doc="Stream.zip — streamz core.py:1575-1649; positional align = equi-join on per-stream row_number",
)
def zip_positional(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "value")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "value")
    return ops.zip_positional([views, clicks], ["event_id", "event_id"])


@register(
    "combine_latest_snapshot",
    oracle="""
        SELECT a.event_id, a.value,
               b.value AS value_s1,
               c.value AS value_s2
        FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        ASOF LEFT JOIN (SELECT ts, value FROM events WHERE event_type = 'view') b
          ON b.ts <= a.ts
        ASOF LEFT JOIN (SELECT ts, value FROM events WHERE event_type = 'error') c
          ON c.ts <= a.ts
    """,
    doc="Stream.combine_latest — streamz core.py:1652-1729; snapshot of latest per stream at each emit",
)
def combine_latest_snapshot(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("ts", "value")
    errors = ev.filter(F.col("event_type") == "error").select("ts", "value")
    out = ops.combine_latest([purchases, views, errors], on="ts", emit_on=0)
    return out.select(
        "event_id", "value",
        F.col("value_s1").alias("value_s1"),
        F.col("value_s2").alias("value_s2"),
    )


@register(
    "range_join_bands",
    oracle="""
        WITH bands AS (
            SELECT i * 100.0 AS lo, (i + 1) * 100.0 AS hi, i AS band
            FROM (SELECT unnest(generate_series(0, 9)) AS i)
        )
        SELECT b.band, COUNT(*) AS n, ROUND(SUM(e.value), 4) AS sum_value
        FROM events e
        JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
    doc="range (point-in-interval) join, bucketized: intervals explode "
        "into overlapped buckets, points map to their bucket, and the "
        "join is a plain equi-join on the bucket id (broadcast here; "
        "shuffled when both sides are large) — no "
        "BroadcastNestedLoop/cartesian theta-join at any scale",
)
def range_join_bands(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    bands = spark.range(0, 10).select(
        F.col("id").alias("band"),
        (F.col("id") * 100.0).alias("lo"),
        ((F.col("id") + 1) * 100.0).alias("hi"),
    )
    out = ops.range_join(ev, F.broadcast(bands), "value", "lo", "hi", bucket_width=100.0)
    return out.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
