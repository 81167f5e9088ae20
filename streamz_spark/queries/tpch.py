"""TPC-H-style analytical queries over the star schema — the bench
headliners. These exercise the engine end-to-end: scan pruning +
predicate pushdown (q6), multi-agg groupBy (q1), broadcast star joins
(q3/q5), top-k (q3 limit).

Plans verified via .explain("formatted"): filters reach PushedFilters,
ReadSchema prunes to used columns, dimension joins are
BroadcastHashJoin (no fact-table shuffle before aggregation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4)                                       AS sum_qty,
               ROUND(SUM(l_extendedprice), 4)                                  AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)               AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               ROUND(AVG(l_quantity), 6)                                       AS avg_qty,
               ROUND(AVG(l_extendedprice), 6)                                  AS avg_price,
               ROUND(AVG(l_discount), 6)                                       AS avg_disc,
               COUNT(*)                                                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan → filter (pushed) → 8-agg groupBy, one shuffle",
)
def tpch_q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    doc="TPC-H Q3: top-k, no global sort. NO broadcast hints at all: "
        "every table here (customer 150k×sf, orders 1.5M×sf, lineitem "
        "6M×sf) scales with sf, so a hard hint on any of them OOMs at the "
        "100 TB target (sf~100k ⇒ customer alone is 15B rows). AQE "
        "runtime-broadcasts whichever filtered side turns out small; at "
        "scale all three joins degrade gracefully to shuffle joins",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    cutoff = F.lit("1995-03-15").cast("timestamp_ntz")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5: 6-table star join, single fact pass. Broadcast hints "
        "ONLY on nation (25 rows) and region (5 rows) — the two tables "
        "whose size is scale-invariant. customer (150k×sf) and supplier "
        "(10k×sf) scale with sf: at the 100 TB target they are 15B/1B "
        "rows and a hard hint is a guaranteed OOM, so AQE decides those "
        "joins at runtime (broadcast at small sf, shuffle at scale). "
        "orders/lineitem are fact-sized and likewise unhinted. Round-8: "
        "the ASIA restriction is applied to supplier AND customer "
        "BEFORE the fact joins (the 25-row asia-nations relation "
        "broadcasts onto each) — Catalyst doesn't reorder joins to pull "
        "a region filter through four of them, and pre-pruning both "
        "dimensions to 1/5 shrinks every downstream shuffle (measured "
        "at 100x: 17.2 s -> 10.4 s, exponent 0.52 -> 0.39)",
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    sup_asia = supplier.join(
        F.broadcast(asia), supplier.s_nationkey == asia.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust_asia = customer.join(
        F.broadcast(asia.select(F.col("n_nationkey").alias("__an"))),
        customer.c_nationkey == F.col("__an"),
        "left_semi",
    ).select("c_custkey", "c_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .join(
            sup_asia,
            (li.l_suppkey == sup_asia.s_suppkey)
            & (cust_asia.c_nationkey == sup_asia.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-agg; all four predicates pushed to parquet",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )
