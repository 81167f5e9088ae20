"""Aggregation operators (SURVEY.md §2 Phase 2).

Global and grouped aggregations with computed groupers, value_counts /
frequencies, top-k, rollup/cube/pivot, exact + approx distinct. All
pure Catalyst: partial (map-side) aggregation means the shuffle moves
one row per (partition × key) — the property that survives a 100×
scale-up. Float outputs rounded identically on both sides so the
driver's value-hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "global_aggs",
    oracle="""
        SELECT COUNT(*)                       AS n,
               COUNT(value)                   AS n_value,
               ROUND(SUM(value), 4)           AS sum_value,
               ROUND(AVG(value), 6)           AS mean_value,
               ROUND(MIN(value), 6)           AS min_value,
               ROUND(MAX(value), 6)           AS max_value,
               ROUND(VAR_SAMP(value), 6)      AS var_value,
               ROUND(STDDEV_SAMP(value), 6)   AS std_value
        FROM events
    """,
    doc="sdf.sum/count/size/mean/var/std — streamz dataframe/core.py:59-92, aggregations.py:15-129",
)
def global_aggs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_value"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.stddev_samp("value"), 6).alias("std_value"),
    )


@register(
    "frequencies",
    oracle="""
        SELECT event_type AS value, COUNT(*) AS count
        FROM events GROUP BY event_type
    """,
    doc="Stream.frequencies / Series.value_counts — streamz core.py:587-592, aggregations.py:509-521",
)
def frequencies(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("value")).agg(
        F.count(F.lit(1)).alias("count")
    )


@register(
    "groupby_computed_grouper",
    oracle="""
        SELECT user_id % 7                  AS bucket,
               ROUND(SUM(value), 4)         AS sum_value,
               ROUND(AVG(value), 6)         AS mean_value,
               COUNT(*)                     AS n
        FROM events
        GROUP BY user_id % 7
    """,
    doc="sdf.groupby(sdf.x % 7) computed grouper — streamz dataframe/core.py:789-838",
)
def groupby_computed_grouper(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy((F.col("user_id") % 7).alias("bucket")).agg(
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "groupby_multi_agg",
    oracle="""
        SELECT event_type,
               user_id % 3 AS cohort,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value,
               ROUND(VAR_SAMP(value), 6) AS var_value,
               ROUND(STDDEV_SAMP(value), 6) AS std_value
        FROM events
        GROUP BY event_type, user_id % 3
    """,
    doc="GroupBy.sum/count/mean/var/std matrix — streamz dataframe/core.py:840-881, aggregations.py:442-506",
)
def groupby_multi_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", (F.col("user_id") % 3).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.stddev_samp("value"), 6).alias("std_value"),
    )


@register(
    "nlargest_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    doc="Frames.nlargest / tail — streamz dataframe/core.py:203-227; global top-k = TakeOrdered, no full sort",
)
def nlargest_topk(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id ASC) AS rnk
            FROM events
        ) WHERE rnk <= 3
    """,
    doc="top-k per key (engine superset; reference only has global nlargest)",
)
def topk_per_group(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.select(
            "event_type", "event_id", "value",
            F.row_number().over(w).cast("long").alias("rnk"),  # long: duckdb ROW_NUMBER is int64
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "distinct_exact",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    doc="exact distinct per key (reference unique(); Spark expand+2-phase agg)",
)
def distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rollup_hierarchy",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="rollup grouping sets (engine superset; SURVEY §2.5 absent-in-reference list)",
)
def rollup_hierarchy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_matrix",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="cube grouping sets (engine superset)",
)
def cube_matrix(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 4).alias("sum_price")
    )


@register(
    "pivot_wide",
    oracle="""
        SELECT user_id % 5 AS cohort,
               ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'click'), 0), 4)    AS click,
               ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0), 4) AS purchase,
               ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'view'), 0), 4)     AS view
        FROM events
        GROUP BY user_id % 5
    """,
    doc="pivot to wide (engine superset; explicit value list avoids an extra distinct pass)",
)
def pivot_wide(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy((F.col("user_id") % 5).alias("cohort"))
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum("value"))
    )
    return out.select(
        "cohort",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 4).alias(c) for c in ("click", "purchase", "view")],
    )


@register(
    "percentiles_exact",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6)  AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY event_type
    """,
    doc="exact interpolated percentiles (reference rolling quantile — dataframe/core.py:94-127)",
)
def percentiles_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


@register(
    "approx_sketches",
    oracle=None,  # HLL/quantile-sketch internals differ per engine; exactness bounds checked in tests/test_catalog_extra.py
    doc="approximate sketches: approx_count_distinct (HLL) + percentile_approx — the mergeable at-scale alternatives to exact distinct/percentile",
)
def approx_sketches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
    )
