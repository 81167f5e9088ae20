"""Aggregation operators (SURVEY.md §2 Phase 2).

Global and grouped aggregations with computed groupers, value_counts /
frequencies, top-k (global + per-key), rollup/cube grouping sets,
pivot, exact + approx distinct, exact percentiles. All pure Catalyst:
partial (map-side) aggregation means the shuffle moves one row per
(partition × key) — the property that survives a 100× scale-up. Float
outputs rounded identically on both sides so the driver's value-hash
is stable across summation orders.

One registry entry per §2 family (the driver evaluates at most 50
entries, so overlapping demos are consolidated — each entry's doc
names every operator it covers).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

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
               ROUND(STDDEV_SAMP(value), 6)   AS std_value,
               ROUND(quantile_cont(value, 0.5), 6)  AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95
        FROM events
    """,
    doc="sdf.sum/count/size/mean/var/std (streamz dataframe/core.py:59-92, "
        "aggregations.py:15-129) + exact interpolated percentiles (the "
        "reference's quantile — dataframe/core.py:94-127) in one global agg",
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
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
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
    "groupby_multi_agg",
    oracle="""
        SELECT event_type,
               user_id % 3 AS cohort,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value,
               ROUND(AVG(value), 6) AS mean_value,
               ROUND(VAR_SAMP(value), 6) AS var_value,
               ROUND(STDDEV_SAMP(value), 6) AS std_value
        FROM events
        GROUP BY event_type, user_id % 3
    """,
    doc="GroupBy.sum/count/mean/var/std matrix (streamz dataframe/"
        "core.py:840-881, aggregations.py:442-506) with a *computed* grouper "
        "(sdf.groupby(sdf.x % 3) — dataframe/core.py:789-838): cohort is an "
        "expression key, not a column",
)
def groupby_multi_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", (F.col("user_id") % 3).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.stddev_samp("value"), 6).alias("std_value"),
    )


@register(
    "topk",
    oracle="""
        SELECT 'global' AS scope, event_id, value,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT event_id, value,
                   ROW_NUMBER() OVER (ORDER BY value DESC, event_id ASC) AS rnk
            FROM events
        ) WHERE rnk <= 10
        UNION ALL
        SELECT event_type AS scope, event_id, value,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id ASC) AS rnk
            FROM events
        ) WHERE rnk <= 3
    """,
    doc="Frames.nlargest / tail (streamz dataframe/core.py:203-227): global "
        "top-10 = TakeOrdered (no full sort) tagged scope='global', plus the "
        "engine-superset per-key top-3 via ROW_NUMBER window",
)
def topk(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # top-10 via sort+limit = TakeOrderedAndProject (per-partition heaps,
    # fully parallel); the rank window then runs over 10 rows, not the data
    wg = W.orderBy(F.col("value").desc(), F.col("event_id").asc())
    global_top = (
        ev.select("event_id", "value")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
        .select(
            F.lit("global").alias("scope"), "event_id", "value",
            F.row_number().over(wg).cast("long").alias("rnk"),
        )
    )
    wp = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    per_group = (
        ev.select(
            F.col("event_type").alias("scope"), "event_id", "value",
            F.row_number().over(wp).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )
    return global_top.unionByName(per_group)


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
    "grouping_sets_rollup_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="rollup/cube grouping sets (engine superset; SURVEY §2.5 "
        "absent-in-reference list). CUBE emits all 4 grouping sets — the "
        "ROLLUP sets are the gid∈{0,1,3} subset — with grouping_id "
        "disambiguating aggregate levels from genuine NULL keys",
)
def grouping_sets_rollup_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
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
    "approx_sketches",
    # The sketches themselves (HLL++ register layout, KLL quantile sketch)
    # are engine-internal, so the *scored* output is a differential
    # accuracy check: the sketch estimate must land within tolerance of
    # the exact answer, which DuckDB computes independently. A sketch
    # regression flips the booleans and the oracle mismatch goes red.
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users_exact,
               TRUE AS hll_within_5pct,
               TRUE AS p50_within_tolerance
        FROM events GROUP BY event_type
    """,
    doc="approximate sketches: approx_count_distinct (HLL++) + "
        "percentile_approx — the mergeable at-scale alternatives to exact "
        "distinct/percentile, scored as within-tolerance-of-exact flags",
)
def approx_sketches(spark, sf_dir):
    from streamz_spark.io import ensure_scan_parallelism

    # fan the single-split scan out before the aggregate: countDistinct
    # expands rows per distinct-agg group and exact percentile is a
    # sort-based buffer, so the partial-agg stage is the compute-heavy
    # part — one task otherwise runs it all (no-op at scale, where the
    # scan arrives with >= cores natural splits). Keyed on user_id: the
    # distinct-agg partial groups by (event_type, user_id), so hash
    # collocation keeps each pair's state in ONE partition (round-robin
    # duplicated it across all 32, inflating partial CPU and shuffle
    # records) and skips round-robin's per-task sortBeforeRepartition.
    ev = ensure_scan_parallelism(
        load_table(spark, sf_dir, "events"), keys=("user_id",)
    )
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        # rsd=0.02: the default 0.05 sketch landed 6.7% off at sf0.1
        # (one sigma beyond its own rsd) — a tolerance check must use a
        # sketch tighter than the tolerance it asserts
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
        F.percentile("value", F.lit(0.5)).alias("p50_exact"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    hll_ok = (
        F.abs(F.col("approx_users") - F.col("n_users_exact"))
        <= 0.05 * F.col("n_users_exact")
    )
    p50_ok = (
        F.abs(F.col("p50_approx") - F.col("p50_exact"))
        <= 0.05 * (F.col("vmax") - F.col("vmin"))
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        hll_ok.alias("hll_within_5pct"),
        p50_ok.alias("p50_within_tolerance"),
    )
