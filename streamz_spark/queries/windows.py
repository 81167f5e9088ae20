"""Window operators (SURVEY.md §2 Phases 3-4, batch semantics).

Count/time rolling, expanding, cumulative, EWM, sliding tuples,
tumbling/timed windows, sessionization. Batch compilation targets
Catalyst's WindowExec (per-key sorted scan — the distributed analogue
of the reference's backlog-deque + add/subtract state machines,
aggregations.py:173-320). EWM is the order-dependent exception: an
Arrow-batched per-key scan, oracled with a duckdb recursive CTE-free
closed form over bounded partitions.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table
from streamz_spark.operators import windows as ops


@register(
    "cumulative_expanding",
    # cum_prod oracle mirrors the engine's sign-aware exp(sum(log))
    # formula so both engines run the same float ops (semantics verified
    # against pandas in tests/test_windows.py); exp_mean uses the
    # list_sum trick — duckdb's windowed SUM block-accumulates and
    # ulp-diverges from Spark's sequential running sum above ~32 rows,
    # but list_sum over the in-order window list sums left-to-right
    # exactly like Spark's AggregateProcessor, so raw doubles compare
    # clean
    oracle="""
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER w, 6) AS cum_value,
               MAX(value) OVER w AS cum_max,
               ROUND(CASE WHEN MAX(CASE WHEN 1.0 + value/1000 = 0 THEN 1 ELSE 0 END)
                          OVER w = 1 THEN 0.0
                    ELSE (CASE WHEN SUM(CASE WHEN 1.0 + value/1000 < 0 THEN 1 ELSE 0 END)
                               OVER w % 2 = 1 THEN -1.0 ELSE 1.0 END)
                         * EXP(SUM(LN(ABS(1.0 + value/1000))) OVER w)
               END, 6) AS cum_prod,
               COUNT(value) OVER w AS exp_count,
               list_sum(list(value) OVER w) / COUNT(value) OVER w AS exp_mean
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="the cumulative family in one per-row output: sdf.cumsum/cummax "
        "(streamz dataframe/core.py:177-197,413-427; ordered cumulative "
        "window), sdf.cumprod (exp(sum(log)) with sign/zero tracking, no "
        "UDF), and sdf.expanding().count()/.mean() "
        "(dataframe/core.py:171-172,641-656)",
)
def cumulative_expanding(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "growth", 1.0 + F.col("value") / 1000
    )
    out = ops.cumulative(ev, "event_id", "value", "sum", "cum_value", ["user_id"])
    out = ops.cumulative(out, "event_id", "value", "max", "cum_max", ["user_id"])
    out = ops.cumulative(out, "event_id", "growth", "prod", "cum_prod", ["user_id"])
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    return out.select(
        "event_id", "user_id",
        F.round("cum_value", 6).alias("cum_value"),
        "cum_max",
        F.round("cum_prod", 6).alias("cum_prod"),
        F.count("value").over(w).alias("exp_count"),
        (F.sum("value").over(w) / F.count("value").over(w)).alias("exp_mean"),
    )


@register(
    "rolling_windows",
    # quantiles: both engines sort the frame and linearly interpolate on
    # the same doubles — raw values compare bit-exact
    oracle="""
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER w, 6) AS roll_sum,
               ROUND(AVG(value) OVER w, 6) AS roll_mean,
               MIN(value) OVER w AS roll_min,
               MAX(value) OVER w AS roll_max,
               COUNT(value) OVER w AS roll_count,
               quantile_cont(value, 0.5) OVER w AS roll_median,
               quantile_cont(value, 0.9) OVER w AS roll_p90,
               ROUND(SUM(value) OVER tw, 6) AS t_roll_sum,
               COUNT(value) OVER tw         AS t_roll_count
        FROM (SELECT *, epoch_us(ts) AS e FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               tw AS (PARTITION BY user_id ORDER BY e
                     RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    """,
    doc="sdf.rolling(7) agg matrix (streamz dataframe/core.py:94-127,"
        "757-770; row frame replaces backlog deque) incl. the exact "
        "interpolated rolling quantile/median, PLUS sdf.rolling('1h') "
        "(dataframe/core.py:430-510; range frame on epoch µs, (t-1h, t]) "
        "— both §2.4 rolling rows in one scan, two window frames",
)
def rolling_windows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = ops.rolling_count_window(
        ev,
        "event_id",
        {
            "roll_sum": ("value", "sum"),
            "roll_mean": ("value", "mean"),
            "roll_min": ("value", "min"),
            "roll_max": ("value", "max"),
            "roll_count": ("value", "count"),
        },
        n=7,
        partition_by=["user_id"],
    )
    out = ops.rolling_time_window(
        out, "ts", 3600.0,
        {"t_roll_sum": ("value", "sum"), "t_roll_count": ("value", "count")},
        partition_by=["user_id"],
    )
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-6, 0)
    return out.select(
        "event_id", "user_id",
        F.round("roll_sum", 6).alias("roll_sum"),
        F.round("roll_mean", 6).alias("roll_mean"),
        "roll_min", "roll_max", "roll_count",
        F.percentile("value", F.lit(0.5)).over(w).alias("roll_median"),
        F.percentile("value", F.lit(0.9)).over(w).alias("roll_p90"),
        F.round("t_roll_sum", 6).alias("t_roll_sum"),
        "t_roll_count",
    )


@register(
    "sliding_window_tuples",
    oracle="""
        SELECT event_id, user_id,
               array_to_string(list(value) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ',') AS last3
        FROM events
    """,
    doc="Stream.sliding_window(3) — streamz core.py:1269-1316; collect_list over row frame",
)
def sliding_window_tuples(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = ops.sliding_window_list(ev, "event_id", "value", 3, "last3", ["user_id"])
    return out.select(
        "event_id", "user_id", F.concat_ws(",", F.col("last3")).alias("last3")
    )


@register(
    "tumbling_window_hourly",
    # window_start emitted as an ISO string: Spark's pandas bridge yields
    # datetime64[ns], duckdb's [us] — a formatted string is dtype-proof
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    doc="Stream.timed_window (streamz core.py:1326-1362; F.window tumbling "
        "buckets) + Stream.timed_window_unique (core.py:1365-1481; "
        "per-window dedup by key) as the n_users distinct count",
)
def tumbling_window_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = ops.tumbling_window(
        ev, "ts", "1 hour",
        {
            "n": F.count(F.lit(1)),
            "sum_value": F.round(F.sum("value"), 4),
            "n_users": F.countDistinct("user_id"),
        },
        extra_keys=["event_type"],
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n", "sum_value", "n_users",
    )


@register(
    "sessionize",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                             > 1800 * 1000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sess AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value
        FROM sess GROUP BY user_id, session_id
    """,
    doc="sessionization: lag-gap-cumsum (batch analogue of session_window in streaming)",
)
def sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    wc = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    sess = ev.withColumn("session_id", F.sum(new_sess).over(wc))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@register(
    "ewm_mean_per_user",
    # the engine's per-key Arrow scan runs the num/den recurrence with
    # exactly the ops this recursive CTE performs → bit-identical raw
    # doubles (pandas-differential check in tests/test_windows.py)
    oracle="""
        WITH RECURSIVE t AS (
            SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
            FROM events
        ), r AS (
            -- all-DOUBLE arithmetic (bare literals would be DECIMAL and
            -- silently round den at scale 2)
            SELECT user_id, event_id, rn,
                   value + 0.7::DOUBLE * 0.0::DOUBLE AS num,
                   1.0::DOUBLE + 0.7::DOUBLE * 0.0::DOUBLE AS den
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.user_id, t.event_id, t.rn,
                   t.value + 0.7::DOUBLE * r.num,
                   1.0::DOUBLE + 0.7::DOUBLE * r.den
            FROM t JOIN r ON t.user_id = r.user_id AND t.rn = r.rn + 1
        )
        SELECT event_id, user_id, num / den AS ewm FROM r
    """,
    doc="sdf.ewm(alpha).mean() — streamz dataframe/core.py:659-754, EWMean aggregations.py:151-170; per-key Arrow scan",
)
def ewm_mean_per_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = ops.ewm_mean(
        ev.select("event_id", "user_id", "value"),
        "event_id", "value", "ewm",
        alpha=0.3, partition_by=["user_id"],
    )
    return out.select("event_id", "user_id", "ewm")


@register(
    "window_apply_custom",
    # custom fn over the window's contents: collect the frame rows as an
    # array and fold with F.aggregate — duckdb mirrors with list() OVER +
    # list_transform/list_sum (sequential fold, bit-identical)
    oracle="""
        SELECT event_id, user_id,
               list_sum(list_transform(lst, x -> x * x)) AS sum_sq_last5,
               len(lst) AS n_in_window
        FROM (
            SELECT event_id, user_id,
                   list(value) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS lst
            FROM events
        )
    """,
    doc="Window.apply/aggregate — arbitrary fn over window contents (streamz dataframe/core.py:598-633, Full/apply aggregations.py:132-148): collect_list + F.aggregate fold",
)
def window_apply_custom(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-4, 0)
    lst = F.collect_list("value").over(w)
    return ev.select(
        "event_id", "user_id",
        F.aggregate(lst, F.lit(0.0), lambda acc, x: acc + x * x).alias("sum_sq_last5"),
        F.size(lst).cast("long").alias("n_in_window"),
    )


@register(
    "window_frame_aggregates",
    oracle="""
        SELECT 'last_500_rows' AS win, '__all__' AS grp,
               COUNT(value) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM (SELECT value FROM events ORDER BY event_id DESC LIMIT 500)
        UNION ALL
        SELECT 'trailing_1d' AS win, event_type AS grp,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events, (SELECT MAX(epoch_us(ts)) AS m FROM events) bound
        WHERE epoch_us(ts) > m - 86400000000
        GROUP BY event_type
    """,
    doc="StreamingFrame frame-level windows in one tagged output: "
        "sdf.window(n=500).sum()/count() (streamz dataframe/"
        "core.py:129-169,582-596: updating aggregate over the trailing n "
        "rows; batch = final window state) and "
        "sdf.window(value='1d').groupby(...).agg() (Window.groupby, "
        "dataframe/core.py:635-638: grouped aggregate within the trailing "
        "time span)",
)
def window_frame_aggregates(spark, sf_dir):
    from streamz_spark.frame import StreamingFrame

    sf = StreamingFrame.from_table(spark, sf_dir, "events", order_col="event_id", ts_col="ts")
    last_n = (
        sf.window(n=500)
        ._slice()
        .select("value")
        .agg(
            F.count("value").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.lit("last_500_rows").alias("win"),
            F.lit("__all__").alias("grp"),
            "n", "sum_value",
        )
    )
    trailing = (
        sf.window(value="1d")
        .groupby("event_type")
        .agg(
            n=F.count(F.lit(1)),
            sum_value=F.round(F.sum("value"), 4),
        )
        .df
        .select(
            F.lit("trailing_1d").alias("win"),
            F.col("event_type").alias("grp"),
            "n", "sum_value",
        )
    )
    return last_n.unionByName(trailing)
