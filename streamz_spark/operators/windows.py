"""Window operators: rolling / expanding / cumulative / EWM / count-windows.

Re-expresses the reference's window surface (streamz/dataframe/core.py:
94-197, 413-510, 582-656, 659-754; aggregations.py:151-320) on Spark
window functions. The reference keeps a backlog deque of chunks and
add/subtracts expired rows (`on_new`/`on_old`); Catalyst's window exec
computes the same result declaratively — per-partition sorted scan
with a sliding frame, no Python in the loop, and it scales out by the
partition key instead of a single driver-side deque.

EWM is the one genuinely order-dependent recurrence (reference
EWMean: aggregations.py:151-170); it runs as an Arrow-batched
grouped-map pandas UDF — one sequential scan per key, distributed
across keys. At 100 TB you EWM per entity (user, symbol), never
globally, so per-key parallelism is the right scale story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = [
    "rolling_count_window",
    "rolling_time_window",
    "expanding",
    "cumulative",
    "ewm_mean",
    "sliding_window_list",
    "tumbling_window",
    "session_window_agg",
]

_AGG_FNS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
}


def _agg_over(col: str, op: str, frame) -> Column:
    if op in _AGG_FNS:
        return _AGG_FNS[op](col).over(frame)
    raise ValueError(f"unsupported rolling op: {op}")


def rolling_count_window(
    df: DataFrame,
    order_by: str,
    aggs: dict[str, tuple[str, str]],
    n: int,
    partition_by: list[str] | None = None,
    min_periods: int = 1,
) -> DataFrame:
    """pandas-semantics rolling over the last ``n`` rows (result per row).

    aggs: {out_name: (col, op)}. Reference: streamz rolling(int)
    (dataframe/core.py:94-127,757-770).
    """
    w = W.partitionBy(*(partition_by or [])).orderBy(order_by)
    frame = w.rowsBetween(-(n - 1), 0)
    cnt_w = F.count(F.lit(1)).over(frame)
    out = df
    for name, (col, op) in aggs.items():
        expr = _agg_over(col, op, frame)
        if min_periods > 1:
            expr = F.when(cnt_w >= min_periods, expr)
        out = out.withColumn(name, expr)
    return out


def rolling_time_window(
    df: DataFrame,
    ts_col: str,
    interval_seconds: float,
    aggs: dict[str, tuple[str, str]],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Rolling over a trailing time interval ``(ts - interval, ts]``.

    Uses a range frame on epoch microseconds — pure Catalyst, no state
    backlog; frame is (t - interval, t], pandas rolling semantics.
    Reference: rolling('3h') via backlog + df.rolling
    (dataframe/core.py:430-510).
    """
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = df.withColumn("__epoch", epoch)
    w = (
        W.partitionBy(*(partition_by or []))
        .orderBy("__epoch")
        .rangeBetween(-(int(interval_seconds * 1_000_000) - 1), 0)
    )
    out = df
    for name, (col, op) in aggs.items():
        out = out.withColumn(name, _agg_over(col, op, w))
    return out.drop("__epoch")


def expanding(
    df: DataFrame,
    order_by: str,
    aggs: dict[str, tuple[str, str]],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Everything-so-far window, result per row.

    Reference: sdf.expanding() (dataframe/core.py:171-172,641-656).

    Keyless + carryable ops (sum/min/max/count/mean) run the two-level
    range-partition scan (``operators.order.global_cumulative_multi``)
    — no single-task global window; var/std keep the window form (their
    merge needs Chan-style moment combination; use a keyed expanding at
    scale).
    """
    carryable = {"sum", "min", "max", "count", "mean", "avg"}
    if not partition_by and all(op in carryable for _, op in aggs.values()):
        from streamz_spark.operators.order import global_cumulative_multi

        return global_cumulative_multi(
            df, [order_by], [(col, op, name) for name, (col, op) in aggs.items()]
        )
    w = (
        W.partitionBy(*(partition_by or []))
        .orderBy(order_by)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = df
    for name, (col, op) in aggs.items():
        out = out.withColumn(name, _agg_over(col, op, w))
    return out


def cumulative(
    df: DataFrame,
    order_by: str,
    col: str,
    op: str,
    out_name: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """cumsum/cummax/cummin/cumprod (reference dataframe/core.py:177-197).

    cumprod has no built-in — sign-aware exp(sum(log|x|)) with an
    any-zero flag, still whole-stage-codegen'd (no UDF).

    Keyless (no ``partition_by``) dispatches to
    ``operators.order.global_cumulative`` — the two-level
    range-partition + carry scan — instead of a single-task global
    window.
    """
    if not partition_by:
        from streamz_spark.operators.order import global_cumulative

        return global_cumulative(df, [order_by], col, op, out_name)
    w = (
        W.partitionBy(*partition_by)
        .orderBy(order_by)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = F.col(col)
    if op == "sum":
        expr = F.sum(c).over(w)
    elif op == "max":
        expr = F.max(c).over(w)
    elif op == "min":
        expr = F.min(c).over(w)
    elif op == "prod":
        any_zero = F.max((c == 0).cast("int")).over(w) == 1
        neg_cnt = F.sum((c < 0).cast("int")).over(w)
        magnitude = F.exp(F.sum(F.log(F.abs(c))).over(w))
        sign = F.when(neg_cnt % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
        expr = F.when(any_zero, F.lit(0.0)).otherwise(sign * magnitude)
    else:
        raise ValueError(f"unsupported cumulative op: {op}")
    return df.withColumn(out_name, expr)


def _ewm_adjust_vectorized(values, decay: float):
    """Blocked numpy evaluation of the adjust=True EWM recurrence.

    Closed form: num_i = Σ_{j≤i} x_j·d^(i-j), den_i = Σ_{j≤i} d^(i-j)
    with d = 1-α. Naive vectorization (d^i · cumsum(x_j·d^(-j)))
    overflows d^(-j) for long series; instead process blocks of B
    elements, carrying (num, den) across block boundaries:
      num_{s+i} = d^i · (d·carry_num + Σ_{j=0..i} x_{s+j}·d^(-j))
    B is sized so d^(-(B-1)) stays below ~1e250.
    """
    import numpy as np

    x = np.asarray(values, dtype="float64")
    n = len(x)
    if n == 0:
        return x
    if decay <= 0.0:  # alpha == 1: ewm is the value itself
        return x.copy()
    if decay >= 1.0:  # alpha == 0: expanding mean
        return np.cumsum(x) / np.arange(1, n + 1)
    # largest block where d^(-(B-1)) <= 1e250
    block = max(1, int(250.0 / -np.log10(decay)))
    out = np.empty(n, dtype="float64")
    carry_num = 0.0
    carry_den = 0.0
    for s in range(0, n, block):
        xb = x[s : s + block]
        m = len(xb)
        neg_pw = decay ** -np.arange(m)  # d^(-j), bounded by block sizing
        pw = decay ** np.arange(m)  # d^(+i)
        num = pw * (decay * carry_num + np.cumsum(xb * neg_pw))
        den = pw * (decay * carry_den + np.cumsum(neg_pw))
        out[s : s + m] = num / den
        carry_num = num[m - 1]
        carry_den = den[m - 1]
    return out


def ewm_mean(
    df: DataFrame,
    order_by: str,
    col: str,
    out_name: str,
    *,
    alpha: float | None = None,
    com: float | None = None,
    span: float | None = None,
    halflife: float | None = None,
    partition_by: list[str] | None = None,
    adjust: bool = True,
    bit_exact: bool = True,
) -> DataFrame:
    """Exponentially-weighted mean, pandas semantics (reference EWMean,
    streamz/dataframe/aggregations.py:151-170 — keeps (result, old_wt)
    state; here: one Arrow-batched sequential scan per key).

    ``bit_exact`` applies to the ``adjust=True`` scan only (the default
    and the reference's semantics): ``True`` runs the num/den
    recurrence op-for-op like a SQL recursive CTE so a DuckDB oracle
    reproduces it bit-exactly; ``False`` uses a blocked numpy
    recurrence (~50x less Python overhead per key; matches the loop to
    ~1e-13 relative) with per-block rescaling so ``(1-a)**n`` never
    under/overflows regardless of series length. ``adjust=False``
    already evaluates through pandas' C kernel — there is no Python
    loop for the flag to bypass, so it is ignored there.
    """
    if alpha is None:
        if com is not None:
            alpha = 1.0 / (1.0 + com)
        elif span is not None:
            alpha = 2.0 / (span + 1.0)
        elif halflife is not None:
            import math

            alpha = 1.0 - math.exp(-math.log(2.0) / halflife)
        else:
            raise ValueError("one of alpha/com/span/halflife required")

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    keys = partition_by or []
    # fresh StructType — .add() would mutate the DataFrame's cached schema
    schema = StructType(list(df.schema.fields) + [StructField(out_name, DoubleType())])
    a = alpha
    decay = 1.0 - a

    def _series_ewm(values):
        if adjust:
            if not bit_exact:
                return _ewm_adjust_vectorized(values, decay)
            # explicit num/den recurrence (same math as pandas adjust=True):
            #   num_i = x_i + (1-a)·num_{i-1};  den_i = 1 + (1-a)·den_{i-1}
            # written op-for-op like a SQL recursive CTE so a duckdb
            # oracle reproduces it bit-exactly
            num = 0.0
            den = 0.0
            out = []
            for v in values:
                num = v + decay * num
                den = 1.0 + decay * den
                out.append(num / den)
            return out
        import pandas as pd

        return pd.Series(values).ewm(alpha=a, adjust=False).mean().tolist()

    def scan(pdf):
        pdf = pdf.sort_values(order_by)
        pdf[out_name] = _series_ewm(pdf[col].to_numpy(dtype="float64"))
        return pdf

    if keys:
        # one Arrow pass per partition (vs per group): repartition on the
        # key so each key's rows land together, then run the per-key scan
        # inside mapInPandas — ~30% less Arrow/pandas overhead than
        # groupBy().applyInPandas at high key counts
        sort_cols = list(keys) + [order_by]

        def scan_partition(batches):
            import pandas as pd

            frames = list(batches)
            if not frames:
                return
            pdf = pd.concat(frames, ignore_index=True)
            if not len(pdf):
                return
            pdf = pdf.sort_values(sort_cols, ignore_index=True)
            out = []
            for _, g in pdf.groupby(list(keys), sort=False):
                out.extend(_series_ewm(g[col].to_numpy(dtype="float64")))
            pdf[out_name] = out
            yield pdf

        return df.repartition(*keys).mapInPandas(scan_partition, schema=schema)
    # global EWM: inherently sequential — single group (scale caveat
    # documented in module docstring; prefer per-key EWM at scale)
    g_schema = StructType(
        list(df.schema.fields)
        + [StructField("__g", IntegerType()), StructField(out_name, DoubleType())]
    )
    return (
        df.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda pdf: scan(pdf), schema=g_schema)
        .drop("__g")
    )


def sliding_window_list(
    df: DataFrame,
    order_by: str,
    col: str,
    n: int,
    out_name: str = "window",
    partition_by: list[str] | None = None,
    return_partial: bool = True,
) -> DataFrame:
    """Overlapping tuples of the last n events (reference sliding_window,
    core.py:1269-1316) — collect_list over a row frame.

    Keyless dispatches to :func:`sliding_tuples_global` (explode +
    window-id groupBy, parallel); keyed stays a row-frame window on the
    key shuffle.
    """
    if not partition_by:
        return sliding_tuples_global(df, order_by, col, n, out_name, return_partial)
    w = W.partitionBy(*partition_by).orderBy(order_by).rowsBetween(-(n - 1), 0)
    out = df.withColumn(out_name, F.collect_list(col).over(w))
    if not return_partial:
        out = out.filter(F.size(out_name) == n)
    return out


def sliding_tuples_global(
    df: DataFrame,
    order_by: str,
    col: str,
    n: int,
    out_name: str = "window",
    return_partial: bool = True,
) -> DataFrame:
    """Global-order sliding tuples without a single-task window.

    Each row at dense position p (operators.order.global_index) is a
    member of windows p..p+n-1, so it explodes into n (window_id, value)
    contributions; grouping on window_id rebuilds each trailing tuple.
    The shuffle moves n·rows records — proportional to the OUTPUT
    (every sliding-window result is an n-tuple), i.e. the minimum any
    distribution of this operator must pay. Windows past the last row
    are dropped by requiring the window's own row (pos == window_id)
    to be present.
    """
    from streamz_spark.operators.order import global_index

    idx = global_index(df.select(order_by, col), [order_by], "__pos")
    contrib = idx.select(
        F.col(order_by),
        F.col(col),
        F.col("__pos"),
        F.explode(
            F.sequence(F.col("__pos"), F.col("__pos") + F.lit(n - 1))
        ).alias("__w"),
    )
    grouped = (
        contrib.groupBy("__w")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__pos"), F.col(col).alias("v")))
            ).alias("__m"),
            F.max("__pos").alias("__maxp"),
            F.max_by(F.col(order_by), F.col("__pos")).alias(order_by),
        )
        # keep only windows anchored at a real row (tail windows whose
        # anchor position exceeds the data are artifacts of the explode)
        .filter(F.col("__maxp") == F.col("__w"))
        .select(
            order_by,
            F.transform("__m", lambda m: m.getField("v")).alias(out_name),
        )
    )
    if not return_partial:
        grouped = grouped.filter(F.size(out_name) == n)
    return grouped


def tumbling_window(
    df: DataFrame,
    ts_col: str,
    interval: str,
    aggs: dict[str, Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """timed_window (reference core.py:1326-1362): everything seen per
    interval, as F.window tumbling buckets + aggregates.
    """
    keys = [F.window(ts_col, interval).alias("win")] + [F.col(k) for k in (extra_keys or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.withColumn("window_start", F.col("win.start")).withColumn(
        "window_end", F.col("win.end")
    ).drop("win")


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization on the built-in ``F.session_window`` —
    the engine-native counterpart of the batch lag-gap-cumsum
    sessionize (queries/windows.py): a session extends while the next
    event arrives within ``gap`` of the previous one.

    Works on batch AND streaming frames; streaming append mode
    requires a ``watermark`` so sessions can close (Spark merges
    session state in the state store, evicted once the watermark
    passes the session end — the built-in handles merge-on-late-event,
    which the cumsum formulation cannot).

    Scale: one shuffle on (key) with session merge in the agg — no
    per-key ordered window scan, so no skewed-key sort bottleneck;
    this is the plan to prefer at 100 TB when session bounds (not
    per-event session ids) are the output.
    """
    out = df
    if watermark is not None:
        out = out.withWatermark(ts_col, watermark)
    gb = [F.session_window(F.col(ts_col), gap).alias("session")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        out.groupBy(*gb)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            *[F.col(k) for k in (keys or [])],
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *[F.col(n) for n in aggs],
        )
    )
