"""StreamingFrame: the user-facing streaming-dataframe API.

Mirrors the reference's collection layer (streamz/collection.py +
streamz/dataframe/core.py) over a PySpark DataFrame — batch or
streaming; the expression surface is identical because Spark unifies
the two. Where streamz type-checks chunks against an ``example`` frame
(collection.py:176-181), here the schema IS the DataFrame schema and
Catalyst's analyzer does the propagation the reference performs by
eagerly executing ops on the empty example (collection.py:20-21).

Semantics map (SURVEY.md §1.1):
- streamz "streaming" streams (per-chunk disjoint results) → append
  output mode / narrow transformations;
- streamz "updating" streams (aggregates re-emitting current value)
  → complete/update output mode at sink time.

Order-dependent ops (cumulative, rolling by position, ewm) require an
``order_col`` — the reference's implicit pandas index made explicit
(SURVEY.md §7 'event-time axis').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from streamz_spark.operators import windows as _w

__all__ = ["StreamingFrame", "StreamingSeries", "FrameGroupBy"]


def _col(x) -> Column:
    if isinstance(x, StreamingSeries):
        return x.expr
    if isinstance(x, Column):
        return x
    return F.lit(x)


def _require_time_typed(df: DataFrame, col: str, op: str) -> None:
    """Time-valued windows need a genuine event-time axis. A numeric
    order_col would silently cast to epoch seconds and produce
    semantically wrong windows — raise instead."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    dt = df.schema[col].dataType
    if not isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
        raise TypeError(
            f"{op} requires a timestamp-typed ts_col; got {col}: "
            f"{dt.simpleString()} (a numeric order column is not an "
            "event-time axis — pass ts_col=...)"
        )


class StreamingSeries:
    """A column expression bound to a StreamingFrame — streamz Series
    (dataframe/core.py:368-402). Arithmetic/comparison dunders build
    Column expressions (the OperatorMixin surface, collection.py:51-152).
    """

    def __init__(self, frame: "StreamingFrame", expr: Column, name: str = "value"):
        self.frame = frame
        self.expr = expr
        self.name = name

    def _wrap(self, expr: Column, name: str | None = None) -> "StreamingSeries":
        return StreamingSeries(self.frame, expr, name or self.name)

    # --- arithmetic (collection.py:51-152) ---
    def __add__(self, o): return self._wrap(self.expr + _col(o))
    def __radd__(self, o): return self._wrap(_col(o) + self.expr)
    def __sub__(self, o): return self._wrap(self.expr - _col(o))
    def __rsub__(self, o): return self._wrap(_col(o) - self.expr)
    def __mul__(self, o): return self._wrap(self.expr * _col(o))
    def __rmul__(self, o): return self._wrap(_col(o) * self.expr)
    def __truediv__(self, o): return self._wrap(self.expr / _col(o))
    def __rtruediv__(self, o): return self._wrap(_col(o) / self.expr)
    def __floordiv__(self, o): return self._wrap(F.floor(self.expr / _col(o)))
    def __mod__(self, o): return self._wrap(self.expr % _col(o))
    def __pow__(self, o): return self._wrap(F.pow(self.expr, _col(o)))
    def __neg__(self): return self._wrap(-self.expr)
    def __abs__(self): return self._wrap(F.abs(self.expr))
    def abs(self): return self.__abs__()

    # --- comparison → boolean series (filter masks) ---
    def __gt__(self, o): return self._wrap(self.expr > _col(o))
    def __ge__(self, o): return self._wrap(self.expr >= _col(o))
    def __lt__(self, o): return self._wrap(self.expr < _col(o))
    def __le__(self, o): return self._wrap(self.expr <= _col(o))
    def __eq__(self, o): return self._wrap(self.expr == _col(o))  # type: ignore[override]
    def __ne__(self, o): return self._wrap(self.expr != _col(o))  # type: ignore[override]
    def __and__(self, o): return self._wrap(self.expr & _col(o))
    def __or__(self, o): return self._wrap(self.expr | _col(o))
    def __invert__(self): return self._wrap(~self.expr)

    def isin(self, values): return self._wrap(self.expr.isin(*values))

    # --- elementwise helpers (dataframe/core.py:19-43) ---
    def round(self, decimals: int = 0): return self._wrap(F.round(self.expr, decimals))
    def astype(self, dtype: str): return self._wrap(self.expr.cast(dtype))

    def map(self, fn, dtype: str = "double"):
        """Arbitrary Python callable via Arrow-batched pandas UDF —
        streamz Series.map (dataframe/core.py:42-43), the sanctioned
        slow path."""
        import pandas as pd  # noqa: F401

        udf = F.pandas_udf(dtype)(fn)
        return self._wrap(udf(self.expr))

    # --- aggregations → one-row updating frame (dataframe/core.py:59-92) ---
    def _agg(self, agg: Column, name: str) -> "StreamingFrame":
        return self.frame._agg_frame(lambda df: df.agg(agg.alias(name)))

    def sum(self): return self._agg(F.sum(self.expr), f"{self.name}_sum")
    def count(self): return self._agg(F.count(self.expr), f"{self.name}_count")
    def mean(self): return self._agg(F.avg(self.expr), f"{self.name}_mean")
    def min(self): return self._agg(F.min(self.expr), f"{self.name}_min")
    def max(self): return self._agg(F.max(self.expr), f"{self.name}_max")
    def var(self, ddof: int = 1):
        fn = F.var_samp if ddof == 1 else F.var_pop
        return self._agg(fn(self.expr), f"{self.name}_var")
    def std(self, ddof: int = 1):
        fn = F.stddev_samp if ddof == 1 else F.stddev_pop
        return self._agg(fn(self.expr), f"{self.name}_std")

    def value_counts(self) -> "StreamingFrame":
        """streamz Series.value_counts (dataframe/core.py:394-398)."""
        expr, name = self.expr, self.name
        return self.frame._agg_frame(
            lambda df: df.groupBy(expr.alias(name)).agg(F.count(F.lit(1)).alias("count"))
        )

    def to_frame(self) -> "StreamingFrame":
        return StreamingFrame(self.frame.df.select(self.expr.alias(self.name)),
                              order_col=self.frame.order_col)


class StreamingFrame:
    """streamz DataFrame equivalent (dataframe/core.py:299-356).

    ``order_col`` is the explicit event order (the reference's implicit
    pandas index); ``ts_col`` the event-time column for time-valued
    windows (the reference's DatetimeIndex, dataframe/core.py:530-531).
    """

    def __init__(
        self,
        df: DataFrame,
        order_col: str | None = None,
        ts_col: str | None = None,
        updating: bool = False,
        _base: DataFrame | None = None,
        _post=None,
    ):
        self.df = df
        self.order_col = order_col
        self.ts_col = ts_col
        # streamz "updating" stream marker (core semantics table,
        # dataframe/core.py:59-92): aggregates re-emit their current
        # value on every input chunk.
        self.updating = updating
        # Deferred composition (SURVEY.md §7 'updating-stream
        # composability'): Spark forbids a second streaming aggregation
        # in one plan, so ops past the first streaming aggregate are
        # recorded as a closure (`_post`) applied per micro-batch to the
        # complete-mode output of `_base`.  `df` is then a static empty
        # placeholder carrying the output schema (the analogue of the
        # reference's `example` frame, collection.py:20-21).
        self._base = _base
        self._post = _post

    # --- deferred composition over the first streaming aggregate ---
    def _needs_defer(self) -> bool:
        return self._base is not None or (self.df.isStreaming and self.updating)

    def _defer(self, fn) -> "StreamingFrame":
        """Compose `fn` (static DataFrame -> DataFrame) to run per
        micro-batch on the complete-mode output of the first streaming
        aggregation — foreachBatch composition of updating streams
        (reference: aggregates feeding further aggregation,
        dataframe/tests/test_dataframes.py:469,671)."""
        spark = self.df.sparkSession
        if self._base is None:
            base = self.df
            placeholder = spark.createDataFrame([], self.df.schema)
            post = fn
        else:
            base = self._base
            placeholder = self.df
            prev = self._post

            def post(static_df, _prev=prev, _fn=fn):
                return _fn(_prev(static_df))

        return StreamingFrame(fn(placeholder), updating=True, _base=base, _post=post)

    def _agg_frame(self, fn) -> "StreamingFrame":
        """Apply an aggregate plan builder, deferring past the first
        streaming aggregation."""
        if self._needs_defer():
            return self._defer(fn)
        return StreamingFrame(fn(self.df), updating=True)

    # --- frame-level arithmetic (OperatorMixin, collection.py:51-152):
    # elementwise over numeric columns, name-preserving — what makes
    # `sdf.x.sum() + 1` an updating expression like the reference
    # (test_dataframes.py:671). A projection after a streaming aggregate
    # is legal in one plan, so no deferral is needed for the first hop.
    def _map_numeric(self, colfn) -> "StreamingFrame":
        from pyspark.sql.types import NumericType

        def apply(sdf: DataFrame) -> DataFrame:
            cols = [
                colfn(F.col(f.name)).alias(f.name)
                if isinstance(f.dataType, NumericType) else F.col(f.name)
                for f in sdf.schema.fields
            ]
            return sdf.select(*cols)

        if self._base is not None:
            return self._defer(apply)
        return StreamingFrame(apply(self.df), order_col=self.order_col,
                              ts_col=self.ts_col, updating=self.updating)

    def __add__(self, o): return self._map_numeric(lambda c: c + _col(o))
    def __radd__(self, o): return self._map_numeric(lambda c: _col(o) + c)
    def __sub__(self, o): return self._map_numeric(lambda c: c - _col(o))
    def __rsub__(self, o): return self._map_numeric(lambda c: _col(o) - c)
    def __mul__(self, o): return self._map_numeric(lambda c: c * _col(o))
    def __rmul__(self, o): return self._map_numeric(lambda c: _col(o) * c)
    def __truediv__(self, o): return self._map_numeric(lambda c: c / _col(o))
    def __mod__(self, o): return self._map_numeric(lambda c: c % _col(o))
    def __pow__(self, o): return self._map_numeric(lambda c: F.pow(c, _col(o)))
    def __neg__(self): return self._map_numeric(lambda c: -c)
    def __abs__(self): return self._map_numeric(F.abs)

    # --- construction ---
    @classmethod
    def from_table(
        cls, spark, sf_dir: str, name: str,
        order_col: str | None = None, ts_col: str | None = None,
    ):
        from streamz_spark.io import load_table

        return cls(load_table(spark, sf_dir, name), order_col=order_col, ts_col=ts_col)

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def _series(self, name: str) -> StreamingSeries:
        return StreamingSeries(self, F.col(name), name)

    # --- projection / filter (dataframe/core.py:239-246) ---
    def __getitem__(self, key):
        if isinstance(key, str):
            return self._series(key)
        if isinstance(key, list):
            return StreamingFrame(self.df.select(*key), order_col=self.order_col)
        if isinstance(key, StreamingSeries):  # boolean mask
            return StreamingFrame(self.df.filter(key.expr), order_col=self.order_col)
        raise TypeError(f"cannot index with {type(key)}")

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self.df.columns:
            return self._series(name)
        raise AttributeError(name)

    def query(self, expr: str) -> "StreamingFrame":
        """SQL-string predicate — streamz query (dataframe/core.py:294)."""
        return StreamingFrame(self.df.filter(expr), order_col=self.order_col)

    def assign(self, **kwargs) -> "StreamingFrame":
        """streamz assign/setitem (dataframe/core.py:255-292)."""
        out = self.df.withColumns({k: _col(v) for k, v in kwargs.items()})
        return StreamingFrame(out, order_col=self.order_col)

    def __setitem__(self, key: str, value):
        self.df = self.df.withColumn(key, _col(value))

    def select_expr(self, *exprs: str) -> "StreamingFrame":
        return StreamingFrame(self.df.selectExpr(*exprs), order_col=self.order_col)

    def map_partitions(self, fn, schema) -> "StreamingFrame":
        """Arbitrary per-chunk pandas function — streamz map_partitions
        (collection.py:9-48) as mapInPandas (Arrow batches)."""

        def gen(it):
            for pdf in it:
                yield fn(pdf)

        return StreamingFrame(self.df.mapInPandas(gen, schema=schema),
                              order_col=self.order_col)

    # --- reductions (updating; dataframe/core.py:59-92,203-227) ---
    def _num_cols(self):
        from pyspark.sql.types import NumericType

        return [f.name for f in self.df.schema.fields if isinstance(f.dataType, NumericType)]

    def _agg_all(self, fn, suffix: str) -> "StreamingFrame":
        aggs = [fn(c).alias(f"{c}{suffix}") for c in self._num_cols()]
        return self._agg_frame(lambda df: df.agg(*aggs))

    def sum(self): return self._agg_all(F.sum, "_sum")
    def mean(self): return self._agg_all(F.avg, "_mean")
    def count(self): return self._agg_all(F.count, "_count")
    @property
    def size(self) -> "StreamingFrame":
        return self._agg_frame(lambda df: df.agg(F.count(F.lit(1)).alias("size")))

    def tail(self, n: int) -> "StreamingFrame":
        """Last n rows by order_col. sort-desc + limit compiles to
        TakeOrderedAndProject: per-partition top-n heaps merged once —
        parallel, unlike a keyless row_number window (one task)."""
        if not self.order_col:
            raise ValueError("tail requires order_col")
        return StreamingFrame(
            self.df.orderBy(F.col(self.order_col).desc()).limit(n),
            order_col=self.order_col,
        )

    def nlargest(self, n: int, col: str) -> "StreamingFrame":
        return StreamingFrame(self.df.orderBy(F.col(col).desc()).limit(n))

    # --- groupby (dataframe/core.py:789-838) ---
    def groupby(self, by) -> "FrameGroupBy":
        return FrameGroupBy(self, by)

    # --- windows (dataframe/core.py:94-197,413-510,582-656) ---
    def window(self, n: int | None = None, value: str | None = None):
        """streamz window(n=)/window(value=) (dataframe/core.py:129-169):
        aggregate over the trailing n rows / time span of the whole
        stream — an *updating* result. Batch semantics = the final
        window state; streaming = streaming.stateful count windows."""
        return TrailingWindow(self, n, value)

    def rolling(self, window, min_periods: int | None = None, partition_by: list[str] | None = None):
        """pandas-parity defaults: an integer window inherits
        min_periods=window (NaN for the first n-1 rows, like the
        reference's df.rolling passthrough); time-valued windows default
        to min_periods=1, also like pandas."""
        if min_periods is None:
            min_periods = window if isinstance(window, int) else 1
        return Rolling(self, window, min_periods, partition_by or [])

    def expanding(self, partition_by: list[str] | None = None):
        return Expanding(self, partition_by or [])

    def ewm(self, com=None, span=None, halflife=None, alpha=None,
            partition_by: list[str] | None = None):
        return EWM(self, dict(com=com, span=span, halflife=halflife, alpha=alpha),
                   partition_by or [])

    def _cum(self, col: str, op: str, partition_by=None) -> "StreamingFrame":
        if not self.order_col:
            raise ValueError("cumulative ops require order_col")
        return StreamingFrame(
            _w.cumulative(self.df, self.order_col, col, op, f"{col}_cum{op}", partition_by),
            order_col=self.order_col,
        )

    def cumsum(self, col: str, partition_by=None): return self._cum(col, "sum", partition_by)
    def cummax(self, col: str, partition_by=None): return self._cum(col, "max", partition_by)
    def cummin(self, col: str, partition_by=None): return self._cum(col, "min", partition_by)
    def cumprod(self, col: str, partition_by=None): return self._cum(col, "prod", partition_by)

    # --- plumbing ---
    def to_spark(self) -> DataFrame:
        return self.df

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode)

    def to_pandas(self):
        return self.df.toPandas()


_GROUP_AGGS = {
    "sum": F.sum, "mean": F.avg, "count": F.count,
    "min": F.min, "max": F.max,
    "var": F.var_samp, "std": F.stddev_samp,
}


class FrameGroupBy:
    """streamz GroupBy (dataframe/core.py:789-881): grouper may be a
    column name, list of names, or computed StreamingSeries
    (``sdf.groupby(sdf.x % 3)``)."""

    def __init__(self, frame: StreamingFrame, by, cols: list[str] | None = None):
        self.frame = frame
        if isinstance(by, StreamingSeries):
            self._keys = [by.expr.alias(f"key_{by.name}")]
            self._keynames = [f"key_{by.name}"]
        elif isinstance(by, str):
            self._keys = [F.col(by)]
            self._keynames = [by]
        else:
            self._keys = [F.col(c) for c in by]
            self._keynames = list(by)
        self._cols = cols

    def __getitem__(self, cols) -> "FrameGroupBy":
        cols = [cols] if isinstance(cols, str) else list(cols)
        out = FrameGroupBy(self.frame, "_")
        out._keys, out._keynames, out._cols = self._keys, self._keynames, cols
        return out

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self.frame.df.columns:
            return self[name]
        raise AttributeError(name)

    def _value_cols(self) -> list[str]:
        if self._cols:
            return self._cols
        from pyspark.sql.types import NumericType

        return [
            f.name for f in self.frame.df.schema.fields
            if isinstance(f.dataType, NumericType) and f.name not in self._keynames
        ]

    def _agg(self, op: str) -> StreamingFrame:
        fn = _GROUP_AGGS[op]
        aggs = [fn(c).alias(f"{c}_{op}") for c in self._value_cols()]
        keys = self._keys
        return self.frame._agg_frame(lambda df: df.groupBy(*keys).agg(*aggs))

    def sum(self): return self._agg("sum")
    def mean(self): return self._agg("mean")
    def count(self): return self._agg("count")
    def min(self): return self._agg("min")
    def max(self): return self._agg("max")
    def var(self): return self._agg("var")
    def std(self): return self._agg("std")

    def size(self) -> StreamingFrame:
        keys = self._keys
        return self.frame._agg_frame(
            lambda df: df.groupBy(*keys).agg(F.count(F.lit(1)).alias("size"))
        )

    def agg(self, **aliased) -> StreamingFrame:
        aggs = [_col(v).alias(k) for k, v in aliased.items()]
        keys = self._keys
        return self.frame._agg_frame(lambda df: df.groupBy(*keys).agg(*aggs))


class TrailingWindow:
    """streamz Window (dataframe/core.py:582-638): last-n-rows or
    trailing-time slice of the stream, aggregated as an updating value.
    Batch = final window state (top-n by order / ts >= max_ts - span)."""

    def __init__(self, frame: StreamingFrame, n: int | None, value: str | None):
        if (n is None) == (value is None):
            raise ValueError("exactly one of n= or value= required")
        self.frame, self.n, self.value = frame, n, value

    def _slice(self) -> DataFrame:
        f = self.frame
        if self.n is not None:
            if not f.order_col:
                raise ValueError("window(n=) requires order_col")
            # TakeOrderedAndProject: parallel per-partition top-n, not a
            # keyless row_number window (single task over all rows)
            return f.df.orderBy(F.col(f.order_col).desc()).limit(self.n)
        ts = f.ts_col or f.order_col
        if not ts:
            raise ValueError("window(value=) requires ts_col")
        _require_time_typed(f.df, ts, "window(value=)")
        import pandas as pd

        span_us = int(pd.Timedelta(self.value).total_seconds() * 1_000_000)
        bound = f.df.agg(F.max(F.unix_micros(F.col(ts).cast("timestamp"))).alias("m"))
        return f.df.join(F.broadcast(bound)).filter(
            F.unix_micros(F.col(ts).cast("timestamp")) > F.col("m") - span_us
        ).drop("m")

    def _agg_all(self, fn, suffix: str) -> StreamingFrame:
        from pyspark.sql.types import NumericType

        sliced = self._slice()
        cols = [fl.name for fl in self.frame.df.schema.fields if isinstance(fl.dataType, NumericType)]
        return StreamingFrame(sliced.agg(*[fn(c).alias(f"{c}{suffix}") for c in cols]))

    def sum(self): return self._agg_all(F.sum, "_sum")
    def mean(self): return self._agg_all(F.avg, "_mean")
    def count(self): return self._agg_all(F.count, "_count")
    def min(self): return self._agg_all(F.min, "_min")
    def max(self): return self._agg_all(F.max, "_max")
    def var(self, ddof: int = 1):
        return self._agg_all(F.var_samp if ddof == 1 else F.var_pop, "_var")
    def std(self, ddof: int = 1):
        return self._agg_all(F.stddev_samp if ddof == 1 else F.stddev_pop, "_std")

    @property
    def size(self) -> StreamingFrame:
        """Window.size (aggregations.py:79-89): rows in the window."""
        return StreamingFrame(self._slice().agg(F.count(F.lit(1)).alias("size")))

    def value_counts(self, col: str) -> StreamingFrame:
        """Window.value_counts (aggregations.py:509-521) over the
        trailing slice."""
        return StreamingFrame(
            self._slice().groupBy(F.col(col)).agg(F.count(F.lit(1)).alias("count"))
        )

    def apply(self, fn, schema) -> StreamingFrame:
        """Window.apply (aggregations.py:132-148): arbitrary pandas fn
        over the window contents (Arrow-batched; the JVM-side fold
        variant lives in queries/windows.py window_apply_custom)."""
        sliced = self._slice()

        def gen(it):
            import pandas as pd

            pdfs = [pdf for pdf in it]
            if pdfs:
                yield fn(pd.concat(pdfs, ignore_index=True))

        return StreamingFrame(sliced.coalesce(1).mapInPandas(gen, schema=schema))

    def groupby(self, by) -> "FrameGroupBy":
        """Window.groupby (dataframe/core.py:635-638): grouped aggregate
        within the trailing window."""
        return FrameGroupBy(StreamingFrame(self._slice(), self.frame.order_col, self.frame.ts_col), by)

    def full(self) -> StreamingFrame:
        """Window.full (aggregations.py:132-148): the window contents."""
        return StreamingFrame(self._slice(), self.frame.order_col, self.frame.ts_col)


class Rolling:
    """streamz rolling (dataframe/core.py:94-127): int window → last-n
    rows; str/interval → trailing time window on order_col/ts."""

    def __init__(self, frame: StreamingFrame, window, min_periods: int, partition_by):
        self.frame, self.window = frame, window
        self.min_periods, self.partition_by = min_periods, partition_by

    def _run(self, col: str, op: str) -> StreamingFrame:
        f = self.frame
        name = f"{col}_roll_{op}"
        if isinstance(self.window, int):
            if not f.order_col:
                raise ValueError("rolling(n) requires order_col")
            out = _w.rolling_count_window(
                f.df, f.order_col, {name: (col, op)}, self.window,
                self.partition_by, self.min_periods,
            )
        else:
            # time-valued window: needs the event-time column, the
            # reference's DatetimeIndex (dataframe/core.py:530-531)
            ts = f.ts_col or f.order_col
            if not ts:
                raise ValueError("rolling('interval') requires ts_col")
            _require_time_typed(f.df, ts, "rolling('interval')")
            import pandas as pd

            seconds = pd.Timedelta(self.window).total_seconds()
            out = _w.rolling_time_window(
                f.df, ts, seconds, {name: (col, op)}, self.partition_by
            )
        return StreamingFrame(out, order_col=f.order_col, ts_col=f.ts_col)

    def __getattr__(self, op):
        if op in ("sum", "mean", "min", "max", "count", "std", "var", "median"):
            return lambda col: self._run(col, op)
        raise AttributeError(op)


class Expanding:
    """streamz expanding (dataframe/core.py:171-172,641-656)."""

    def __init__(self, frame: StreamingFrame, partition_by):
        self.frame, self.partition_by = frame, partition_by

    def __getattr__(self, op):
        if op in ("sum", "mean", "min", "max", "count", "std", "var"):
            def run(col):
                f = self.frame
                if not f.order_col:
                    raise ValueError("expanding requires order_col")
                out = _w.expanding(
                    f.df, f.order_col, {f"{col}_exp_{op}": (col, op)}, self.partition_by
                )
                return StreamingFrame(out, order_col=f.order_col)
            return run
        raise AttributeError(op)


class EWM:
    """streamz ewm (dataframe/core.py:174-175,659-754) — mean only,
    like the reference (EWMean is its only EWM agg)."""

    def __init__(self, frame: StreamingFrame, params, partition_by):
        self.frame, self.params, self.partition_by = frame, params, partition_by

    def mean(self, col: str) -> StreamingFrame:
        f = self.frame
        if not f.order_col:
            raise ValueError("ewm requires order_col")
        out = _w.ewm_mean(
            f.df, f.order_col, col, f"{col}_ewm",
            partition_by=self.partition_by, **{k: v for k, v in self.params.items() if v is not None},
        )
        return StreamingFrame(out, order_col=f.order_col)
