"""Stream: the core-layer fluent API (reference: streamz/core.py).

A Stream wraps a DataFrame of events with a monotonic ``seq`` column —
the explicit form of the reference's implicit emission order (its
push-based DAG delivers events depth-first in insertion order,
core.py:429-462). Scalar streams carry a single ``value`` column;
record streams carry arbitrary columns.

The fluent methods build lazy DataFrame lineage — graph construction
IS logical-plan construction, exactly the reference's model
(SURVEY.md §3 entry point A) with Catalyst replacing the hand-wired
node DAG. Flow-control nodes (buffer/rate_limit/delay/latest,
core.py:1484-1572,1995-2041) are execution concerns subsumed by Spark
triggers and backpressure options; they are provided as documented
no-ops so reference pipelines port verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = ["Stream"]


class Stream:
    """Fluent event-stream API over a (batch or streaming) DataFrame."""

    def __init__(self, df: DataFrame, seq_col: str = "seq", node=None,
                 dense_seq: bool = False):
        from streamz_spark.plans.graph import OpNode

        self.df = df
        self.seq_col = seq_col
        # lineage DAG for visualize() (reference graph.py) — one node
        # per fluent call, recorded by _with
        self.node = node or OpNode("source")
        # dense_seq: seq is a known dense 0-based position labeling
        # (from_iterable), preserved by row-preserving ops. Lets zip
        # skip position recovery entirely (SCALE.md) with no user hint.
        self.dense_seq = dense_seq

    # ---------- construction ----------
    @classmethod
    def from_iterable(cls, spark, values, schema: str | None = None) -> "Stream":
        """Lift an iterable into a Stream (reference from_iterable,
        sources.py:766-795). Scalars become a ``value`` column."""
        rows = list(values)
        if rows and not isinstance(rows[0], (tuple, dict)):
            df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(rows)],
                schema or "seq long, value " + _infer(rows[0]),
            )
            return cls(df, dense_seq=True)
        df = spark.createDataFrame(rows, schema=schema)
        w = W.orderBy(F.monotonically_increasing_id())
        return cls(
            df.withColumn("seq", F.row_number().over(w).cast("long") - 1),
            dense_seq=True,
        )

    @classmethod
    def from_dataframe(cls, df: DataFrame, seq_col: str) -> "Stream":
        return cls(df, seq_col)

    # fluent ops that keep exactly one output row per input row with
    # the same seq value — these preserve a dense position labeling
    _ROW_PRESERVING = frozenset(
        {"map", "map_async", "starmap", "pluck", "zip_latest",
         "combine_latest", "accumulate", "scan"}
    )

    def _with(self, df: DataFrame, *parents: "Stream") -> "Stream":
        import sys

        from streamz_spark.plans.graph import OpNode

        name = sys._getframe(1).f_code.co_name
        node = OpNode(name, (self.node, *(p.node for p in parents)))
        dense = self.dense_seq and name in self._ROW_PRESERVING
        return Stream(df, self.seq_col, node, dense_seq=dense)

    # ---------- element-wise (reference core.py:679-925) ----------
    def map(self, fn_or_expr, dtype: str = "double", *cols) -> "Stream":
        """Column expression → pure Catalyst; Python callable → Arrow
        pandas UDF (reference map, core.py:679-719)."""
        if isinstance(fn_or_expr, Column):
            return self._with(self.df.withColumn("value", fn_or_expr))
        udf = F.pandas_udf(dtype)(fn_or_expr)
        target = list(cols) or ["value"]
        return self._with(self.df.withColumn("value", udf(*target)))

    def map_async(self, fn, dtype: str = "double", *cols, max_concurrency: int = 64) -> "Stream":
        """Reference map_async (core.py:722-835): async fn evaluated
        concurrently with ordered output. A coroutine function runs on
        an event loop inside each Arrow batch (operators.udfs.async_map:
        gather-ordered, semaphore-bounded concurrency); a plain callable
        degrades to `map` (Spark already parallelizes batches across
        partitions while preserving intra-partition order)."""
        import asyncio

        if asyncio.iscoroutinefunction(fn):
            from streamz_spark.operators.udfs import async_map

            udf = async_map(fn, dtype, max_concurrency)
            target = list(cols) or ["value"]
            return self._with(self.df.withColumn("value", udf(*target)))
        return self.map(fn, dtype, *cols)

    def starmap(self, expr: Column) -> "Stream":
        """Multi-column expression (reference starmap, core.py:838-881)."""
        return self._with(self.df.withColumn("value", expr))

    def filter(self, predicate) -> "Stream":
        """Column/SQL-string predicate (reference filter, core.py:888-925);
        a plain Python callable becomes an Arrow-batched boolean UDF
        (the reference's arbitrary-predicate form — slow path)."""
        from streamz_spark.frame import StreamingSeries

        pred = predicate.expr if isinstance(predicate, StreamingSeries) else predicate
        if callable(pred) and not isinstance(pred, Column):
            fn = pred
            udf = F.pandas_udf("boolean")(lambda s: s.map(lambda v: bool(fn(v))))
            pred = udf(F.col("value"))
        return self._with(self.df.filter(pred))

    def remove(self, predicate: Column) -> "Stream":
        """Inverse filter (reference core.py:559-561)."""
        return self._with(self.df.filter(~predicate))

    def pluck(self, field) -> "Stream":
        """Extract field(s) (reference pluck, core.py:1862-1898): one
        name → that value; a list of names → a struct (the reference's
        tuple); nested access via dotted paths."""
        if isinstance(field, (list, tuple)):
            value = F.struct(*[F.col(f).alias(f.replace(".", "_")) for f in field])
        else:
            value = F.col(field)
        return self._with(self.df.select(self.seq_col, value.alias("value")))

    def flatten(self, col: str = "value") -> "Stream":
        """Explode iterable elements (reference flatten, core.py:1732-1773)."""
        return self._with(
            self.df.select(self.seq_col, F.explode(F.col(col)).alias("value"))
        )

    def union(self, *others: "Stream") -> "Stream":
        """Merge streams (reference union, core.py:1842-1859)."""
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return self._with(out, *others)

    def unique(
        self, key: str = "value", ts_col: str | None = None,
        watermark: str | None = None,
    ) -> "Stream":
        """Drop previously-seen elements (reference unique,
        core.py:1776-1839): batch = keep first occurrence by seq;
        streaming = dropDuplicates (state-backed).

        The reference's ``maxsize=`` LRU bound (core.py:1776: cap
        memory by evicting old keys) maps to ``ts_col`` + ``watermark``:
        ``dropDuplicatesWithinWatermark`` evicts dedup state once the
        watermark passes — bounded state under unbounded ingest, the
        only deployable form of streaming unique at the 100 TB target
        (an unwatermarked global unique grows state with history and is
        documented as such in SCALE.md)."""
        if (ts_col is None) != (watermark is None):
            # half-specified bounds must not silently fall back to the
            # unbounded-state form the caller was trying to avoid
            raise ValueError(
                "unique: ts_col and watermark must be passed together "
                f"(got ts_col={ts_col!r}, watermark={watermark!r})"
            )
        if self.df.isStreaming:
            if ts_col is not None:
                return self._with(
                    self.df.withWatermark(ts_col, watermark)
                    .dropDuplicatesWithinWatermark([key])
                )
            return self._with(self.df.dropDuplicates([key]))
        w = W.partitionBy(key).orderBy(self.seq_col)
        return self._with(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )

    def frequencies(self, key: str = "value") -> DataFrame:
        """Running occurrence counts (reference frequencies,
        core.py:587-592) — an updating result (update/complete mode)."""
        return self.df.groupBy(key).agg(F.count(F.lit(1)).alias("count"))

    # ---------- windows & batching (reference core.py:1078-1481) ----------
    def sliding_window(self, n: int, return_partial: bool = True) -> "Stream":
        """Overlapping tuples of the last n events (core.py:1269-1316).
        Distributed via explode + window-id groupBy (shuffle ∝ output
        size), not a single-task global window."""
        from streamz_spark.operators.windows import sliding_tuples_global

        out = sliding_tuples_global(
            self.df, self.seq_col, "value", n, "value", return_partial
        )
        return self._with(out)

    def partition(self, n: int, key: str | None = None) -> "Stream":
        """Non-overlapping groups of n, per ``key`` when given
        (reference partition(n, key=), core.py:1078-1165; streaming
        variant with timeout: streaming.stateful.partition_batches).
        Keyed grouping shuffles on the key; keyless recovers global
        positions via operators.order.global_index (range-partition +
        prefix sums — parallel, no single-task window)."""
        keys = [F.col(key)] if key else []
        if key:
            w = W.partitionBy(key).orderBy(self.seq_col)
            src = self.df.withColumn("__g", F.floor((F.row_number().over(w) - 1) / n))
        else:
            from streamz_spark.operators.order import global_index

            src = global_index(self.df, [self.seq_col], "__rn").withColumn(
                "__g", F.floor(F.col("__rn") / n)
            ).drop("__rn")
        grouped = (
            src
            .groupBy("__g", *keys)
            .agg(
                F.sort_array(F.collect_list(F.struct(self.seq_col, "value"))).alias("__s"),
                F.min(self.seq_col).alias("__first_seq"),
            )
            .select(
                # seq = first member's seq: a stable, key-independent order
                F.col("__first_seq").alias("seq"),
                *keys,
                F.transform("__s", lambda s: s.getField("value")).alias("value"),
            )
        )
        from streamz_spark.plans.graph import OpNode

        return Stream(grouped, "seq", OpNode("partition", (self.node,)))

    def timed_window(self, ts_col: str, interval: str) -> DataFrame:
        """Everything per interval (reference timed_window,
        core.py:1326-1362)."""
        return (
            self.df.groupBy(F.window(ts_col, interval).alias("win"))
            .agg(F.collect_list("value").alias("values"))
            .select(F.col("win.start").alias("window_start"), "values")
        )

    # ---------- multi-stream alignment (core.py:1575-1992) ----------
    def zip(self, *others: "Stream", assume_dense: bool = False) -> "Stream":
        """Positional alignment (reference zip, core.py:1575-1649):
        equi-join on per-stream sequence numbers. ``assume_dense=True``
        skips the single-partition position-recovery window when every
        stream's seq is already a dense 0-based position (unfiltered
        sources) — fully parallel equi-join, the scale path."""
        from streamz_spark.operators.joins import zip_positional

        from streamz_spark.plans.graph import OpNode

        dfs = [self.df] + [o.df for o in others]
        orders = [self.seq_col] + [o.seq_col for o in others]
        node = OpNode("zip", (self.node, *(o.node for o in others)))
        # auto fast path: every input tracks a dense 0-based labeling
        dense = assume_dense or (
            self.dense_seq and all(o.dense_seq for o in others)
        )
        return Stream(
            zip_positional(dfs, orders, assume_dense=dense), "seq", node,
            dense_seq=dense,
        )

    def zip_latest(self, other: "Stream", on: str) -> "Stream":
        """Pair each element with the latest of other (core.py:1948-1992)."""
        from streamz_spark.operators.joins import asof_join

        return self._with(asof_join(self.df, other.df, on=on), other)

    def combine_latest(self, *others: "Stream", on: str) -> "Stream":
        """Snapshot of latest values across streams (core.py:1652-1729)."""
        from streamz_spark.operators.joins import combine_latest

        return self._with(combine_latest([self.df] + [o.df for o in others], on=on), *others)

    # ---------- stateful (core.py:928-1026) ----------
    def accumulate(
        self, fn: Callable, start, state_dtype: str = "double",
        returns_state: bool = False,
    ) -> "Stream":
        """Ordered scan (reference accumulate/scan, core.py:928-1026).
        ``returns_state=False`` (the reference's default): ``fn(state,
        value)`` returns the new state, which is also emitted.
        ``returns_state=True``: ``fn`` returns ``(state, out)``.

        Algebraic binops (``operator.add``/``mul``, builtin
        ``min``/``max`` — the reference's own test workloads) compile
        to the distributed two-level cumulative scan
        (operators.order.global_cumulative) seeded with ``start`` —
        fully parallel. Arbitrary Python ``fn`` falls back to a single
        ordered Arrow pass (an opaque recurrence is inherently serial;
        use the keyed streaming variant `streaming.stateful.accumulate`
        at scale); emits one result per event like the reference.
        """
        import operator as _op

        algebraic = None if returns_state else {
            _op.add: "sum", _op.iadd: "sum", _op.mul: "prod", _op.imul: "prod",
            min: "min", max: "max",
        }.get(fn)
        if algebraic:
            from streamz_spark.operators.order import global_cumulative

            cum = global_cumulative(
                self.df.select(self.seq_col, "value"), [self.seq_col],
                "value", algebraic, "__cum",
            )
            seed = {
                "sum": F.lit(start) + F.col("__cum"),
                "prod": F.lit(start) * F.col("__cum"),
                "min": F.least(F.lit(start), F.col("__cum")),
                "max": F.greatest(F.lit(start), F.col("__cum")),
            }[algebraic]
            out = cum.select(
                self.seq_col, seed.cast(state_dtype).alias("value")
            )
            return self._with(out)

        out_schema = f"{self.seq_col} long, value {state_dtype}"
        order = self.seq_col

        def scan(it):
            import pandas as pd

            state = start
            for pdf in it:
                pdf = pdf.sort_values(order)
                outs = []
                for v in pdf["value"]:
                    if returns_state:
                        state, out = fn(state, v)
                    else:
                        state = out = fn(state, v)
                    outs.append(out)
                yield pd.DataFrame({order: pdf[order], "value": outs})

        from streamz_spark.plans.graph import OpNode

        return Stream(
            self.df.select(order, "value").coalesce(1).sortWithinPartitions(order)
            .mapInPandas(scan, schema=out_schema),
            self.seq_col,
            OpNode("accumulate", (self.node,)),
        )

    def scan(self, fn, start, state_dtype: str = "double", returns_state: bool = False) -> "Stream":
        return self.accumulate(fn, start, state_dtype, returns_state)

    def slice(self, start: int = 0, end: int | None = None, step: int = 1) -> "Stream":
        """Positional event selection (reference slice, core.py:1029-1075):
        keep events with ``start <= seq < end`` and ``(seq-start) %
        step == 0``. Pure filter on the sequence column — narrow,
        pushdown-friendly (no global ordering pass needed)."""
        pred = F.col(self.seq_col) >= start
        if end is not None:
            pred = pred & (F.col(self.seq_col) < end)
        if step != 1:
            pred = pred & ((F.col(self.seq_col) - start) % step == 0)
        return self._with(self.df.filter(pred))

    # ---------- flow control: no-ops under Spark's scheduler ----------
    def buffer(self, n: int) -> "Stream":
        """Reference core.py:1545-1572 — backpressure decoupling is
        Spark's trigger/offset management; pass-through."""
        return self

    def rate_limit(self, interval) -> "Stream":
        """Reference core.py:1514-1542 — use maxOffsetsPerTrigger /
        maxFilesPerTrigger on the source; pass-through."""
        return self

    def delay(self, interval) -> "Stream":
        """Reference core.py:1484-1511 — trigger pacing; pass-through."""
        return self

    def latest(self) -> "Stream":
        """Reference core.py:1995-2041 — drop-to-latest under pressure;
        Spark's update mode keeps only the latest per key; pass-through."""
        return self

    # ---------- extension mechanism (reference core.py:120-188) ----------
    @classmethod
    def register_api(cls, name: str | None = None):
        """Attach a custom operator as a chainable Stream method — the
        reference's plugin surface (@Stream.register_api, core.py:120-165;
        entry-point plugins, plugins.py:23-31).

        >>> @Stream.register_api()
        ... def double(stream):
        ...     return stream.map(F.col("value") * 2)
        """

        def deco(fn):
            setattr(cls, name or fn.__name__, fn)
            return fn

        return deco

    @classmethod
    def load_plugins(cls, group: str = "streamz_spark.plugins") -> list[str]:
        """Discover and attach operators published as setuptools entry
        points — the reference's plugin mechanism (plugins.py:23-31,
        groups streamz.sources/nodes/sinks collapse to one group here
        since every operator is a DataFrame->DataFrame function).
        Returns the names registered; a plugin that fails to load is
        skipped with a warning (reference try_register semantics)."""
        import warnings
        from importlib.metadata import entry_points

        registered = []
        for ep in entry_points(group=group):
            try:
                cls.register_api(ep.name)(ep.load())
                registered.append(ep.name)
            except Exception as exc:  # noqa: BLE001 - plugin isolation
                warnings.warn(f"streamz_spark plugin {ep.name!r} failed to load: {exc}")
        return registered

    # ---------- introspection ----------
    def visualize(self, filename: str | None = None) -> str:
        """Render the operator DAG (reference Stream.visualize,
        core.py:532-553 / graph.py:56-252): returns DOT text, writes
        ``filename`` when given (.dot always works; other formats need
        the graphviz package). The physical plan remains available via
        plans.inspect.explain_string(stream.to_frame())."""
        from streamz_spark.plans.graph import render

        return render(self.node, filename)

    def ascii_graph(self) -> str:
        """Terminal rendering of the operator DAG, latest op first."""
        from streamz_spark.plans.graph import ascii_tree

        return ascii_tree(self.node)

    # ---------- egress ----------
    def sink_to_list(self) -> list:
        """Collect values in seq order (reference sink_to_list,
        core.py:571-585). Batch: one collect; streaming: per-batch
        collection via streaming.sinks.sink_to_list."""
        if self.df.isStreaming:
            from streamz_spark.streaming.sinks import sink_to_list as stl

            frames = stl(self.df.select(self.seq_col, "value"))
            import pandas as pd

            allf = pd.concat(frames, ignore_index=True).sort_values(self.seq_col)
            return allf["value"].tolist()
        rows = self.df.select(self.seq_col, "value").orderBy(self.seq_col).collect()
        return [r["value"] for r in rows]

    def to_frame(self) -> "DataFrame":
        return self.df

    def to_dataframe(self):
        """Lift into the collection layer (reference to_dataframe,
        core.py:609-642)."""
        from streamz_spark.frame import StreamingFrame

        return StreamingFrame(self.df, order_col=self.seq_col)


def _infer(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    return "string"
