"""Custom user-defined aggregations — the reference's Aggregation
protocol (streamz/dataframe/aggregations.py:7-12, used via
``sdf.aggregate(Custom())``, dataframe/core.py:53-57).

``initial(chunk) -> state``; ``on_new(state, chunk) -> (state,
result)`` per arriving chunk; ``on_old(state, chunk) -> (state,
result)`` when a window expires rows. Results form an *updating*
stream (one emission per input chunk), exactly the reference's
cadence (tests/test_dataframes.py:961-990).

Execution model: the fold is inherently sequential over chunks, so it
runs driver-side in foreachBatch — same single-threaded semantics as
the reference's in-loop accumulation. For keyed, distributed custom
state use streaming.stateful.accumulate (applyInPandasWithState),
which shards by key; this API is the single-stream fidelity path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Aggregation:
    """Subclass with initial/on_new/on_old (reference
    aggregations.py:7-12)."""

    def initial(self, new):  # pragma: no cover - interface
        raise NotImplementedError

    def on_new(self, state, new):  # pragma: no cover - interface
        raise NotImplementedError

    def on_old(self, state, old):  # pragma: no cover - interface
        raise NotImplementedError


def _bounded_to_pandas(batch_df, batch_id, max_rows: int, harness: str):
    """Driver-size guard for the foreachBatch harnesses: fetch at most
    ``max_rows + 1`` rows and raise actionably when the micro-batch no
    longer fits the driver-side fold — the sequential Aggregation
    protocol is single-stream fidelity plumbing, not the scale path
    (that is streaming.stateful.accumulate, keyed + distributed)."""
    pdf = batch_df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise RuntimeError(
            f"{harness}: micro-batch {batch_id} exceeds max_rows="
            f"{max_rows}; the driver-side Aggregation harness cannot "
            "hold it — use streamz_spark.streaming.stateful.accumulate "
            "(keyed, distributed) or raise max_rows explicitly"
        )
    return pdf


def aggregate_updating_to_list(
    df: DataFrame, agg: Aggregation, timeout: int = 300, max_rows: int = 1_000_000
) -> list:
    """Run a streaming DataFrame through a custom Aggregation, one
    on_new per micro-batch; returns the per-chunk results (reference
    sdf.aggregate(Custom()), test_dataframes.py:974-981).

    DRIVER-SIZE BOUND: the fold is sequential and driver-side by
    design (see module docstring); ``max_rows`` caps each micro-batch
    materialization and raises actionably beyond it."""
    from streamz_spark.streaming.sinks import run_available_now

    box = {"state": None, "started": False}
    out: list = []

    def step(batch_df, batch_id):
        pdf = _bounded_to_pandas(batch_df, batch_id, max_rows, "aggregate_updating_to_list")
        if not box["started"]:
            box["state"] = agg.initial(pdf)
            box["started"] = True
        box["state"], res = agg.on_new(box["state"], pdf)
        out.append((batch_id, res))

    run_available_now(df.writeStream.outputMode("append").foreachBatch(step), timeout)
    out.sort(key=lambda t: t[0])
    return [r for _, r in out]


def windowed_aggregate_to_list(
    df: DataFrame, agg: Aggregation, n: int, timeout: int = 300,
    max_rows: int = 1_000_000,
) -> list:
    """window(n=).aggregate(Custom()) — keep the last ``n`` rows; each
    chunk triggers on_new with the arrivals, then one on_old PER
    expired chunk piece, emitting the final result — the reference's
    backlog-deque + diff_iloc split exactly (window_accumulator,
    aggregations.py:280-320; diff_iloc, aggregations.py:173-207).
    ``max_rows`` bounds the per-batch driver materialization (see
    :func:`aggregate_updating_to_list`)."""
    from collections import deque

    from streamz_spark.streaming.sinks import run_available_now

    box = {"state": None, "started": False, "dfs": deque()}
    out: list = []

    def step(batch_df, batch_id):
        pdf = _bounded_to_pandas(batch_df, batch_id, max_rows, "windowed_aggregate_to_list")
        if not box["started"]:
            box["state"] = agg.initial(pdf)
            box["started"] = True
        dfs = box["dfs"]
        if len(pdf):
            dfs.append(pdf)
        # diff_iloc: expire whole leading chunks, then a partial slice
        old = []
        excess = sum(map(len, dfs)) - n
        while excess > 0:
            if len(dfs[0]) <= excess:
                piece = dfs.popleft()
                old.append(piece)
                excess -= len(piece)
            else:
                old.append(dfs[0].iloc[:excess])
                dfs[0] = dfs[0].iloc[excess:]
                excess = 0
        box["state"], res = agg.on_new(box["state"], pdf)
        for o in old:
            if len(o):
                box["state"], res = agg.on_old(box["state"], o)
        out.append((batch_id, res))

    run_available_now(df.writeStream.outputMode("append").foreachBatch(step), timeout)
    out.sort(key=lambda t: t[0])
    return [r for _, r in out]
