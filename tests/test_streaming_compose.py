"""Updating-stream composability (SURVEY.md §7 hard item #1).

Replicates the reference's aggregates-feed-further-computation tests:
- ``(sdf.x.sum() + 1)`` stays an updating expression
  (dataframe/tests/test_dataframes.py:664-671)
- ``sdf.groupby('x').y.sum()`` feeding a second aggregation
  (test_dataframes.py:466-476: partitioned json stream, groupby-sum,
  then mean — expected [2, 28/3, 22.0])

Spark forbids stacking streaming aggregations in one plan, so the
frame layer defers everything past the first aggregate into a
foreachBatch closure over the complete-mode output (see
StreamingFrame._defer / sinks.updating_to_list).
"""

from __future__ import annotations

import pandas as pd
import pytest

from streamz_spark.frame import StreamingFrame
from streamz_spark.streaming.sinks import updating_to_list
from streamz_spark.streaming.sources import from_iterable


def test_sum_plus_one_updating(spark):
    # reference: test_dataframes.py:671 — (sdf.x.sum() + 1) emits the
    # running sum + 1 after each chunk: [7, 13, 19]
    chunk = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    stream = from_iterable(spark, [chunk, chunk, chunk], schema="x double")
    sdf = StreamingFrame(stream)

    result = sdf.x.sum() + 1
    # single plan: projection after a streaming aggregate, no deferral
    assert result._base is None and result.df.isStreaming

    batches = updating_to_list(result)
    assert [pdf["x_sum"].iloc[0] for pdf in batches] == [7.0, 13.0, 19.0]


def test_groupby_sum_then_mean_updating(spark):
    # reference: test_dataframes.py:469 — 12 events x=i%3, y=i in 3
    # chunks of 4; mean of per-key running sums after each chunk:
    # [2.0, 28/3, 22.0]
    rows = [(i % 3, float(i)) for i in range(12)]
    chunks = [pd.DataFrame(rows[i:i + 4], columns=["x", "y"]) for i in (0, 4, 8)]
    stream = from_iterable(spark, chunks, schema="x long, y double")
    sdf = StreamingFrame(stream)

    summed = sdf.groupby("x").y.sum()   # first (genuine streaming) agg
    result = summed.y_sum.mean()        # second agg -> deferred closure
    assert result._base is not None and not result.df.isStreaming

    batches = updating_to_list(result)
    vals = [pdf["y_sum_mean"].iloc[0] for pdf in batches]
    assert vals == pytest.approx([2.0, 28 / 3, 22.0])


def test_sum_then_arithmetic_then_agg(spark):
    # deferred chain: agg -> arithmetic -> agg (groupby-sum, double it,
    # re-aggregate max) — exercises _post composition depth > 1
    rows = [(i % 3, float(i)) for i in range(12)]
    chunks = [pd.DataFrame(rows[i:i + 4], columns=["x", "y"]) for i in (0, 4, 8)]
    stream = from_iterable(spark, chunks, schema="x long, y double")
    sdf = StreamingFrame(stream)

    doubled = (sdf.groupby("x").y.sum() * 2)
    result = doubled.y_sum.max()
    batches = updating_to_list(result)
    # per-chunk key sums: {0:3,1:1,2:2} -> {0:9,1:12,2:7} -> {0:18,1:22,2:26}
    assert [pdf["y_sum_max"].iloc[0] for pdf in batches] == [6.0, 24.0, 52.0]


def test_batch_semantics_unchanged(spark):
    # the same expressions in batch mode still collapse to one value
    pdf = pd.DataFrame({"x": [0, 1, 2, 0], "y": [1.0, 2.0, 3.0, 4.0]})
    sdf = StreamingFrame(spark.createDataFrame(pdf))
    out = (sdf.x.sum() + 1).to_pandas()
    assert out["x_sum"].iloc[0] == 4
    out2 = sdf.groupby("x").y.sum().y_sum.mean().to_pandas()
    assert out2["y_sum_mean"].iloc[0] == pytest.approx((5.0 + 2.0 + 3.0) / 3)


def test_custom_aggregation_protocol(spark):
    # reference test_custom_aggregation (test_dataframes.py:961-990):
    # plain aggregate -> [0, 1, 2]; window(5).aggregate -> [1, -198, -397]
    import numpy as np

    from streamz_spark.aggregation import (
        Aggregation,
        aggregate_updating_to_list,
        windowed_aggregate_to_list,
    )

    class Custom(Aggregation):
        def initial(self, new):
            return 0

        def on_new(self, state, new):
            return state + 1, state

        def on_old(self, state, old):
            return state - 100, state

    chunk = pd.DataFrame({"x": np.arange(10, dtype=float), "y": [1.0, 2.0] * 5})
    stream = from_iterable(spark, [chunk] * 3, schema="x double, y double")
    assert aggregate_updating_to_list(stream, Custom()) == [0, 1, 2]

    stream2 = from_iterable(spark, [chunk] * 3, schema="x double, y double")
    assert windowed_aggregate_to_list(stream2, Custom(), n=5) == [1, -198, -397]


def test_updating_harness_max_rows_guard(spark):
    # VERDICT r5 #5: the driver-side harnesses (complete-mode toPandas
    # per batch) must refuse unbounded key spaces actionably instead
    # of silently OOMing the driver — and only ever fetch max_rows+1
    import pandas as pd
    import pytest

    from streamz_spark.frame import StreamingFrame
    from streamz_spark.streaming.sinks import updating_to_list
    from streamz_spark.streaming.sources import from_iterable

    chunk = pd.DataFrame({"k": range(50), "v": [1.0] * 50})
    sdf = StreamingFrame(from_iterable(spark, [chunk], "k long, v double"))
    agg = sdf.groupby("k").sum()
    with pytest.raises(Exception, match="max_rows"):
        # surfaces wrapped as StreamingQueryException from foreachBatch
        updating_to_list(agg, max_rows=10)
    # generous bound: same pipeline completes
    sdf2 = StreamingFrame(from_iterable(spark, [chunk], "k long, v double"))
    out = updating_to_list(sdf2.groupby("k").sum(), max_rows=1000)
    assert len(out[-1]) == 50


def test_aggregation_harness_max_rows_guard(spark):
    import pandas as pd
    import pytest

    from streamz_spark.aggregation import Aggregation, aggregate_updating_to_list
    from streamz_spark.streaming.sources import from_iterable

    class Count(Aggregation):
        def initial(self, new):
            return 0

        def on_new(self, state, new):
            state += len(new)
            return state, state

    chunk = pd.DataFrame({"x": range(100)})
    src = from_iterable(spark, [chunk], "x long")
    with pytest.raises(Exception, match="max_rows"):
        aggregate_updating_to_list(src, Count(), max_rows=10)
    src2 = from_iterable(spark, [chunk], "x long")
    assert aggregate_updating_to_list(src2, Count(), max_rows=1000) == [100]


# -- property: arbitrary-depth updating chains == pandas replication --
#
# The reference's dominant differential pattern (stream the chunks,
# replicate on the whole frame with plain pandas, compare after every
# chunk — dataframe/tests/test_dataframes.py passim) applied to its
# hardest semantic: updating aggregates feeding further arithmetic and
# re-aggregation at arbitrary depth (SURVEY.md §7 hard item #1). Chains
# are random trees of (first streaming groupby-sum) -> arithmetic ->
# aggregate -> arithmetic ... ; Spark executes everything past the
# first aggregate via the deferred _post closure, pandas replays the
# same chain on each cumulative prefix.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ARITH = {
    "add": (lambda f, c: f + c, lambda s, c: s + c),
    "sub": (lambda f, c: f - c, lambda s, c: s - c),
    "rsub": (lambda f, c: c - f, lambda s, c: c - s),
    "mul": (lambda f, c: f * c, lambda s, c: s * c),
}
_AGGS = ("sum", "mean", "max", "min", "count")

_chunks_st = st.lists(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)),
        min_size=1, max_size=5,
    ),
    min_size=1, max_size=3,
)
_chain_st = st.lists(
    st.one_of(
        st.tuples(
            st.just("arith"),
            st.tuples(st.sampled_from(sorted(_ARITH)), st.integers(-5, 5)),
        ),
        st.tuples(st.just("agg"), st.sampled_from(_AGGS)),
    ),
    min_size=1, max_size=4,
).filter(lambda c: any(k == "agg" for k, _ in c))


def _replicate_pandas(chunks, chain, upto):
    # whole-frame pandas replay of the chain on chunks[: upto + 1]
    pdf = pd.concat(chunks[: upto + 1], ignore_index=True)
    vals = pdf.groupby("x")["y"].sum()
    for kind, arg in chain:
        if kind == "arith":
            op, c = arg
            vals = _ARITH[op][1](vals, c)
        else:
            v = getattr(vals, arg)()
            vals = pd.Series([float(v)])
    assert len(vals) == 1
    return float(vals.iloc[0])


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(rows=_chunks_st, chain=_chain_st)
def test_updating_chain_matches_pandas_replication(spark, rows, chain):
    chunks = [
        pd.DataFrame(
            {"x": [r[0] for r in ch], "y": [float(r[1]) for r in ch]}
        )
        for ch in rows
    ]
    stream = from_iterable(spark, chunks, schema="x long, y double")
    cur = StreamingFrame(stream).groupby("x").y.sum()
    name = "y_sum"
    for kind, arg in chain:
        if kind == "arith":
            op, c = arg
            cur = _ARITH[op][0](cur, c)
        else:
            cur = getattr(cur[name], arg)()
            name = f"{name}_{arg}"
    batches = updating_to_list(cur)
    assert len(batches) == len(chunks)
    got = [float(b[name].iloc[0]) for b in batches]
    want = [_replicate_pandas(chunks, chain, i) for i in range(len(chunks))]
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9)
