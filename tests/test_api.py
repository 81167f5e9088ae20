"""API-parity tests: the reference's canonical examples re-run on the
Spark-native Stream / StreamingFrame APIs (oracle = pandas, the
reference's own differential strategy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from streamz_spark.core import Stream
from streamz_spark.frame import StreamingFrame

from .conftest import SF_DIR


def test_stream_map_filter_sink(spark):
    """source.map(inc).filter(even).sink_to_list() — the reference's
    headline example (streamz core.py docstring)."""
    s = Stream.from_iterable(spark, range(10))
    out = (
        s.map(F.col("value") + 1)
        .filter(F.col("value") % 2 == 0)
        .sink_to_list()
    )
    assert out == [x + 1 for x in range(10) if (x + 1) % 2 == 0]


def test_stream_scan(spark):
    """accumulate/scan running total (reference test_scan, tests/test_core.py:49)."""
    s = Stream.from_iterable(spark, [1.0, 2.0, 3.0, 4.0])
    # reference default: fn returns the new state, which is emitted
    out = s.accumulate(lambda acc, x: acc + x, start=0.0).sink_to_list()
    assert out == [1.0, 3.0, 6.0, 10.0]
    # returns_state form: fn returns (state, out)
    out2 = s.accumulate(
        lambda acc, x: (acc + x, acc + x), start=0.0, returns_state=True
    ).sink_to_list()
    assert out2 == [1.0, 3.0, 6.0, 10.0]


def test_stream_unique_frequencies(spark):
    """(reference test_unique tests/test_core.py:900, frequencies core.py:587)."""
    s = Stream.from_iterable(spark, [1, 1, 2, 2, 2, 1, 3])
    assert sorted(s.unique().sink_to_list()) == [1, 2, 3]
    freqs = {r["value"]: r["count"] for r in s.frequencies().collect()}
    assert freqs == {1: 3, 2: 3, 3: 1}


def test_stream_partition_sliding(spark):
    """(reference test_partition / test_sliding_window, tests/test_core.py)."""
    s = Stream.from_iterable(spark, [float(i) for i in range(7)])
    parts = s.partition(3).sink_to_list()
    assert parts == [[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0]]
    slid = s.sliding_window(3).sink_to_list()
    assert slid[:3] == [[0.0], [0.0, 1.0], [0.0, 1.0, 2.0]]
    assert slid[-1] == [4.0, 5.0, 6.0]


def test_stream_zip(spark):
    """(reference test_zip, tests/test_core.py:661)."""
    a = Stream.from_iterable(spark, [1, 2, 3])
    b = Stream.from_iterable(spark, [10, 20, 30, 40])
    z = a.zip(b)
    rows = sorted((r.seq, r.s0_value, r.s1_value) for r in z.df.collect())
    # from_iterable seqs are dense → auto fast path joins directly on the
    # 0-based labels (no position-recovery shuffle)
    assert rows == [(0, 1, 10), (1, 2, 20), (2, 3, 30)]


def test_stream_flatten(spark):
    s = Stream.from_iterable(spark, [([1, 2],), ([3],)], schema="value array<long>")
    # schema path: rows are tuples; seq assigned automatically
    out = sorted(s.flatten().df.select("value").toPandas()["value"].tolist())
    assert out == [1, 2, 3]


def test_frame_arithmetic_parity(spark):
    """sdf.x + sdf.y parity (reference test_pair_arithmetic,
    test_dataframes.py:241-251)."""
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    expr = (sf["value"] * 2 + 1).to_frame()
    got = expr.to_pandas()["value"].sort_values(ignore_index=True)
    pdf = sf.to_pandas()
    want = (pdf["value"] * 2 + 1).sort_values(ignore_index=True)
    np.testing.assert_allclose(got, want)


def test_frame_mask_and_query(spark):
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    got = sf[sf["value"] > 100].to_pandas()
    want = sf.to_pandas().query("value > 100")
    assert len(got) == len(want)
    got2 = sf.query("value > 100 and user_id % 2 = 0").to_pandas()
    want2 = sf.to_pandas().query("value > 100 and user_id % 2 == 0")
    assert len(got2) == len(want2)


def test_frame_groupby_computed_grouper(spark):
    """sdf.groupby(sdf.x % 3).y.mean() (reference test_groupby_aggregate,
    test_dataframes.py:267-304)."""
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    got = (
        sf.groupby(sf["user_id"] % 3)["value"].mean().to_pandas()
        .set_index("key_user_id")["value_mean"].sort_index()
    )
    pdf = sf.to_pandas()
    want = pdf.groupby(pdf.user_id % 3)["value"].mean().sort_index()
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy())


def test_frame_reductions(spark):
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    got = sf["value"].sum().to_pandas().iloc[0, 0]
    want = sf.to_pandas()["value"].sum()
    np.testing.assert_allclose(got, want)
    got_std = sf["value"].std().to_pandas().iloc[0, 0]
    np.testing.assert_allclose(got_std, sf.to_pandas()["value"].std(), rtol=1e-9)


def test_frame_rolling_and_ewm(spark):
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    # pandas-parity default: rolling(5) inherits min_periods=5, so the
    # first 4 rows per key are NaN — exactly like pandas/the reference
    roll = sf.rolling(5, partition_by=["user_id"]).mean("value").to_pandas()
    pdf = sf.to_pandas().sort_values(["user_id", "event_id"])
    want = pdf.groupby("user_id")["value"].transform(lambda s: s.rolling(5).mean())
    got = roll.sort_values(["user_id", "event_id"])["value_roll_mean"]
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)

    # explicit override keeps the old behavior
    roll1 = sf.rolling(5, min_periods=1, partition_by=["user_id"]).mean("value").to_pandas()
    want1 = pdf.groupby("user_id")["value"].transform(lambda s: s.rolling(5, min_periods=1).mean())
    got1 = roll1.sort_values(["user_id", "event_id"])["value_roll_mean"]
    np.testing.assert_allclose(got1.to_numpy(), want1.to_numpy(), rtol=1e-12)

    ewm = sf.ewm(alpha=0.5, partition_by=["user_id"]).mean("value").to_pandas()
    want_e = pdf.groupby("user_id")["value"].transform(lambda s: s.ewm(alpha=0.5).mean())
    got_e = ewm.sort_values(["user_id", "event_id"])["value_ewm"]
    np.testing.assert_allclose(got_e.to_numpy(), want_e.to_numpy(), rtol=1e-12)


def test_frame_value_counts_assign(spark):
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    vc = sf["event_type"].value_counts().to_pandas().set_index("event_type")["count"]
    want = sf.to_pandas()["event_type"].value_counts()
    assert vc.sort_index().tolist() == want.sort_index().tolist()

    sf2 = sf.assign(double_value=sf["value"] * 2)
    assert "double_value" in sf2.columns


def test_frame_cumsum_nlargest(spark):
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")
    cs = sf.cumsum("value", partition_by=["user_id"]).to_pandas()
    pdf = sf.to_pandas().sort_values(["user_id", "event_id"])
    want = pdf.groupby("user_id")["value"].cumsum()
    got = cs.sort_values(["user_id", "event_id"])["value_cumsum"]
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)

    top = sf.nlargest(5, "value").to_pandas()["value"].tolist()
    want_top = sorted(pdf["value"], reverse=True)[:5]
    assert top == want_top


def test_frame_map_partitions(spark):
    sf = StreamingFrame.from_table(spark, SF_DIR, "events", order_col="event_id")

    def add_rank(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.assign(vrank=pdf["value"].rank())

    out = sf[["event_id", "value"]].map_partitions(
        add_rank, "event_id long, value double, vrank double"
    )
    assert out.to_pandas().shape[1] == 3


def test_stream_register_api(spark):
    """Extension mechanism (reference @Stream.register_api, core.py:120-165)."""
    from pyspark.sql import functions as F
    from streamz_spark.core import Stream

    @Stream.register_api()
    def double(stream):
        return stream.map(F.col("value") * 2)

    s = Stream.from_iterable(spark, [1, 2, 3])
    assert s.double().sink_to_list() == [2, 4, 6]


def test_frame_rolling_time_window(spark):
    """rolling('1h') over the ts_col — pandas time-rolling oracle."""
    sf = StreamingFrame.from_table(
        spark, SF_DIR, "events", order_col="event_id", ts_col="ts"
    )
    got = (
        sf.rolling("1h", partition_by=["user_id"]).sum("value")
        .to_pandas().sort_values(["user_id", "event_id"], ignore_index=True)
    )
    pdf = sf.to_pandas().sort_values(["user_id", "ts"], ignore_index=True)
    want = (
        pdf.set_index("ts").groupby("user_id")["value"]
        .transform(lambda s: s.rolling("1h").sum())
    )
    np.testing.assert_allclose(
        got.sort_values(["user_id", "event_id"])["value_roll_sum"].to_numpy(),
        want.to_numpy(),
        rtol=1e-9,
    )


def test_map_async_concurrent_and_ordered(spark, tmp_path):
    """Reference map_async semantics (streamz core.py:722-835): parallel
    evaluation, ordered output. Concurrency is asserted structurally —
    each coroutine logs its (start, end) interval to a per-process file
    and the test computes peak overlap — rather than via a wall-clock
    speedup threshold, which is flaky under machine load."""
    import os
    import time

    from streamz_spark.core import Stream

    logdir = str(tmp_path / "intervals")
    os.makedirs(logdir, exist_ok=True)

    async def slow_double(x):
        import asyncio
        import os
        import time

        t0 = time.time()
        await asyncio.sleep(0.05)
        t1 = time.time()
        # local[*] workers share the filesystem; one log per worker pid
        with open(f"{logdir}/{os.getpid()}.log", "a") as f:
            f.write(f"{t0} {t1}\n")
        return float(x) * 2.0

    n = 400
    s = Stream.from_iterable(spark, [float(i) for i in range(n)])
    out = (
        s.map_async(slow_double)
        .df.toPandas()
        .sort_values("seq", ignore_index=True)
    )
    # ordered output despite parallel evaluation
    assert out["value"].tolist() == [float(i) * 2.0 for i in range(n)]

    # structural concurrency: sweep the recorded intervals for peak
    # in-flight count. Serial evaluation would peak at 1; the async
    # executor overlaps sleeps within each Arrow batch regardless of
    # CPU contention.
    intervals = []
    for fname in os.listdir(logdir):
        with open(os.path.join(logdir, fname)) as f:
            for line in f:
                a, b = line.split()
                intervals.append((float(a), float(b)))
    assert len(intervals) == n
    events = sorted(
        [(a, 1) for a, _ in intervals] + [(b, -1) for _, b in intervals]
    )
    peak = cur = 0
    for _, delta in events:
        cur += delta
        peak = max(peak, cur)
    assert peak >= 8, f"map_async not concurrent: peak in-flight {peak}"


def test_visualize_dag(spark, tmp_path):
    # reference Stream.visualize (graph.py:56-252): the operator DAG,
    # including multi-parent ops, renders to DOT
    from pyspark.sql import functions as F

    from streamz_spark.core import Stream

    a = Stream.from_iterable(spark, [1, 2, 3, 4])
    b = Stream.from_iterable(spark, [10, 20, 30, 40])
    s = a.map(F.col("value") * 2).filter(F.col("value") > 2).union(b)
    dot = s.visualize()
    assert dot.startswith("digraph")
    for op in ("map", "filter", "union", "source"):
        assert op in dot
    # union has two parents -> two incoming edges
    assert dot.count("-> n") >= 4
    out = str(tmp_path / "g.dot")
    s.visualize(out)
    assert open(out).read() == dot
    tree = s.ascii_graph()
    assert tree.splitlines()[0] == "union"
    # the DAG is cosmetic lineage; the plan itself still runs
    assert sorted(s.sink_to_list()) == [4, 6, 8, 10, 20, 30, 40]


def test_load_plugins_entry_points(spark, monkeypatch):
    # reference plugins.py:23-31 — entry points become Stream methods;
    # a broken plugin is skipped with a warning
    import warnings

    from streamz_spark import core as c

    class FakeEP:
        def __init__(self, name, fn_or_exc):
            self.name = name
            self._x = fn_or_exc

        def load(self):
            if isinstance(self._x, Exception):
                raise self._x
            return self._x

    def fake_entry_points(group=None):
        assert group == "streamz_spark.plugins"
        from pyspark.sql import functions as F

        return [
            FakeEP("tripled", lambda s: s.map(F.col("value") * 3)),
            FakeEP("broken", RuntimeError("boom")),
        ]

    import importlib.metadata

    monkeypatch.setattr(importlib.metadata, "entry_points", fake_entry_points)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        names = c.Stream.load_plugins()
    assert names == ["tripled"]
    assert any("broken" in str(x.message) for x in w)
    s = c.Stream.from_iterable(spark, [1, 2]).tripled()
    assert sorted(s.sink_to_list()) == [3, 6]


def test_trailing_window_extra_aggs(spark):
    import pandas as pd

    from streamz_spark.frame import StreamingFrame

    pdf = pd.DataFrame({"seq": range(6), "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    sdf = StreamingFrame(spark.createDataFrame(pdf), order_col="seq")
    w = sdf.window(n=4)
    assert w.size.to_pandas()["size"].iloc[0] == 4
    # last 4 values: 3,4,5,6
    assert w.var().to_pandas()["x_var"].iloc[0] == pd.Series([3.0, 4, 5, 6]).var()
    assert w.std().to_pandas()["x_std"].iloc[0] == pd.Series([3.0, 4, 5, 6]).std()
    vc = w.value_counts("x").to_pandas()
    assert sorted(vc["x"]) == [3.0, 4.0, 5.0, 6.0]
    out = sdf.window(n=3).apply(
        lambda p: pd.DataFrame({"rng": [p["x"].max() - p["x"].min()]}), "rng double"
    )
    assert out.to_pandas()["rng"].iloc[0] == 2.0


def test_stream_slice_pluck_filter_parity(spark):
    # reference test_slice (tests/test_core.py), pluck list form
    # (core.py:1886-1890), callable filter (core.py:888)
    s = Stream.from_iterable(spark, list(range(10)))
    assert s.slice(2, 8, 2).sink_to_list() == [2, 4, 6]
    assert s.slice(start=5).sink_to_list() == [5, 6, 7, 8, 9]
    assert s.filter(lambda x: x % 3 == 0).sink_to_list() == [0, 3, 6, 9]

    t = Stream.from_iterable(
        spark, [(1, "a", 10.0), (2, "b", 20.0)], schema="x long, y string, z double"
    )
    plucked = t.pluck(["x", "z"]).sink_to_list()
    assert [(p["x"], p["z"]) for p in plucked] == [(1, 10.0), (2, 20.0)]


def test_stream_partition_keyed(spark):
    # reference partition(n, key=) (core.py:1078-1165): per-key batches
    s = Stream.from_iterable(
        spark,
        [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(10)],
        schema="seq long, key string, value double",
    )
    parts = s.partition(2, key="key")
    rows = sorted(
        (r["key"], tuple(r["value"])) for r in parts.df.collect()
    )
    assert rows == [
        ("even", (0.0, 2.0)), ("even", (4.0, 6.0)), ("even", (8.0,)),
        ("odd", (1.0, 3.0)), ("odd", (5.0, 7.0)), ("odd", (9.0,)),
    ]


def test_stream_zip_dense_fast_path(spark):
    # assume_dense: join directly on the dense seq — no global window;
    # results identical up to the seq base (0-based vs row_number's 1)
    from streamz_spark.plans.inspect import explain_string

    a = Stream.from_iterable(spark, [1, 2, 3])
    b = Stream.from_iterable(spark, [10, 20, 30, 40])
    z = a.zip(b, assume_dense=True)
    rows = sorted((r.s0_value, r.s1_value) for r in z.df.collect())
    assert rows == [(1, 10), (2, 20), (3, 30)]
    assert "row_number" not in explain_string(z.df).lower()


def test_unique_half_specified_watermark_raises(spark):
    import pytest

    from streamz_spark.core import Stream

    s = Stream.from_iterable(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="ts_col and watermark"):
        s.unique("value", ts_col="ts")
    with pytest.raises(ValueError, match="ts_col and watermark"):
        s.unique("value", watermark="10 minutes")


def test_configure_builder_io_codec_default_and_override(monkeypatch):
    """The shuffle/spill/checkpoint block codec defaults to zstd
    (measured ~2x shuffle-byte cut at equal-or-lower CPU on the 100x
    replicas — see session.py note) with SPARK_GRAFT_IO_CODEC as the
    escape hatch back to Spark's lz4 default."""
    from pyspark.sql import SparkSession

    from streamz_spark.session import configure_builder

    monkeypatch.delenv("SPARK_GRAFT_IO_CODEC", raising=False)
    b = configure_builder(SparkSession.builder, cpus=4)
    assert b._options["spark.io.compression.codec"] == "zstd"
    monkeypatch.setenv("SPARK_GRAFT_IO_CODEC", "lz4")
    b = configure_builder(SparkSession.builder, cpus=4)
    assert b._options["spark.io.compression.codec"] == "lz4"
