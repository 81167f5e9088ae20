"""Link-graph centrality (operators.graph.pagerank).

Differential strategy mirrors the repo standard: the distributed
operator vs an independent single-process reference implementing the
identical integer fixed-point recurrence, plus structural properties
(mass conservation, hub dominance) and a physical-plan contract.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from streamz_spark.operators.graph import pagerank
from streamz_spark.plans import (
    explain_string,
    exchange_count,
    sort_merge_join_count,
)
from streamz_spark.queries.extra import _PR_SCALE, _build_pagerank

from .conftest import SF_DIR


def _reference_pagerank(node_ids, edges, iterations, scale=_PR_SCALE, num=17, den=20):
    """Pure-Python fixed-point PageRank — the same integer recurrence,
    no Spark, no floats."""
    n = len(node_ids)
    teleport = ((den - num) * scale) // (den * n)
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    ranks = {i: scale // n for i in node_ids}
    for _ in range(iterations):
        incoming = defaultdict(int)
        for s, d in edges:
            incoming[d] += (num * ranks[s]) // (den * outdeg[s])
        ranks = {i: teleport + incoming.get(i, 0) for i in node_ids}
    return ranks


def test_pagerank_matches_python_reference(spark):
    # ring + chords + a dangling-free hub, small enough to hand-check
    nodes = list(range(24))
    edges = [(i, (i + 1) % 24) for i in nodes]
    edges += [(i, (i * 5 + 3) % 24) for i in nodes]
    edges += [(i, 0) for i in nodes if i != 0]
    edges = sorted(set(e for e in edges if e[0] != e[1]))

    ndf = spark.createDataFrame([(i,) for i in nodes], "id bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["id"]: r["rank_scaled"]
        for r in pagerank(ndf, edf, iterations=4).collect()
    }
    want = _reference_pagerank(nodes, edges, iterations=4)
    assert got == want


def test_pagerank_mass_and_hub_skew(spark):
    out = _build_pagerank(spark, SF_DIR).toPandas()
    n = len(out)
    assert n > 0
    # floors only ever lose mass; loss bounded by ~1 unit per edge per
    # iteration plus the teleport floor per node per iteration
    total = int(out["rank_scaled"].sum())
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - 10 * 4 * n  # 3n edges + n teleports, 3 iters
    hubs = out[out.doc_id % 100 == 0]["rank_scaled"].mean()
    rest = out[out.doc_id % 100 != 0]["rank_scaled"].mean()
    assert hubs > 5 * rest, (hubs, rest)


def test_pagerank_iteration_validation(spark):
    ndf = spark.createDataFrame([(1,)], "id bigint")
    edf = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    import pytest

    with pytest.raises(ValueError):
        pagerank(ndf, edf, iterations=0)
    with pytest.raises(ValueError):
        pagerank(ndf, edf, damping=(20, 17))


def test_pagerank_plan_contract(spark):
    """The unrolled (checkpoint=False) 3-iteration plan: hash joins
    only (no sort-merge on the rank vector path, no cartesian), and a
    bounded exchange budget — 2 corpus-key exchanges per iteration
    (rank→src join, dst aggregation) plus the one-time edge layout.
    """
    df = _build_pagerank(spark, SF_DIR, checkpoint=False)
    plan = explain_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert sort_merge_join_count(df) == 0, plan
    # the per-iteration exchange budget must be CONSTANT: pin the
    # marginal cost of one more unrolled iteration (measured 5: rank
    # re-key, contribution partial agg, and the re-evaluated edge/id
    # subtrees that the production checkpoint=True shape materializes
    # once) so a regression to super-linear plan growth fails loudly
    import streamz_spark.queries.extra as xq

    orig = xq._PR_ITERS
    try:
        xq._PR_ITERS = 1
        one = exchange_count(_build_pagerank(spark, SF_DIR, checkpoint=False))
    finally:
        xq._PR_ITERS = orig
    three = exchange_count(df)
    per_iter = (three - one) / (orig - 1)
    assert per_iter <= 6, (one, three, per_iter)
    assert three <= one + 6 * (orig - 1), (one, three)


def test_pagerank_convergence_mode(spark):
    """Production tol mode: stops early once the integer L1 delta is
    within tolerance, and the converged ranks match a long fixed run
    to within the tolerance (power iteration contracts ~0.85x/round,
    so a tight tol forces near-fixpoint)."""
    nodes = list(range(40))
    edges = sorted(
        {(i, (i * 7 + 3) % 40) for i in nodes}
        | {(i, (i * 11 + 5) % 40) for i in nodes}
        | {(i, 0) for i in nodes if i != 0}
    )
    ndf = spark.createDataFrame([(i,) for i in nodes], "id bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")

    tol = 1000  # 1e-9 of total mass at scale=1e12
    converged = {
        r["id"]: r["rank_scaled"]
        for r in pagerank(ndf, edf, iterations=200, tol_scaled=tol).collect()
    }
    long_run = {
        r["id"]: r["rank_scaled"]
        for r in pagerank(ndf, edf, iterations=60).collect()
    }
    l1 = sum(abs(converged[i] - long_run[i]) for i in nodes)
    # the early stop fired at delta<=tol; residual distance to the
    # true fixpoint is bounded by tol/(1-d) = ~6.7*tol
    assert l1 <= 10 * tol, l1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(ndf, edf, iterations=5, tol_scaled=10, checkpoint=False)
