"""Misra-Gries heavy hitters (operators.sketches).

The operator's claim is strong — EXACT results from an approximate
candidate pass — so the tests attack the guarantee: adversarial skew,
hostile partition layouts (all copies of the hot key in one
partition), boundary thresholds, and the candidate-volume bound that
is the whole point of the sketch.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from streamz_spark.operators.sketches import _mg_trim, heavy_hitters, mg_candidates
from streamz_spark.plans import broadcast_join_count, sort_merge_join_count
from streamz_spark.queries.extra import EXTRA_REGISTRY

from .conftest import SF_DIR


def _brute(values, k):
    c = Counter(v for v in values if v is not None)
    n = sum(c.values())
    return {key: cnt for key, cnt in c.items() if cnt * k > n}


def _check(spark, values, k, partitions):
    df = spark.createDataFrame(
        [(v,) for v in values], "key string"
    ).repartition(partitions)
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", k).collect()}
    assert got == _brute(values, k), (k, partitions)


def test_exact_on_planted_skew(spark):
    # 40% hot key, 10% warm key, long uniform tail
    values = ["hot"] * 400 + ["warm"] * 100 + [f"t{i}" for i in range(500)]
    for k in (2, 5, 10, 50):
        _check(spark, values, k, partitions=7)


def test_exact_when_hot_key_is_partition_local(spark):
    # adversarial layout: every copy of the hot key lands in ONE
    # partition (repartitionByRange on a sorted id) — the pigeonhole
    # step of the guarantee must still hold
    rows = [(i, "hot" if i < 300 else f"t{i}") for i in range(1000)]
    df = (
        spark.createDataFrame(rows, "i long, key string")
        .repartitionByRange(8, "i")
        .select("key")
    )
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", 5).collect()}
    assert got == _brute([k for _, k in rows], 5)


def test_exact_at_threshold_boundary(spark):
    # cnt * k == n exactly must NOT pass (strict inequality)
    values = ["a"] * 25 + ["b"] * 75  # a: 25*4 == 100 → excluded at k=4
    _check(spark, values, 4, partitions=3)
    got = _brute(values, 4)
    assert "a" not in got and "b" in got  # sanity on the oracle itself


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("x",)] * 10 + [(None,)] * 90, "key string"
    ).repartition(4)
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", 3).collect()}
    assert got == {"x": 10}


def test_candidate_volume_bounded(spark):
    # high-cardinality near-uniform input: the sketch pass must emit
    # ≤ (k+1) rows per partition, NOT the full key space
    parts = 6
    df = spark.createDataFrame(
        [(f"k{i % 5000}",) for i in range(20000)], "key string"
    ).repartition(parts)
    k = 20
    cand = mg_candidates(df, "key", k).collect()
    assert len(cand) <= (k + 1) * parts, len(cand)
    # exactly one sentinel per non-empty partition, totals sum to n
    sentinels = [r for r in cand if r["key"] is None]
    assert sum(r["cnt"] for r in sentinels) == 20000


def test_mg_trim_invariant():
    counters = {f"k{i}": i + 1 for i in range(10)}
    _mg_trim(counters, 4)
    assert len(counters) <= 4
    # survivors are the largest originals, undercounted by the same m
    assert counters == {"k9": 4, "k8": 3, "k7": 2, "k6": 1}


def test_k_validation(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", 0)


def test_entry_plan_contract(spark):
    """Verify pass: candidates broadcast (never shuffle the corpus on
    a join), no sort-merge anywhere."""
    df = EXTRA_REGISTRY["heavy_hitter_keys"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_entry_nontrivial_subset(spark):
    """The sqrt-law key must yield a PROPER nontrivial subset at the
    bench SFs ≥ 0.01 (guards against the entry degenerating into
    'all keys pass' / 'none pass', which would stop exercising the
    threshold)."""
    out = EXTRA_REGISTRY["heavy_hitter_keys"].fn(spark, SF_DIR).toPandas()
    import duckdb

    total_keys = duckdb.sql(
        f"SELECT COUNT(DISTINCT CAST(FLOOR(SQRT(CAST(user_id AS DOUBLE))) AS BIGINT)) "
        f"FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert 0 < len(out) <= total_keys
