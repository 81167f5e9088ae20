"""Connected components (operators/components.py).

The reference never needed transitive closure (single-process dedup
can chain pairs in memory); at corpus scale it's the step that turns
near-dup *pairs* into dedup *decisions*. Differential-tested against
a pure-Python union-find.
"""

import random

import pytest
from pyspark.sql import functions as F

from streamz_spark.operators.components import connected_components, dedup_clusters


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }


class TestConnectedComponents:
    def test_chain_clique_singleton_edge(self, spark):
        edges = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
        got = _cc_dict(spark, edges)
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_long_chain_converges(self, spark):
        # diameter 60: naive min-label propagation would need 60 rounds;
        # star rounds converge in O(log^2) — max_iter=25 must suffice
        edges = [(i, i + 1) for i in range(60)]
        got = _cc_dict(spark, edges)
        assert set(got.values()) == {0} and len(got) == 61

    def test_differential_random_graph(self, spark):
        rng = random.Random(7)
        edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
        edges = [e for e in edges if e[0] != e[1]]
        want = _union_find(edges)
        got = _cc_dict(spark, edges)
        assert got == want

    def test_empty_edges(self, spark):
        df = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(df).count() == 0

    def test_duplicate_and_reversed_edges_canonicalized(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)]
        got = _cc_dict(spark, edges)
        assert got == {1: 1, 2: 1, 3: 1}


class TestDedupClusters:
    def test_clusters_and_keep_flags(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
        out = dedup_clusters(docs, pairs).orderBy("doc_id").collect()
        rows = [(r.doc_id, r.cluster_id, r.cluster_size, r.keep) for r in out]
        assert rows == [
            (0, 0, 3, True), (1, 0, 3, False), (2, 0, 3, False),
            (4, 4, 2, True), (5, 4, 2, False),
        ]

    def test_anti_join_dedup_transform(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
        drop = dedup_clusters(docs, pairs).filter(~F.col("keep")).select("doc_id")
        kept = docs.join(drop, "doc_id", "left_anti")
        assert sorted(r.doc_id for r in kept.collect()) == [0, 3, 4]
