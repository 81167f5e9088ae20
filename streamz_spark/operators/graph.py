"""Distributed link-graph centrality (PageRank) for corpus curation.

Web-scale pretraining pipelines rank hosts/pages on the crawl link
graph to pick crawl seeds and as a document quality prior (Common
Crawl publishes harmonic-centrality/PageRank host ranks; OpenWebText
selected by link karma). The reference engine has no graph operator
family at all — this is capability-superset territory, same as
`operators.components` (its connected-components sibling).

Algorithm: classic power iteration (Page et al. 1999, public
literature), expressed as the standard Pregel-on-DataFrames shape —
per iteration one join (ranks → out-edges) and one aggregation
(sum of contributions by destination).

Determinism: ranks are BIGINT in fixed-point `scale` units and the
damping factor is an exact rational (num/den, default 17/20 = 0.85),
so every per-edge contribution is `(num·r) DIV (den·outdeg)` — pure
integer arithmetic. Sums of integers are associative, so the result
is bit-identical across partitionings, retries, AND engines (the
DuckDB oracle unrolls the same recurrence); no float summation-order
hazard anywhere. The floor() per edge loses < 1 scale-unit per edge
per iteration — with scale=1e12 that is < 1e-9 relative error for
graphs up to ~1e9 edges, far below any ranking-relevant signal.

Scale notes (100 TB / 1e9+ nodes):
- The edge list (the big relation) is joined every iteration, so it
  is degree-annotated, hash-partitioned on `src`, and
  localCheckpoint'ed ONCE before the loop; each iteration only
  shuffles the rank vector (one row per node) to that layout.
- Contribution aggregation shuffles on `dst` with map-side partial
  aggregation (integer SUM), so hub in-degree skew (the whole point
  of PageRank) is combined before the exchange.
- Per-iteration localCheckpoint truncates lineage — the iterative-
  Spark trap where the DAG doubles per round (see
  `operators.components`, same treatment).
- The only driver-side values are two scalars (node count, and the
  constants derived from it) — no row collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank"]


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    *,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**12,
    damping: tuple[int, int] = (17, 20),
    checkpoint: bool = True,
    tol_scaled: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank over `iterations` power-iteration rounds.

    `nodes`: one row per vertex (`id_col`). `edges`: directed edge
    list (`src`, `dst`); parallel edges should be pre-deduplicated by
    the caller if unweighted semantics are wanted. Dangling vertices
    (no out-edges) simply leak their mass — the standard simplified
    treatment; pass a graph without dangling vertices (or add
    self-loops) when mass conservation matters.

    Two modes:
    - `tol_scaled=None` (default): exactly `iterations` rounds — the
      reproducible form the catalog oracle unrolls.
    - `tol_scaled=t`: production convergence mode — iterate up to
      `iterations` rounds but stop early once the integer L1 delta
      Σ|r_i − r_{i−1}| ≤ t scale-units (power iteration contracts the
      L1 error by the damping factor per round, so the probe fires in
      O(log(scale/t)) rounds). The probe is ONE co-partitioned
      join+aggregate per round, same per-round budget discipline as
      `operators.components`' convergence probe; requires
      `checkpoint=True` (an unbounded loop without lineage truncation
      is the iterative-Spark trap).

    Returns (id, rank_scaled BIGINT) where rank ≈ rank_scaled/scale.
    `checkpoint=False` keeps the whole unrolled recurrence as one
    lazy plan (for plan-contract inspection); the default production
    shape materializes the edge layout once and each intermediate
    rank vector.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if tol_scaled is not None and not checkpoint:
        raise ValueError("tol_scaled requires checkpoint=True")
    num, den = damping
    if not (0 < num < den):
        raise ValueError("damping must be a proper fraction (num, den)")

    n = nodes.count()  # one scalar aggregate; never collects rows
    if n == 0:
        raise ValueError("empty node set")
    teleport = ((den - num) * scale) // (den * n)
    r0 = scale // n

    ids = nodes.select(F.col(id_col).alias("id"))
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    # degree-annotate + lay the big relation out on the join key ONCE;
    # every iteration's join re-reads this layout instead of
    # re-shuffling the edges
    ed = edges.join(deg, src).repartition(F.col(src))
    if checkpoint:
        ed = ed.localCheckpoint(eager=True)
        ids = ids.localCheckpoint(eager=True)

    ranks = ids.select("id", F.lit(r0).cast("bigint").alias("rank_scaled"))
    for i in range(iterations):
        contrib = (
            ranks.hint("shuffle_hash")
            .join(ed, ranks["id"] == ed[src])
            .select(
                F.col(dst).alias("id"),
                F.expr(
                    f"({num} * rank_scaled) DIV ({den} * __outdeg)"
                ).alias("__c"),
            )
        )
        incoming = contrib.groupBy("id").agg(F.sum("__c").alias("__in"))
        new_ranks = (
            ids.join(incoming.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (F.lit(teleport) + F.coalesce(F.col("__in"), F.lit(0)))
                .cast("bigint")
                .alias("rank_scaled"),
            )
        )
        if checkpoint and i < iterations - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol_scaled is not None and i < iterations - 1:
            delta = (
                new_ranks.withColumnRenamed("rank_scaled", "__new")
                .join(ranks.withColumnRenamed("rank_scaled", "__old"), "id")
                .agg(F.sum(F.abs(F.col("__new") - F.col("__old"))))
                .collect()[0][0]
            )  # driver scalar, one integer aggregate per round
            if delta is not None and delta <= tol_scaled:
                return new_ranks
        ranks = new_ranks
    return ranks
