"""Deterministic splitting and sampling for training-data pipelines.

Two staples of corpus preparation the reference never needed:

- **hash split** — assign every row to train/val/test by hashing its
  id. Deterministic (same row → same split on every run, any cluster
  size, any partitioning), stable under corpus growth (new rows don't
  reshuffle old ones — the property random splits lose), and pure
  map-side: no shuffle, no state.
- **stratified sample** — exact n-per-stratum sample, ordered by a
  seeded hash so it's uniform-at-random yet reproducible. One shuffle
  on the strata key; the per-stratum sort is bounded by the stratum
  size (use it for per-language / per-source eval carve-outs, not for
  strata with billions of rows — for those, hash-split within the
  stratum instead).

Hashes derive from md5 (first 8/12 hex chars → int), not xxhash64 /
Spark `hash`: md5 is bit-identical in every engine (DuckDB, Trino,
Python hashlib), which makes split assignments portable across the
whole data platform, not just reproducible inside Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "hash_split_fast",
    "stratified_sample",
    "sample_fractions",
]

_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, seed: str = "42", buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(seed ':' id)."""
    key = F.concat(F.lit(seed + ":"), F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % buckets
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    seed: str = "42",
    out_col: str = "split",
) -> DataFrame:
    """Assign a split label per row from cumulative hash-bucket ranges.

    ``splits`` maps label → weight (normalized; insertion order defines
    the bucket ranges, so keep it stable across runs). Default
    ``{"train": .9, "val": .05, "test": .05}``.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    bucket = hash_bucket(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    labels = list(splits)
    for name in labels[:-1]:
        acc += splits[name] / total
        cut = int(round(acc * _BUCKETS))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: str = "42",
    flag_col: str | None = None,
) -> DataFrame:
    """Exact, reproducible n-per-stratum sample.

    Rank rows inside each stratum by a seeded md5 hash (ties broken by
    id, so the result is total-ordered and engine-independent). With
    ``flag_col`` set, returns *all* rows with a boolean marker instead
    of filtering — useful when the sample flag is one feature among
    many.
    """
    ordkey = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string"))), 1, 12),
        16, 10,
    ).cast("long")
    w = W.partitionBy(*strata).orderBy(ordkey.asc(), F.col(id_col).asc())
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if flag_col is not None:
        return ranked.withColumn(flag_col, F.col("__rk") <= n_per_stratum).drop("__rk")
    return ranked.filter(F.col("__rk") <= n_per_stratum).drop("__rk")


def hash_split_fast(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.01,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Two-way train/test split on ``xxhash64`` — the Spark-internal
    fast path (codegen'd JVM hash, no md5 string round-trip). Same
    determinism/growth-stability guarantees as :func:`hash_split`, but
    assignments are only reproducible *inside Spark* — use
    :func:`hash_split` when the split must be recomputable by other
    engines.
    """
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    return df.withColumn(
        split_col,
        F.when(bucket < int(test_frac * 1_000_000), F.lit("test")).otherwise(F.lit("train")),
    )


def sample_fractions(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 0
) -> DataFrame:
    """Per-stratum *fractional* sampling (e.g. per-language quotas when
    rebalancing a corpus) — thin wrapper over ``sampleBy`` so pipelines
    name the intent; map-side filter, no shuffle, approximate counts.
    For an exact n-per-stratum carve-out use :func:`stratified_sample`.
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)
