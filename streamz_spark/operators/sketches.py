"""Frequency sketches: exact distributed heavy hitters via Misra-Gries.

Hot-key discovery is the pre-flight every 100 TB join/groupBy runs
before choosing a skew strategy (see `operators.skew` for the
mitigation side and `skew_profile_events` for the descriptive
profile). The naive way — full groupBy over the key — pays an
exchange carrying one row per distinct key per map partition, which
at web scale (1e9+ distinct keys) is itself the skew problem. The
classic fix (Misra & Gries 1982, "Finding repeated elements";
distributed two-pass form per Cormode & Hadjieleftheriou, VLDB'08 —
public literature) bounds that to k candidates per partition:

1. **Sketch pass** (`mapInPandas`, shuffle-free): each partition
   maintains a k-counter Misra-Gries summary. MG guarantees any item
   with partition frequency > n_p/k survives; summing the guarantee
   over partitions (pigeonhole), any item with GLOBAL frequency >
   n/k survives in at least one partition's sketch. Candidates are
   ≤ k·P rows — tiny.
2. **Verify pass**: exact counts for candidate keys only (broadcast
   semi-join + hash aggregate over a k·P key space, map-side
   combined), filtered to `cnt · k > n`.

The result is EXACT (superset candidates + exact verification), so
the DuckDB oracle is the plain `GROUP BY ... HAVING cnt*k > n` — the
sketch only prunes the exchange, never the answer.

The per-batch update is vectorized: pandas `value_counts` per Arrow
batch, merged into the counter dict as weighted MG increments; the
trim subtracts the (len-k)-th smallest count from all counters (each
subtracted unit hits ≥ k+1 live counters, preserving the classic
undercount bound ≤ n_p/(k+1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["heavy_hitters", "mg_candidates"]


def _mg_trim(counters: dict, k: int) -> None:
    """Weighted Misra-Gries trim: shrink `counters` to ≤ k entries by
    subtracting the (len-k)-th smallest count from every counter and
    dropping the non-positive ones. In-place."""
    excess = len(counters) - k
    if excess <= 0:
        return
    m = sorted(counters.values())[excess - 1]
    for key in list(counters):
        c = counters[key] - m
        if c > 0:
            counters[key] = c
        else:
            del counters[key]


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Sketch pass: per-partition Misra-Gries candidates.

    Returns (key, cnt) rows — per partition, ≤ k candidate keys with
    their MG lower-bound counts, plus ONE sentinel row (key=NULL,
    cnt=partition row count) so the caller can derive the global total
    from the same single pass. Guaranteed superset of every key with
    global frequency > n/k.
    """
    key_field = df.schema[col]
    out_schema = f"`{col}` {key_field.dataType.simpleString()}, cnt long"

    def sketch(iterator):
        import pandas as pd

        counters: dict = {}
        total = 0
        for pdf in iterator:
            vc = pdf[col].value_counts(dropna=True)
            total += int(vc.sum())  # NULL keys excluded from n too
            for val, w in vc.items():
                counters[val] = counters.get(val, 0) + int(w)
            # trim lazily at 4k to amortize the sort; correctness only
            # needs the invariant restored before emitting
            if len(counters) > 4 * k:
                _mg_trim(counters, k)
        _mg_trim(counters, k)
        rows = [(key, int(cnt)) for key, cnt in counters.items()]
        rows.append((None, total))
        yield pd.DataFrame(rows, columns=[col, "cnt"])

    return df.select(col).mapInPandas(sketch, schema=out_schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Every key of `df[col]` with frequency strictly greater than
    n/k, with its EXACT count — (col, cnt) — in two scan-bound passes
    and no full-cardinality exchange. NULL keys are ignored (they are
    never join keys worth salting).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # one pass: candidates + per-partition totals; tiny (≤ (k+1)·P
    # rows), so materialize once for its two consumers
    cand = mg_candidates(df, col, k).localCheckpoint(eager=True)
    n = (
        cand.filter(F.col(col).isNull())
        .agg(F.sum("cnt"))
        .collect()[0][0]
    ) or 0  # driver scalar: one aggregate row, never row data
    keys = cand.filter(F.col(col).isNotNull()).select(col).distinct()
    exact = (
        df.select(col)
        .join(F.broadcast(keys), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.filter(F.col("cnt") * k > F.lit(n))
