"""Join operators: equi / as-of / range joins, positional zip,
latest-value enrichment.

The reference has NO relational key-join (SURVEY.md §2.5) — its only
multi-stream combinators are structural: ``zip`` (positional,
core.py:1575-1649), ``combine_latest`` (core.py:1652-1729) and
``zip_latest`` (core.py:1948-1992). Those become, respectively, an
equi-join on per-stream sequence numbers and as-of joins. Key joins
come free with Spark and are exposed as first-class engine surface
for the star-schema queries.

As-of join strategy (scale-first): the classic union-tag-and-carry
trick — union both sides tagged, sort within each key partition by
(ts, side), carry the last right-side value forward with
``last(..., ignorenulls=True)``. One shuffle on the key, no pandas,
no per-key merge_asof loop; skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = ["asof_join", "zip_positional", "zip_latest", "combine_latest", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    *,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on (backward; forward: >=), optionally per ``by``
    key. Equivalent of pandas merge_asof / DuckDB ASOF JOIN; subsumes
    the reference's zip_latest enrichment semantics.
    """
    by = by or []
    rcols = right_cols or [c for c in right.columns if c != on and c not in by]

    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(
        *by, F.col(on), *[F.col(c).alias(c + suffix) for c in rcols]
    ).withColumn("__side", F.lit(0))

    # align schemas for union
    for c in [c + suffix for c in rcols]:
        lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    fill_cols = [c + suffix for c in rcols]

    if not by:
        # Keyless as-of: no key to shard on, but the carry trick still
        # applies — range-partition on (ts, side), fill within each
        # partition, and carry each partition's last (first) right-side
        # values across partition boundaries via a prefix (suffix) pass
        # over per-partition summaries. Fully parallel; round 1 ran
        # this as a single-task global window.
        return _asof_fill_global(unioned, on, fill_cols, direction)

    if direction == "backward":
        w = W.partitionBy(*by).orderBy(F.col(on).asc(), F.col("__side").asc()).rowsBetween(
            W.unboundedPreceding, 0
        )
        fill = {c: F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w) for c in fill_cols}
    else:
        w = W.partitionBy(*by).orderBy(F.col(on).asc(), F.col("__side").desc()).rowsBetween(
            0, W.unboundedFollowing
        )
        fill = {c: F.first(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w) for c in fill_cols}

    out = unioned
    for c, expr in fill.items():
        out = out.withColumn(c, expr)
    return out.filter(F.col("__side") == 1).drop("__side")


def _asof_fill_global(
    unioned: DataFrame,
    on: str,
    fill_cols: list[str],
    direction: str,
    src: dict[str, int] | None = None,
    emit_side: int = 1,
) -> DataFrame:
    """Two-level forward/backward fill over a global (ts, side) order.

    within-partition window keyed on the partition ordinal (parallel)
    + per-partition last/first non-null summaries combined in a
    metadata-sized prefix/suffix window, broadcast back as carry-ins.

    ``src`` maps each fill column to the ``__side`` tag that carries its
    values (default: all from side 0, the pairwise as-of shape);
    ``emit_side`` is the tag of the rows that survive the fill. This is
    what lets ``combine_latest`` fold K streams into ONE union + ONE
    range partition: each non-emit stream gets its own side tag and its
    columns fill independently over the same global order, exactly as
    the chained pairwise joins would (a side's fill skips other sides'
    rows as nulls, and the emit side's tag sorts after every source tag
    so equal-ts source rows stay visible, both directions).
    """
    from streamz_spark.operators.order import range_parted

    src = src or {c: 0 for c in fill_cols}
    backward = direction == "backward"
    side_order = F.col("__side").asc() if backward else F.col("__side").desc()
    # parted feeds BOTH the per-partition summary aggregate and the
    # carry-join output, so its subtree evaluates twice. Measured
    # trade-off: a localCheckpoint barrier here is ~25% SLOWER at sf0.1
    # (materialization costs more than re-running a codegen'd scan +
    # one range shuffle), so the single-level duplication stays. The
    # multiplicative case — chained as-of joins nesting this subtree
    # per level — is bounded in combine_latest instead.
    parted = range_parted(unioned, [F.col(on).asc(), side_order])

    if backward:
        w_local = W.partitionBy("__pid").orderBy("__mid").rowsBetween(W.unboundedPreceding, 0)
        pick_local = lambda c: F.last(  # noqa: E731
            F.when(F.col("__side") == src[c], F.col(c)), ignorenulls=True
        ).over(w_local)
        # per-partition LAST non-null source value of each fill column
        summary = [
            F.max_by(
                F.col(c),
                F.when((F.col("__side") == src[c]) & F.col(c).isNotNull(), F.col("__mid")),
            ).alias(c)
            for c in fill_cols
        ]
        w_carry = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
        carry_pick = F.last
    else:
        w_local = W.partitionBy("__pid").orderBy("__mid").rowsBetween(0, W.unboundedFollowing)
        pick_local = lambda c: F.first(  # noqa: E731
            F.when(F.col("__side") == src[c], F.col(c)), ignorenulls=True
        ).over(w_local)
        summary = [
            F.min_by(
                F.col(c),
                F.when((F.col("__side") == src[c]) & F.col(c).isNotNull(), F.col("__mid")),
            ).alias(c)
            for c in fill_cols
        ]
        w_carry = W.orderBy("__pid").rowsBetween(1, W.unboundedFollowing)
        carry_pick = F.first

    totals = parted.groupBy("__pid").agg(*summary)
    carries = totals.select(
        "__pid",
        *[
            carry_pick(F.col(c), ignorenulls=True).over(w_carry).alias(f"__carry_{c}")
            for c in fill_cols
        ],
    )
    out = parted.join(F.broadcast(carries), "__pid")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(pick_local(c), F.col(f"__carry_{c}")))
    return (
        out.filter(F.col("__side") == emit_side)
        .drop("__side", "__pid", "__mid", *[f"__carry_{c}" for c in fill_cols])
    )


def zip_positional(
    dfs: list[DataFrame], order_bys: list[str],
    prefixes: list[str] | None = None, assume_dense: bool = False,
) -> DataFrame:
    """Reference ``zip`` (core.py:1575-1649): align i-th elements across
    streams. Implemented as an inner equi-join on per-stream monotonic
    sequence numbers.

    Position recovery is ``operators.order.global_index`` — a
    range-partition + prefix-sum pass that stays fully parallel (the
    round-1 keyless ``row_number`` funneled each stream through one
    task). When each ``order_bys`` column is ALREADY a dense 0-based
    position (e.g. an unfiltered from_iterable seq, or positions
    carried from an upstream zip), pass ``assume_dense=True`` to join
    on it directly and skip the position-recovery shuffle entirely.
    """
    from streamz_spark.operators.order import global_index

    prefixes = prefixes or [f"s{i}_" for i in range(len(dfs))]
    joined: DataFrame | None = None
    for df, order_col, pref in zip(dfs, order_bys, prefixes):
        if assume_dense:
            tagged = df.select(
                F.col(order_col).cast("long").alias("__seq"),
                *[F.col(c).alias(pref + c) for c in df.columns],
            )
        else:
            tagged = global_index(df, [order_col], "__seq", zero_based=False).select(
                "__seq", *[F.col(c).alias(pref + c) for c in df.columns]
            )
        joined = tagged if joined is None else joined.join(tagged, "__seq", "inner")
    return joined.withColumnRenamed("__seq", "seq")


def zip_latest(lossless: DataFrame, other: DataFrame, on: str, right_cols: list[str] | None = None) -> DataFrame:
    """Reference ``zip_latest`` (core.py:1948-1992): every lossless
    element paired with the latest value of the other stream — an
    as-of backward join on event time.
    """
    return asof_join(lossless, other, on=on, right_cols=right_cols, direction="backward")


def combine_latest(dfs: list[DataFrame], on: str, emit_on: int = 0) -> DataFrame:
    """Reference ``combine_latest`` (core.py:1652-1729): on each event of
    the emit_on stream, snapshot the latest value of every other
    stream.

    Single-pass K-way fold: all streams union into ONE side-tagged
    frame, ONE range partition orders it globally on (ts, side), and
    each non-emit stream's columns backward-fill independently over
    that order (``_asof_fill_global`` with per-column source sides).
    Equivalent to the earlier chained pairwise as-of joins — each fill
    skips other sides' rows as nulls, and every source tag sorts before
    the emit tag at equal ts, so each emit row still sees the latest
    source value with ts <= its own — but pays one exchange + one
    summary/carry pass total instead of one per stream, and drops the
    per-level localCheckpoint that materialized the whole growing base
    K-2 times (the old chain's anti-2^K barrier, now structurally
    unnecessary).
    """
    emit = dfs[emit_on]
    others = [(i, df) for i, df in enumerate(dfs) if i != emit_on]
    if not others:
        return emit
    emit_tag = len(others)  # sorts after every source tag (side asc)
    lhs = emit.withColumn("__side", F.lit(emit_tag))
    rhs_frames: list[DataFrame] = []
    fill_cols: list[str] = []
    src: dict[str, int] = {}
    for tag, (i, other) in enumerate(others):
        rcols = [c for c in other.columns if c != on]
        suffix = f"_s{i}"
        rhs = other.select(
            F.col(on), *[F.col(c).alias(c + suffix) for c in rcols]
        ).withColumn("__side", F.lit(tag))
        rhs_frames.append(rhs)
        for c in rcols:
            fill_cols.append(c + suffix)
            src[c + suffix] = tag
    # align schemas for the union: lhs carries every fill column (null),
    # each rhs carries nulls for emit columns and the other sides' fills
    fill_types = {
        f.name: f.dataType
        for rhs in rhs_frames
        for f in rhs.schema.fields
        if f.name in src
    }
    for c in fill_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(fill_types[c]))
    unioned = lhs
    for rhs in rhs_frames:
        aligned = rhs
        for f in lhs.schema.fields:
            if f.name not in aligned.columns:
                aligned = aligned.withColumn(f.name, F.lit(None).cast(f.dataType))
        unioned = unioned.unionByName(aligned)
    return _asof_fill_global(
        unioned, on, fill_cols, "backward", src=src, emit_side=emit_tag
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
    bucket_width: float | None = None,
) -> DataFrame:
    """Point-in-interval join (left.point ∈ [right.lo, right.hi)).

    With ``bucket_width`` set (the scale path), the pure theta-join —
    which Spark can only execute as BroadcastNestedLoop/cartesian —
    becomes a shuffled *equi*-join: each interval explodes into the
    integer buckets it overlaps, each point maps to its single bucket,
    the join key is the bucket id, and the exact range predicate
    filters the bucket matches. A point's bucket is unique, so no pair
    duplicates. Fan-out per interval = interval_width / bucket_width —
    pick the width near the average interval size (the standard
    interval-join binning used by Flink and DuckDB's IEJoin
    alternatives). ``bucket_width=None`` keeps the theta-join, which is
    fine only when one side broadcasts.
    """
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    if bucket_width is None:
        return left.join(right, cond, how)
    if how != "inner":
        raise ValueError("bucketized range_join supports how='inner' only")
    w = float(bucket_width)
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w).cast("long"),
                F.floor(F.col(right_hi) / w).cast("long"),
            )
        ),
    )
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / w).cast("long"))
    return lb.join(rb, "__bucket", "inner").filter(cond).drop("__bucket")
