"""Custom stateful streaming operators (SURVEY.md §4.3 'the hard 20%').

All built on ``applyInPandasWithState`` — the public stateful API —
keyed by a grouping column so state shards across executors (the
reference's single-process accumulate state, core.py:928-1026, becomes
per-key distributed state in the RocksDB-backed store).

NOTE: deliberately no ``from __future__ import annotations`` —
evaluated type hints matter for PySpark's UDF inference.
"""

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def accumulate(
    sdf: DataFrame,
    keys,
    func,
    state_schema: str,
    output_schema: str,
    start=None,
    output_mode: str = "update",
) -> DataFrame:
    """Generic keyed accumulate: ``state, out = func(state, chunk_pdf)``
    per micro-batch — the reference's accumulate/scan node
    (core.py:928-1026) and custom Aggregation protocol
    (dataframe/aggregations.py:11-148: initial/on_new), distributed
    per key.

    ``start`` is the initial state tuple (reference ``start=`` /
    ``with_state`` resume, test_dataframes.py:993-1101); durable resume
    is the Spark checkpoint dir.
    """

    def wrapped(key, pdfs, state: GroupState):
        st = state.get if state.exists else start
        out_frames = []
        for pdf in pdfs:
            st, out = func(st, pdf)
            if out is not None and len(out):
                out_frames.append(out)
        # normalize before state.update: a scalar state becomes a 1-tuple;
        # None would die inside GroupState with an opaque Py4J traceback,
        # so reject it here with an actionable message
        if st is None:
            raise ValueError(
                "accumulate func returned None state; return a tuple "
                "matching state_schema (wrap scalars as (value,))"
            )
        if not isinstance(st, tuple):
            st = (st,) if not isinstance(st, (list,)) else tuple(st)
        state.update(st)
        if out_frames:
            yield pd.concat(out_frames, ignore_index=True)

    return sdf.groupBy(*keys).applyInPandasWithState(
        wrapped, output_schema, state_schema, output_mode,
        GroupStateTimeout.NoTimeout,
    )


def running_sum(sdf: DataFrame, key: str, value_col: str = "value") -> DataFrame:
    """Keyed running total — accumulate's canonical instantiation
    (reference scan example, core.py:616-619)."""

    def step(state, pdf):
        total = (state[0] if state else 0.0) + float(pdf[value_col].sum())
        out = pd.DataFrame({key: pdf[key].iloc[:1], "running_sum": [total]})
        return (total,), out

    return accumulate(
        sdf.select(key, value_col), [key], step,
        state_schema="running_sum double",
        output_schema=f"{key} long, running_sum double",
    )


def partition_batches(
    sdf: DataFrame,
    key: str,
    n: int,
    timeout_ms: int | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Group events into arrays of ``n`` per key, flushing on count or
    processing-time timeout — reference partition(n, timeout, key)
    (core.py:1078-1165). Buffer rides in state; timeout flushes
    partial groups.
    """
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms else GroupStateTimeout.NoTimeout
    )

    def flush(key_, pdfs, state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        emitted = []
        if state.hasTimedOut:
            if buf:
                emitted.append(buf)
            state.remove()
        else:
            for pdf in pdfs:
                for v in pdf[value_col]:
                    buf.append(float(v))
                    if len(buf) >= n:
                        emitted.append(buf)
                        buf = []
            state.update((buf,))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        if emitted:
            yield pd.DataFrame(
                {
                    "key": [key_[0]] * len(emitted),
                    "batch": emitted,
                }
            )

    return sdf.groupBy(key).applyInPandasWithState(
        flush,
        "key long, batch array<double>",
        "buf array<double>",
        "append",
        timeout_conf,
    )


def partition_unique(
    sdf: DataFrame,
    key: str,
    n: int,
    dedup_col: str = "value",
    keep: str = "first",
) -> DataFrame:
    """Like partition(n) but deduplicates by value within each group —
    reference partition_unique (core.py:1168-1266) with keep=first/last.
    Buffer state is a map-like pair of arrays (insertion-ordered).
    """

    def flush(key_, pdfs, state: GroupState):
        vals = list(state.get[0]) if state.exists else []
        emitted = []
        for pdf in pdfs:
            for v in pdf[dedup_col]:
                v = float(v)
                if v in vals:
                    if keep == "last":
                        vals.remove(v)
                        vals.append(v)
                    continue
                vals.append(v)
                if len(vals) >= n:
                    emitted.append(vals)
                    vals = []
        state.update((vals,))
        if emitted:
            yield pd.DataFrame({"key": [key_[0]] * len(emitted), "batch": emitted})

    return sdf.groupBy(key).applyInPandasWithState(
        flush, "key long, batch array<double>", "buf array<double>",
        "append", GroupStateTimeout.NoTimeout,
    )


def collect_until_flush(
    sdf: DataFrame,
    key: str,
    value_col: str = "value",
    flush_col: str = "is_flush",
) -> DataFrame:
    """Reference Stream.collect (core.py:1901-1945): buffer everything
    per key; when a flush-marked event arrives, emit the buffered tuple
    and reset. The flush signal (a second stream in the reference) is a
    boolean column on the unioned stream — the standard union-tagged
    encoding of a control stream.
    """

    def step(key_, pdfs, state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        out = []
        for pdf in pdfs:
            for v, is_flush in zip(pdf[value_col], pdf[flush_col]):
                if is_flush:
                    out.append(buf)
                    buf = []
                else:
                    buf.append(float(v))
        state.update((buf,))
        if out:
            yield pd.DataFrame({"key": [key_[0]] * len(out), "collected": out})

    return sdf.groupBy(key).applyInPandasWithState(
        step, "key long, collected array<double>", "buf array<double>",
        "append", GroupStateTimeout.NoTimeout,
    )


def online_linear_fit(
    sdf: DataFrame,
    key: str,
    x_col: str = "x",
    y_col: str = "y",
    lr: float = 0.01,
    epochs_per_batch: int = 5,
) -> DataFrame:
    """Online ML train/predict per micro-batch — the reference's River
    integration (streamz/river.py:7-62 RiverTrain/RiverPredict) as a
    stateful operator: per-key (w, b) weights ride in the state store,
    each batch runs SGD steps on its rows and emits the updated model +
    in-batch MSE. Model state persists across batches and restarts
    (checkpoint).
    """

    def step(state, pdf):
        import numpy as np

        w, b = state if state else (0.0, 0.0)
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        for _ in range(epochs_per_batch):
            pred = w * x + b
            err = pred - y
            w -= lr * float((err * x).mean())
            b -= lr * float(err.mean())
        mse = float(((w * x + b - y) ** 2).mean())
        out = pd.DataFrame({key: pdf[key].iloc[:1], "w": [w], "b": [b], "mse": [mse]})
        return (w, b), out

    return accumulate(
        sdf.select(key, x_col, y_col), [key], step,
        state_schema="w double, b double",
        output_schema=f"{key} long, w double, b double, mse double",
    )


def ewm_mean_stream(
    sdf: DataFrame,
    key: str,
    alpha: float,
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Streaming EWM: the (num, den) recurrence state rides in the state
    store per key — the reference's EWMean (result, old_wt) state
    (aggregations.py:151-170) as a streaming operator. Emits the mean
    after each micro-batch (update cadence). Rows within a batch are
    processed in order_col order when given (micro-batch arrival order
    otherwise — the reference's emit order).
    """
    decay = 1.0 - alpha

    def step(state, pdf):
        num, den = state if state else (0.0, 0.0)
        if order_col is not None:
            pdf = pdf.sort_values(order_col)
        for v in pdf[value_col].to_numpy(dtype="float64"):
            num = v + decay * num
            den = 1.0 + decay * den
        out = pd.DataFrame({key: pdf[key].iloc[:1], "ewm": [num / den if den else None]})
        return (num, den), out

    cols = [key, value_col] + ([order_col] if order_col else [])
    return accumulate(
        sdf.select(*cols), [key], step,
        state_schema="num double, den double",
        output_schema=f"{key} long, ewm double",
    )


def count_window_sum(sdf: DataFrame, key: str, n: int, value_col: str = "value") -> DataFrame:
    """Sliding count-window aggregate per key: sum over the last ``n``
    rows seen so far, emitted per micro-batch — reference window(n=)
    (dataframe/core.py:129-169,582-596) whose deque state
    (rolling_accumulator, core.py:757-770) becomes an array column in
    the state store.
    """

    def step(state, pdf):
        tail = list(state[0]) if state else []
        vals = tail + [float(v) for v in pdf[value_col]]
        tail = vals[-n:]
        out = pd.DataFrame({key: pdf[key].iloc[:1], "window_sum": [sum(tail)],
                            "window_len": [len(tail)]})
        return (tail,), out

    return accumulate(
        sdf.select(key, value_col), [key], step,
        state_schema="tail array<double>",
        output_schema=f"{key} long, window_sum double, window_len int",
    )


def streaming_minhash_neardup(
    sdf: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    min_est_jaccard: float = 0.5,
    k: int = 3,
    ttl: float | None = None,
) -> DataFrame:
    """Incremental near-duplicate detection: every arriving document is
    checked against ALL history via LSH band state.

    The batch near-dup pipeline (operators/dedup.minhash_near_duplicates)
    re-banded the whole corpus each run; here the (band, band_hash)
    buckets live in the state store, so a new document only touches the
    buckets it hashes into — the per-doc cost is O(bands), independent
    of corpus size. This is the ingest-time shape of billion-doc dedup
    services (state shards across executors on the high-cardinality
    bucket key; the signature math is the same seeded-xxhash expression
    pipeline as the batch op, computed in codegen before the stateful
    stage).

    Emits one row per detected candidate pair ``(id_a, id_b,
    est_jaccard)`` with ``id_a < id_b``, where ``est_jaccard`` is the
    signature-agreement estimate (for exact confirmation join text back
    and verify — the batch op's verify stage). Multi-band collisions
    are deduplicated with state-backed ``dropDuplicates``.

    State is a JSON payload of (ids, signatures, seen-times) per
    bucket: an arriving doc compares against only its bucket's members
    — collision lists, not the corpus.

    ``ttl`` (seconds) bounds state for unbounded ingest: members older
    than the TTL are pruned on each bucket update (per-member
    eviction), and buckets idle for a full TTL are dropped wholesale
    via ProcessingTimeTimeout — so a year of ingest cannot OOM the
    state store; dup detection holds within the TTL window, which is
    the product contract of every ingest-time dedup service. Without
    ``ttl`` state grows with history (fine for bounded corpora). At
    production scale run the query with the RocksDB state store
    (spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider) so bucket state spills off-heap.
    """
    import json
    import time as _time

    from pyspark.sql import functions as F

    from streamz_spark.operators import dedup as dd

    rows_per_band = num_perm // bands
    sig = dd.minhash_signatures(sdf.select(id_col, text_col), id_col, text_col,
                                num_perm=num_perm, k=k)
    banded = sig.select(
        "id",
        "signature",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[
                        F.element_at("signature", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]).alias("bhash"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "signature", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))

    def step(key, pdfs, state: GroupState):
        if ttl is not None and state.hasTimedOut:
            # bucket idle a full TTL: every member is expired — drop it
            state.remove()
            return
        now = _time.time()
        if state.exists:
            loaded = json.loads(state.get[0])
            ids, sigs, times = loaded if len(loaded) == 3 else (*loaded, [])
            # legacy two-element payloads (pre-TTL checkpoints) carry no
            # seen-times: backfill with NOW, not 0.0 — zero would expire
            # every pre-upgrade member on first touch (silent loss of
            # all prior dedup history); stamping now retains them for
            # one full TTL window and ages them out normally
            times = times or [now] * len(ids)
        else:
            ids, sigs, times = [], [], []
        if ttl is not None:
            keep = [j for j, t in enumerate(times) if now - t < ttl]
            if len(keep) < len(ids):
                ids = [ids[j] for j in keep]
                sigs = [sigs[j] for j in keep]
                times = [times[j] for j in keep]
        out_a, out_b, est = [], [], []
        for pdf in pdfs:
            for i, s in zip(pdf["id"], pdf["signature"]):
                i, s = int(i), [int(x) for x in s]
                for oid, osig in zip(ids, sigs):
                    if oid == i:
                        continue
                    match = sum(1 for x, y in zip(s, osig) if x == y) / len(s)
                    out_a.append(min(i, oid))
                    out_b.append(max(i, oid))
                    est.append(match)
                ids.append(i)
                sigs.append(s)
                times.append(now)
        state.update((json.dumps([ids, sigs, times]),))
        if ttl is not None:
            state.setTimeoutDuration(int(ttl * 1000))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": est})

    pairs = banded.groupBy("band", "bhash").applyInPandasWithState(
        step,
        "id_a long, id_b long, est_jaccard double",
        "payload string",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout,
    )
    # NOTE: the Filter node between the Arrow stateful exec and
    # dropDuplicates is load-bearing beyond its predicate — it forces
    # the ColumnarToRow conversion the planner omits, without which the
    # dedup exchange's shuffle writer crashes on the stateful op's
    # columnar output (ColumnarBatchRow → UnsafeRow cast; see
    # streaming_semdedup, which hit this with no filter in between)
    return pairs.filter(pairs["est_jaccard"] >= min_est_jaccard).dropDuplicates(
        ["id_a", "id_b"]
    )


def zip_latest_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    left_value: str = "value",
    right_value: str = "value",
) -> DataFrame:
    """Reference ``zip_latest`` (core.py:1948-1992) LIVE at ingest time:
    every left ("lossless") event emits paired with the latest right
    value seen so far for its key.

    Spark's stream-stream joins only cover time-bounded equi-joins, so
    this unions the two streams with a side tag instead — ONE keyed
    state store scans both sides, the latest right value rides in state
    across micro-batches, and within a batch rows order by event time
    (right before left on ties, so an equal-timestamp right value
    counts as seen — matching the batch as-of join's inclusive bound).
    Pairing is arrival-order across batches, exactly the reference's
    semantics; it equals the event-time as-of join whenever arrival
    order respects event time (in-order sources, or a watermarked
    pre-sort upstream).

    The per-batch fill is a vectorized pandas ffill — no per-row
    Python loop. State per key is one double: O(keys) store size, no
    growth with stream length.
    """
    from pyspark.sql import functions as F

    l = left.select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(left_value).cast("double").alias("__lv"),
        F.lit(None).cast("double").alias("__rv"),
    )
    r = right.select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("double").alias("__lv"),
        F.col(right_value).cast("double").alias("__rv"),
    )
    both = l.unionByName(r)

    def step(state, pdf):
        latest = state[0] if state else None
        pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
        filled = pdf["__rv"].ffill()
        if latest is not None:
            filled = filled.fillna(latest)
        mask = pdf["__side"] == 1
        out = pd.DataFrame(
            {
                key: pdf.loc[mask, key],
                ts_col: pdf.loc[mask, "__ts"],
                left_value: pdf.loc[mask, "__lv"],
                "latest_right": filled[mask],
            }
        )
        last = filled.iloc[-1] if len(filled) else None
        new_state = latest if last is None or pd.isna(last) else float(last)
        return (new_state,), out

    return accumulate(
        both, [key], step,
        state_schema="latest double",
        output_schema=f"{key} long, {ts_col} timestamp, {left_value} double, latest_right double",
        output_mode="append",
    )


def combine_latest_stream(
    emit: DataFrame,
    others: list,
    key: str,
    ts_col: str = "ts",
    emit_value: str = "value",
    other_values: list | None = None,
) -> DataFrame:
    """Reference ``combine_latest`` (core.py:1652-1729) LIVE: each event
    of the emit stream snapshots the latest value of every other
    stream for its key (columns ``latest_0..latest_{n-1}``).

    Same single-state-store design as :func:`zip_latest_stream` — all
    streams union with a side tag, one keyed scan per micro-batch,
    state = one double per side per key (O(keys x streams), stream-
    length independent). Within a batch, rows order by event time with
    the non-emit sides first on ties.
    """
    from pyspark.sql import functions as F

    n = len(others)
    other_values = other_values or [emit_value] * n

    def tag(df: DataFrame, side: int, vcol: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.col(ts_col).alias("__ts"),
            F.lit(side).alias("__side"),
            F.col(vcol).cast("double").alias("__v"),
        )

    both = tag(emit, n, emit_value)
    for i, o in enumerate(others):
        both = both.unionByName(tag(o, i, other_values[i]))

    latest_cols = [f"latest_{i}" for i in range(n)]

    def step(state, pdf):
        latest = list(state) if state else [None] * n
        pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
        mask = pdf["__side"] == n
        out = {key: pdf.loc[mask, key], ts_col: pdf.loc[mask, "__ts"],
               emit_value: pdf.loc[mask, "__v"]}
        for i in range(n):
            side_vals = pdf["__v"].where(pdf["__side"] == i)
            filled = side_vals.ffill()
            if latest[i] is not None:
                filled = filled.fillna(latest[i])
            out[latest_cols[i]] = filled[mask]
            tail = side_vals.dropna()
            if len(tail):
                latest[i] = float(tail.iloc[-1])
        return tuple(latest), pd.DataFrame(out)

    state_schema = ", ".join(f"l{i} double" for i in range(n))
    out_schema = (
        f"{key} long, {ts_col} timestamp, {emit_value} double, "
        + ", ".join(f"{c} double" for c in latest_cols)
    )
    return accumulate(
        both, [key], step,
        state_schema=state_schema,
        output_schema=out_schema,
        output_mode="append",
    )


def zip_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    left_value: str = "value",
    right_value: str = "value",
    max_buffer: int = 100_000,
) -> DataFrame:
    """Reference ``zip`` (core.py:1575-1649) LIVE: pair the i-th left
    event with the i-th right event per key, buffering whichever side
    is ahead. Emits ``(key, seq, left, right)`` with a per-key pair
    ordinal.

    The reference buffers unboundedly and relies on backpressure; a
    state-store implementation cannot push back on a source, so the
    per-side buffer is capped at ``max_buffer`` and overflow raises
    (fail loudly rather than silently dropping pairs — pick the cap
    from the worst acceptable inter-stream lag). State per key is the
    two pending buffers plus the emitted count: O(lag), independent of
    stream length once both sides keep up.
    """
    from pyspark.sql import functions as F

    l = left.select(
        F.col(key), F.col(ts_col).alias("__ts"), F.lit(0).alias("__side"),
        F.col(left_value).cast("double").alias("__v"),
    )
    r = right.select(
        F.col(key), F.col(ts_col).alias("__ts"), F.lit(1).alias("__side"),
        F.col(right_value).cast("double").alias("__v"),
    )
    both = l.unionByName(r)

    def step(state, pdf):
        lbuf, rbuf, emitted = (
            (list(state[0]), list(state[1]), int(state[2])) if state else ([], [], 0)
        )
        pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
        lbuf += pdf.loc[pdf["__side"] == 0, "__v"].tolist()
        rbuf += pdf.loc[pdf["__side"] == 1, "__v"].tolist()
        if max(len(lbuf), len(rbuf)) > max_buffer:
            raise RuntimeError(
                f"zip_stream buffer overflow (> {max_buffer}) for key "
                f"{pdf[key].iloc[0]!r}: one stream is {abs(len(lbuf) - len(rbuf))} "
                "events ahead — raise max_buffer or fix the lagging source"
            )
        k = min(len(lbuf), len(rbuf))
        out = pd.DataFrame(
            {
                key: [pdf[key].iloc[0]] * k,
                "seq": range(emitted, emitted + k),
                "left": lbuf[:k],
                "right": rbuf[:k],
            }
        )
        return (lbuf[k:], rbuf[k:], emitted + k), out

    return accumulate(
        both, [key], step,
        state_schema="lbuf array<double>, rbuf array<double>, emitted long",
        output_schema=f"{key} long, seq long, left double, right double",
        output_mode="append",
    )


def streaming_duplicated_anchors(
    sdf: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    ttl: float | None = None,
    max_occurrences: int = 64,
) -> DataFrame:
    """Ingest-time ExactSubstr anchors: the streaming counterpart of
    ``operators.dedup.duplicated_spans``. Every arriving document's
    positional k-grams probe per-gram state; the moment a gram's
    corpus count crosses 2 the FIRST occurrence is emitted
    retroactively alongside the new one, and later occurrences emit as
    they arrive — so the anchor stream equals the batch operator's
    anchor relation over the same prefix (per-doc interval merge is a
    downstream batch step over the anchors, exactly as in the batch
    op).

    State shards on ``xxhash64(gram)`` — the same 8-byte key the batch
    op shuffles on; per-gram state is (occurrence list, last-seen), so
    an arriving doc costs O(its grams), independent of corpus size.
    ``max_occurrences`` caps the stored list per gram (boilerplate
    grams): beyond the cap new arrivals still emit (the gram is known
    duplicated — state keeps only the flag-bearing head), so hot grams
    cannot grow state. ``ttl`` (seconds) evicts idle grams via
    per-update pruning + ProcessingTimeTimeout sweeps — the same
    bounded-state contract as ``streaming_minhash_neardup``.

    Emits ``(id, pos, gh)`` per duplicated anchor occurrence.
    """
    import json
    import time as _time

    from pyspark.sql import functions as F

    from streamz_spark.operators.text import word_kgrams

    if max_occurrences < 2:
        # the trim keeps the flag-bearing head PLUS the newest
        # (max_occurrences - 1) entries; below 2 that window is empty
        # and the slice arithmetic (-0) would silently disable the cap
        raise ValueError("max_occurrences must be >= 2 (head + at least one tail entry)")

    kg = sdf.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_kgrams(text_col, k)).alias("pos", "gram"),
    ).select("id", "pos", F.xxhash64("gram").alias("gh"))

    def step(key, pdfs, state: GroupState):
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        now = _time.time()
        if state.exists:
            occ, seen = json.loads(state.get[0])
        else:
            occ, seen = [], 0.0
        if ttl is not None and occ and now - seen >= ttl:
            occ = []  # idle past TTL: prior occurrences expired
        out_id, out_pos = [], []
        for pdf in pdfs:
            for i, p in zip(pdf["id"], pdf["pos"]):
                i, p = int(i), int(p)
                occ.append((i, p))
                if len(occ) == 2:
                    # the gram just became duplicated: emit the head
                    # occurrence retroactively, then the new one
                    out_id.append(occ[0][0])
                    out_pos.append(occ[0][1])
                if len(occ) >= 2:
                    out_id.append(i)
                    out_pos.append(p)
                if len(occ) > max_occurrences:
                    occ = occ[:1] + occ[-(max_occurrences - 1):]
        state.update((json.dumps([occ, now]),))
        if ttl is not None:
            state.setTimeoutDuration(int(ttl * 1000))
        if out_id:
            yield pd.DataFrame(
                {"id": out_id, "pos": out_pos, "gh": [key[0]] * len(out_id)}
            )

    return kg.groupBy("gh").applyInPandasWithState(
        step,
        "id long, pos long, gh long",
        "payload string",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout,
    )


def streaming_semdedup(
    sdf: DataFrame,
    centroid_rows: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    ttl: float | None = None,
) -> DataFrame:
    """Ingest-time SemDeDup (Abbas et al. 2023): the streaming
    counterpart of ``operators.dedup.semdedup``. Every arriving vector
    is assigned to its nearest centroid cell by the SAME broadcast
    packed-centroid argmin expression as the batch op (stateless,
    narrow), then compared by exact cosine against the cell's stored
    members — cluster-scoped state, so an arriving vector costs
    O(cell members), never O(corpus).

    ``centroid_rows`` is the fixed centroid table ``[(cell, cvec),
    ...]`` — ingest-time semantic dedup requires centroids trained
    ahead of the stream (the production recipe: train KMeans offline
    on a bounded sample, pin the centroids for the ingest window).

    Emits one row per detected duplicate pair ``(id_a, id_b, cosine)``
    with ``id_a < id_b`` and ``cosine >= threshold``. Because the
    batch op's drop rule is ALSO edge-based (drop iff cosine >=
    threshold to a lower-id same-cell member — no transitive closure),
    the ingest kept-set {id: no emitted pair with id_b = id} equals
    the batch ``keep`` set exactly, independent of arrival order and
    cluster shape.

    ``ttl`` (seconds) bounds state for unbounded ingest exactly as in
    ``streaming_minhash_neardup`` (per-member eviction + idle-cell
    timeout sweeps).
    """
    import json
    import time as _time

    from pyspark.sql import functions as F

    # centroids ride as a LITERAL expression, not a stream-static
    # cross join: the joined columnar batch cannot feed the stateful
    # exec (ColumnarBatchRow vs UnsafeRow), and a literal keeps the
    # stream side join-free entirely. Ingest-time centroid tables are
    # small by design (trained offline on a bounded sample); a
    # 100k-cell deployment would switch to a stream-static equi-join
    # on a prehashed cell key instead.
    cents_lit = F.array(*[
        F.struct(
            F.lit(int(c)).alias("cell"),
            F.array(*[F.lit(float(x)) for x in v]).alias("cvec"),
        )
        for c, v in centroid_rows
    ])
    nearest = F.element_at(
        F.array_sort(
            F.transform(
                cents_lit,
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(F.col("v"), c["cvec"], lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        ),
        1,
    )["cell"]
    assigned = sdf.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select("id", "v", nearest.alias("cell"))

    def step(key, pdfs, state: GroupState):
        import math

        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        now = _time.time()
        if state.exists:
            ids, vecs, times = json.loads(state.get[0])
        else:
            ids, vecs, times = [], [], []
        if ttl is not None:
            live = [j for j, t in enumerate(times) if now - t < ttl]
            if len(live) < len(ids):
                ids = [ids[j] for j in live]
                vecs = [vecs[j] for j in live]
                times = [times[j] for j in live]
        out_a, out_b, out_c = [], [], []
        for pdf in pdfs:
            for i, v in zip(pdf["id"], pdf["v"]):
                i, v = int(i), [float(x) for x in v]
                nv = math.sqrt(sum(x * x for x in v))
                for oid, ov in zip(ids, vecs):
                    if oid == i:
                        continue
                    no = math.sqrt(sum(x * x for x in ov))
                    cos = (
                        sum(x * y for x, y in zip(v, ov)) / (nv * no)
                        if nv * no > 0 else 0.0
                    )
                    if cos >= threshold:
                        out_a.append(min(i, oid))
                        out_b.append(max(i, oid))
                        out_c.append(cos)
                ids.append(i)
                vecs.append(v)
                times.append(now)
        state.update((json.dumps([ids, vecs, times]),))
        if ttl is not None:
            state.setTimeoutDuration(int(ttl * 1000))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    pairs = assigned.groupBy("cell").applyInPandasWithState(
        step,
        "id_a long, id_b long, cosine double",
        "payload string",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout,
    )
    # the filter restates the in-state threshold (always true for
    # emitted rows) — it is REQUIRED, not belt-and-braces: the Arrow
    # stateful exec's output is columnar, and chaining dropDuplicates'
    # exchange directly onto it crashes the shuffle writer
    # (ColumnarBatchRow → UnsafeRow cast); the row-based Filter node in
    # between forces the ColumnarToRow conversion the planner omits.
    # streaming_minhash_neardup has the same shape for the same reason.
    return pairs.filter(pairs["cosine"] >= threshold).dropDuplicates(
        ["id_a", "id_b"]
    )


def streaming_topk_similarity(
    sdf: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Ingest-time exact top-k cosine neighbors per query over a vector
    STREAM with BOUNDED state — the streaming counterpart of
    ``similarity.brute_force_topk`` (and the shape of incremental
    top-k similarity search over arriving data; cf. the retrieved
    EDBT'19/'20 streaming-similarity-search papers).

    Scoring is JVM-side per micro-batch: the (small, static) query set
    broadcasts into a stream-static join and the cosine folds in
    Catalyst exprs — Python sees only the scored (qid, cid, cosine)
    rows. The keyed state holds exactly the current top-k (id, score)
    pairs per query — corpus-size-INDEPENDENT, so an unbounded stream
    never grows state. Each micro-batch emits the refreshed top-k for
    the queries it touched (update mode); the final emission equals
    the batch operator's result on the same corpus (same cosine
    expression, same deterministic tie-break: score desc, id asc).
    Self-matches (cid == qid) are excluded, as in the batch operator.
    """
    from pyspark.sql import functions as F

    from streamz_spark.operators.similarity import cosine_expr, with_norm

    q = with_norm(
        queries.select(
            F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
        ),
        "qv",
        "qnorm",
    )
    c = with_norm(
        sdf.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")),
        "cv",
        "cnorm",
    )
    scored = c.join(F.broadcast(q), F.col("cid") != F.col("qid")).select(
        "qid", "cid", cosine_expr("qv", "cv", "qnorm", "cnorm").alias("cosine")
    )

    def step(state, pdf):
        ids = list(state[0]) if state else []
        scores = list(state[1]) if state else []
        ids.extend(int(x) for x in pdf["cid"])
        scores.extend(float(x) for x in pdf["cosine"])
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
        ids = [ids[i] for i in order]
        scores = [scores[i] for i in order]
        out = pd.DataFrame(
            {
                "qid": pdf["qid"].iloc[0],
                "cid": ids,
                "cosine": scores,
                "rank": range(1, len(ids) + 1),
            }
        )
        return (ids, scores), out

    return accumulate(
        scored,
        ["qid"],
        step,
        state_schema="ids array<long>, scores array<double>",
        output_schema="qid long, cid long, cosine double, rank int",
    )


def streaming_heavy_hitters(
    sdf: DataFrame,
    col: str,
    k: int,
    shards: int = 8,
) -> DataFrame:
    """Ingest-time heavy-hitter sketch: per-shard Misra-Gries counters
    maintained across micro-batches, bounded at ``k`` counters per
    shard regardless of stream length or key cardinality.

    Rows hash-shard on the key (xxhash64 % shards), so every copy of a
    key lands in one shard and the classic guarantee survives
    sharding: a key with global frequency > n/k has shard frequency
    > n_shard/k (n_shard ≤ n) and therefore cannot be evicted from its
    shard's sketch. Each batch emits the shard's FULL counter snapshot
    (update mode) — the last emit per shard is the final sketch; the
    deployment pattern is sketch-at-ingest, then one batch pass to
    verify the ≤ shards·k candidates exactly (see
    ``operators.sketches.heavy_hitters`` for the batch twin and the
    verify step).

    State per shard: two parallel arrays (keys as strings, counts),
    ≤ k entries — memory is O(shards·k), corpus-size-independent.
    """
    from pyspark.sql import functions as F

    from streamz_spark.operators.sketches import _mg_trim

    tagged = sdf.select(
        F.col(col).cast("string").alias("__key"),
        (F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(shards)))
        .cast("long")
        .alias("__shard"),
    ).filter(F.col("__key").isNotNull())

    def step(key_, pdfs, state: GroupState):
        if state.exists:
            keys, cnts, n_shard = state.get
            counters = dict(zip(list(keys), [int(c) for c in cnts]))
            n_shard = int(n_shard)
        else:
            counters, n_shard = {}, 0
        for pdf in pdfs:
            vc = pdf["__key"].value_counts()
            n_shard += int(vc.sum())
            for val, w in vc.items():
                counters[val] = counters.get(val, 0) + int(w)
            if len(counters) > 4 * k:
                _mg_trim(counters, k)
        _mg_trim(counters, k)
        state.update((list(counters), [counters[x] for x in counters], n_shard))
        yield pd.DataFrame(
            {
                "shard": [int(key_[0])],
                "keys": [list(counters)],
                "cnt_lb": [[counters[x] for x in counters]],
                "n_shard": [n_shard],
            }
        )

    return tagged.groupBy("__shard").applyInPandasWithState(
        step,
        "shard long, keys array<string>, cnt_lb array<long>, n_shard long",
        "keys array<string>, cnts array<long>, n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
