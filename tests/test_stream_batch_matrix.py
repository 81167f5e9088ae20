"""Streaming↔batch differential matrix (the reference's dominant test
pattern, streamz/dataframe/tests/test_dataframes.py:97-111: run the
same computation on a static frame and on the frame replayed as a
stream, and require identical results).

Every cell replays an sf0.001 table through the file-stream source
(availableNow, one micro-batch per chunk) and compares the streaming
result against the same operator applied to the batch table:

- stateless ops (filter/map/explode) → append-mode union of batches
- updating aggregates (global/groupby/frequencies/tumbling window) →
  complete-mode final batch
- custom stateful ops (running_sum/ewm/count-window/partition/
  dedup-first) → last emit per key vs the batch analogue

Comparison: exact on non-float columns, 1e-9 relative on floats
(incremental per-batch accumulation legitimately reorders float
addition vs the batch plan; anything beyond fp-reassociation noise
fails).

Order-sensitive cells replay with CONTIGUOUS range chunks (not the
``id % n`` interleave of ``replay_table``) so per-key arrival order
equals the batch order column.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.streaming.sinks import sink_to_list
from streamz_spark.streaming.sources import from_directory

from .conftest import SF_DIR


def _replay_ordered(spark, table: str, order_col: str, n_chunks: int = 4):
    """Replay a table as n_chunks micro-batches of CONTIGUOUS order_col
    ranges — chunk i holds the i-th quantile of rows, so arrival order
    (chunk asc, then order_col within the batch) equals batch order."""
    df = load_table(spark, SF_DIR, table)
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    span = (int(hi) - int(lo) + 1 + n_chunks - 1) // n_chunks
    tmp = tempfile.mkdtemp(prefix=f"matrix_{table}_")
    for i in range(n_chunks):
        df.filter(
            (F.col(order_col) >= int(lo) + i * span)
            & (F.col(order_col) < int(lo) + (i + 1) * span)
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, f"chunk={i:05d}")
        )
    return from_directory(
        spark, os.path.join(tmp, "chunk=*"), df.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )


def _assert_frames_match(got: pd.DataFrame, want: pd.DataFrame, cell: str):
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols, f"{cell}: schema {sorted(got.columns)} vs {cols}"
    g = got.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    w = want.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    assert len(g) == len(w), f"{cell}: rows {len(g)} vs {len(w)}"
    for c in cols:
        if np.issubdtype(w[c].dtype, np.floating):
            np.testing.assert_allclose(
                g[c].to_numpy(dtype="float64"), w[c].to_numpy(dtype="float64"),
                rtol=1e-9, err_msg=f"{cell}: column {c}",
            )
        else:
            assert g[c].astype(str).tolist() == w[c].astype(str).tolist(), (
                f"{cell}: column {c} differs"
            )


def _last_emit_per_key(batches: list[pd.DataFrame], key: str) -> pd.DataFrame:
    """For update-mode stateful ops emitting one row per key per batch:
    the final state is the LAST emit for each key across batches."""
    allb = pd.concat(
        [b.assign(__b=i) for i, b in enumerate(batches) if len(b)],
        ignore_index=True,
    )
    return (
        allb.sort_values("__b")
        .groupby(key, as_index=False)
        .last()
        .drop(columns="__b")
    )


# ----------------------------------------------------------------- cells
# each cell: (name, stream_fn(spark) -> pdf, batch_fn(spark) -> pdf)

def _cell_filter_project_lineitem(spark):
    from streamz_spark.streaming.sources import replay_table

    proj = lambda df: df.filter(F.col("l_quantity") > 25).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    got = pd.concat(
        sink_to_list(proj(replay_table(spark, SF_DIR, "lineitem", chunk_col="l_orderkey"))),
        ignore_index=True,
    )
    want = proj(load_table(spark, SF_DIR, "lineitem")).toPandas()
    return got, want


def _cell_map_assign_events(spark):
    from streamz_spark.streaming.sources import replay_table

    proj = lambda df: df.select(
        "event_id", (F.col("value") * 2 + 1).alias("v2"),
        F.upper("event_type").alias("etype"),
    )
    got = pd.concat(
        sink_to_list(proj(replay_table(spark, SF_DIR, "events", chunk_col="event_id"))),
        ignore_index=True,
    )
    want = proj(load_table(spark, SF_DIR, "events")).toPandas()
    return got, want


def _cell_explode_documents(spark):
    from streamz_spark.streaming.sources import replay_table

    proj = lambda df: df.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 3)
    got = pd.concat(
        sink_to_list(proj(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))),
        ignore_index=True,
    )
    want = proj(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


def _cell_distinct_orders(spark):
    from streamz_spark.streaming.sources import replay_table

    got = pd.concat(
        sink_to_list(
            replay_table(spark, SF_DIR, "orders", chunk_col="o_orderkey")
            .select("o_orderpriority", "o_orderstatus")
            .dropDuplicates()
        ),
        ignore_index=True,
    )
    want = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .distinct()
        .toPandas()
    )
    return got, want


def _cell_global_agg_events(spark):
    from streamz_spark.streaming.sources import replay_table

    agg = lambda df: df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    got = sink_to_list(
        agg(replay_table(spark, SF_DIR, "events", chunk_col="event_id")),
        output_mode="complete",
    )[-1]
    want = agg(load_table(spark, SF_DIR, "events")).toPandas()
    return got, want


def _cell_groupby_agg_events(spark):
    from streamz_spark.streaming.sources import replay_table

    agg = lambda df: df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    got = sink_to_list(
        agg(replay_table(spark, SF_DIR, "events", chunk_col="event_id")),
        output_mode="complete",
    )[-1]
    want = agg(load_table(spark, SF_DIR, "events")).toPandas()
    return got, want


def _cell_frequencies_orders(spark):
    from streamz_spark.streaming.sources import replay_table

    freq = lambda df: df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("count")
    )
    got = sink_to_list(
        freq(replay_table(spark, SF_DIR, "orders", chunk_col="o_orderkey")),
        output_mode="complete",
    )[-1]
    want = freq(load_table(spark, SF_DIR, "orders")).toPandas()
    return got, want


def _cell_tumbling_window_events(spark):
    from streamz_spark.streaming.sources import replay_table

    win = lambda df: df.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    ).select(F.col("w.start").alias("wstart"), "n", "total")
    got = sink_to_list(
        win(replay_table(spark, SF_DIR, "events", chunk_col="event_id")),
        output_mode="complete",
    )[-1]
    want = win(load_table(spark, SF_DIR, "events")).toPandas()
    return got, want


def _cell_running_sum_events(spark):
    from streamz_spark.streaming.stateful import running_sum

    got = _last_emit_per_key(
        sink_to_list(
            running_sum(
                _replay_ordered(spark, "events", "event_id"), "user_id"
            ),
            output_mode="update",
        ),
        "user_id",
    )
    want = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("running_sum"))
        .toPandas()
    )
    return got, want


def _cell_ewm_stream_events(spark):
    from streamz_spark.operators.windows import ewm_mean
    from streamz_spark.streaming.stateful import ewm_mean_stream

    got = _last_emit_per_key(
        sink_to_list(
            ewm_mean_stream(
                _replay_ordered(spark, "events", "event_id"),
                "user_id", alpha=0.3, order_col="event_id",
            ),
            output_mode="update",
        ),
        "user_id",
    )
    # batch analogue: per-key EWM over event_id order, keep last row
    full = ewm_mean(
        load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value"),
        "event_id", "value", "ewm", alpha=0.3, partition_by=["user_id"],
    ).toPandas()
    want = (
        full.sort_values("event_id")
        .groupby("user_id", as_index=False)
        .last()[["user_id", "ewm"]]
    )
    return got, want[["user_id", "ewm"]]


def _cell_count_window_events(spark):
    from pyspark.sql import Window as W

    from streamz_spark.streaming.stateful import count_window_sum

    n = 7
    got = _last_emit_per_key(
        sink_to_list(
            count_window_sum(
                _replay_ordered(spark, "events", "event_id"), "user_id", n=n
            ),
            output_mode="update",
        ),
        "user_id",
    )
    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    want = (
        load_table(spark, SF_DIR, "events")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .groupBy("user_id")
        .agg(
            F.sum("value").alias("window_sum"),
            F.count(F.lit(1)).cast("int").alias("window_len"),
        )
        .toPandas()
    )
    return got, want


def _cell_partition_batches_events(spark):
    from streamz_spark.streaming.stateful import partition_batches

    n = 5
    batches = sink_to_list(
        partition_batches(
            _replay_ordered(spark, "events", "event_id"), "user_id", n=n
        )
    )
    allb = pd.concat([b for b in batches if len(b)], ignore_index=True)
    got = pd.DataFrame(
        {
            "key": allb["key"],
            "batch": [",".join(f"{v:.6f}" for v in b) for b in allb["batch"]],
        }
    )
    # batch analogue: per-key contiguous groups of n in event order,
    # full groups only (streaming keeps the trailing partial in state)
    pdf = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "event_id"])
    )
    keys, vals = [], []
    for uid, g in pdf.groupby("user_id"):
        v = g["value"].tolist()
        for i in range(0, len(v) - n + 1, n):
            keys.append(uid)
            vals.append(",".join(f"{x:.6f}" for x in v[i : i + n]))
    want = pd.DataFrame({"key": keys, "batch": vals})
    return got, want


def _cell_dedup_first_documents(spark):
    # streaming exact-dedup: dropDuplicates on a derived key keeps the
    # first arrival; the surviving KEY SET must equal the batch distinct
    from streamz_spark.streaming.sources import replay_table

    keyed = lambda df: df.select(
        F.md5(F.lower(F.trim("text"))).alias("k")
    )
    got = pd.concat(
        sink_to_list(
            keyed(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))
            .dropDuplicates(["k"])
        ),
        ignore_index=True,
    )
    want = keyed(load_table(spark, SF_DIR, "documents")).distinct().toPandas()
    return got, want


CELLS = {
    "filter_project/lineitem": _cell_filter_project_lineitem,
    "map_assign/events": _cell_map_assign_events,
    "explode/documents": _cell_explode_documents,
    "distinct/orders": _cell_distinct_orders,
    "global_agg/events": _cell_global_agg_events,
    "groupby_agg/events": _cell_groupby_agg_events,
    "frequencies/orders": _cell_frequencies_orders,
    "tumbling_window/events": _cell_tumbling_window_events,
    "running_sum/events": _cell_running_sum_events,
    "ewm/events": _cell_ewm_stream_events,
    "count_window/events": _cell_count_window_events,
    "partition/events": _cell_partition_batches_events,
    "dedup_first/documents": _cell_dedup_first_documents,
}




def _cell_union_events(spark):
    # two streams (disjoint event_type slices of the same table) unioned
    # — the multi-stream merge op — must equal the batch union
    from streamz_spark.streaming.sources import replay_table

    s1 = replay_table(spark, SF_DIR, "events", chunk_col="event_id").filter(
        F.col("event_type") < "m"
    )
    s2 = replay_table(spark, SF_DIR, "events", chunk_col="event_id").filter(
        F.col("event_type") >= "m"
    )
    got = pd.concat(
        sink_to_list(s1.unionByName(s2).select("event_id", "event_type", "value")),
        ignore_index=True,
    )
    want = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    ).toPandas()
    return got, want


def _cell_agg_then_filter_orders(spark):
    # HAVING-shaped: complete-mode groupby aggregate with a post-agg
    # filter — the updating-result composition path
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: (
        df.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
        .filter(F.col("n") > 100)
    )
    got = sink_to_list(
        shape(replay_table(spark, SF_DIR, "orders", chunk_col="o_orderkey")),
        output_mode="complete",
    )[-1]
    want = shape(load_table(spark, SF_DIR, "orders")).toPandas()
    return got, want


def _cell_stream_static_join_events(spark):
    # stream-static broadcast join: the streaming fact side enriched
    # against a batch-computed dimension (per-type mean) must equal the
    # same join on the static table — the enrich-at-ingest path
    from streamz_spark.streaming.sources import replay_table

    dim = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.avg("value").alias("type_mean"))
    )
    shape = lambda df: (
        df.join(F.broadcast(dim), "event_type")
        .select("event_id", "event_type", (F.col("value") - F.col("type_mean")).alias("dev"))
    )
    got = pd.concat(
        sink_to_list(shape(replay_table(spark, SF_DIR, "events", chunk_col="event_id"))),
        ignore_index=True,
    )
    want = shape(load_table(spark, SF_DIR, "events")).toPandas()
    return got, want


def _cell_minhash_signatures_documents(spark):
    # minhash signatures are per-doc stateless: computing them on the
    # replayed stream must give bit-identical arrays to the batch pass
    # (guards the two-stage hash against any batch-only rewrite —
    # e.g. a persist barrier would break the streaming side outright).
    # Arrays compare as a per-row hash so the frame compare stays scalar.
    from streamz_spark.operators import dedup as dd
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: dd.minhash_signatures(
        df.select("doc_id", "text"), "doc_id", "text", num_perm=16, k=3
    ).select("id", F.hash("signature").alias("sig_hash"))
    got = pd.concat(
        sink_to_list(shape(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))),
        ignore_index=True,
    )
    want = shape(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


def _cell_tpch_q1_lineitem(spark):
    # TPC-H q1 as a streaming maintenance query: the full pricing
    # summary (filter + 8-aggregate groupBy) maintained incrementally
    # over the replayed lineitem must equal the batch result — the
    # "any analytic aggregation runs as a live view" claim, proved on
    # a real reference query rather than a toy aggregate
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: (
        df.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    got = sink_to_list(
        shape(replay_table(spark, SF_DIR, "lineitem", chunk_col="l_orderkey")),
        output_mode="complete",
    )[-1]
    want = shape(load_table(spark, SF_DIR, "lineitem")).toPandas()
    return got, want


def _cell_tpch_q6_lineitem(spark):
    # TPC-H q6 (selective global revenue aggregate) as a streaming
    # maintenance query — filters prune each micro-batch before the
    # running aggregate state, same as the batch scan pushdown
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: (
        df.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )
    got = sink_to_list(
        shape(replay_table(spark, SF_DIR, "lineitem", chunk_col="l_orderkey")),
        output_mode="complete",
    )[-1]
    want = shape(load_table(spark, SF_DIR, "lineitem")).toPandas()
    return got, want


CELLS["union/events"] = _cell_union_events
CELLS["agg_then_filter/orders"] = _cell_agg_then_filter_orders
CELLS["stream_static_join/events"] = _cell_stream_static_join_events
CELLS["minhash_signatures/documents"] = _cell_minhash_signatures_documents
def _cell_zip_latest_stream_events(spark):
    # LIVE zip_latest: every non-view event paired with the latest view
    # value seen so far for its user, latest carried in the state store
    # across micro-batches — must equal the pandas as-of replication on
    # the full table (arrival order == event-time order here: the
    # replay chunks contiguously on event_id and ts is monotone in it)
    from streamz_spark.streaming.stateful import zip_latest_stream

    stream = _replay_ordered(spark, "events", "event_id")
    got = pd.concat(
        sink_to_list(
            zip_latest_stream(
                stream.filter(F.col("event_type") != "view"),
                stream.filter(F.col("event_type") == "view"),
                key="user_id",
            ),
            output_mode="append",
        ),
        ignore_index=True,
    )

    full = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .toPandas()
        .sort_values(["ts", "event_id"], kind="mergesort")
    )
    # right (view) before left on ts ties, matching the operator
    full["__side"] = (full["event_type"] != "view").astype(int)
    full = full.sort_values(["user_id", "ts", "__side"], kind="mergesort")
    rv = full["value"].where(full["event_type"] == "view")
    full["latest_right"] = rv.groupby(full["user_id"]).ffill()
    want = full[full["event_type"] != "view"][
        ["user_id", "ts", "value", "latest_right"]
    ].reset_index(drop=True)
    return got, want


CELLS["tpch_q1/lineitem"] = _cell_tpch_q1_lineitem
CELLS["tpch_q6/lineitem"] = _cell_tpch_q6_lineitem
def _cell_combine_latest_stream_events(spark):
    # LIVE combine_latest over three streams: each purchase/click event
    # snapshots the latest view AND error value for its user — the
    # reference's flagship combinator at ingest time
    from streamz_spark.streaming.stateful import combine_latest_stream

    stream = _replay_ordered(spark, "events", "event_id")
    emit_mask = ~F.col("event_type").isin("view", "error")
    got = pd.concat(
        sink_to_list(
            combine_latest_stream(
                stream.filter(emit_mask),
                [
                    stream.filter(F.col("event_type") == "view"),
                    stream.filter(F.col("event_type") == "error"),
                ],
                key="user_id",
            ),
            output_mode="append",
        ),
        ignore_index=True,
    )

    full = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .toPandas()
    )
    full["__side"] = (~full["event_type"].isin(["view", "error"])).astype(int)
    full = full.sort_values(["user_id", "ts", "__side", "event_id"], kind="mergesort")
    for i, et in enumerate(["view", "error"]):
        sv = full["value"].where(full["event_type"] == et)
        full[f"latest_{i}"] = sv.groupby(full["user_id"]).ffill()
    want = full[~full["event_type"].isin(["view", "error"])][
        ["user_id", "ts", "value", "latest_0", "latest_1"]
    ].reset_index(drop=True)
    return got, want


def _cell_zip_stream_events(spark):
    # LIVE positional zip: i-th view paired with i-th click per user in
    # event-time order, buffers carried across micro-batches — equals
    # the positional pandas pairing on the full table
    from streamz_spark.streaming.stateful import zip_stream

    stream = _replay_ordered(spark, "events", "event_id")
    got = pd.concat(
        sink_to_list(
            zip_stream(
                stream.filter(F.col("event_type") == "view"),
                stream.filter(F.col("event_type") == "click"),
                key="user_id",
            ),
            output_mode="append",
        ),
        ignore_index=True,
    )

    full = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    pairs = []
    for uid, g in full.groupby("user_id"):
        lv = g.loc[g["event_type"] == "view", "value"].tolist()
        rv = g.loc[g["event_type"] == "click", "value"].tolist()
        for i in range(min(len(lv), len(rv))):
            pairs.append((uid, i, lv[i], rv[i]))
    want = pd.DataFrame(pairs, columns=["user_id", "seq", "left", "right"])
    return got, want


CELLS["zip_latest_stream/events"] = _cell_zip_latest_stream_events
CELLS["combine_latest_stream/events"] = _cell_combine_latest_stream_events
CELLS["zip_stream/events"] = _cell_zip_stream_events


def _cell_bpe_tokens_documents(spark):
    # the BPE pre-tokenizer count is per-row stateless: streaming
    # replay must be bit-identical to the batch scan
    from streamz_spark.operators.text import bpe_token_count, token_count
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: df.select(
        "doc_id", bpe_token_count("text"), token_count("text").alias("n_ws_tokens")
    )
    got = pd.concat(
        sink_to_list(shape(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))),
        ignore_index=True,
    )
    want = shape(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


def _cell_domain_mixture_documents(spark):
    # domain-mixture accounting as a complete-mode updating aggregate:
    # the final micro-batch must equal the batch computation (token
    # sums are integers — exact, no fp-reassociation slack needed)
    from streamz_spark.operators.text import token_count
    from streamz_spark.streaming.sources import replay_table

    def shape(df):
        return df.groupBy(F.col("source").alias("domain")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text")).alias("n_tokens"),
        )

    got = sink_to_list(
        shape(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")),
        output_mode="complete",
    )[-1]
    want = shape(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


CELLS["bpe_tokens/documents"] = _cell_bpe_tokens_documents
CELLS["domain_mixture/documents"] = _cell_domain_mixture_documents


def _quality_lang_filter(df):
    from streamz_spark.operators import text as t

    scored = t.language_id(t.quality_features(df, "text"), "text")
    return scored.filter(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") != "und")
    ).select("doc_id", "text")


def _cell_pretrain_pipeline_documents(spark):
    # streaming counterpart of the composed pretraining pipeline
    # (queries/extra.py pretrain_corpus_pipeline): the quality+lang-id
    # filter runs as stateless exprs ON THE STREAM, feeding the two
    # ingest-time stateful dedup detectors — streaming_minhash_neardup
    # (LSH bucket state -> candidate pairs, exact-Jaccard-verified
    # downstream exactly like the batch op's verify stage) and
    # streaming_duplicated_anchors (per-gram occurrence state ->
    # ExactSubstr anchors). Differential, replaying the corpus in
    # doc_id order:
    #
    #   ingest kept-set  (drop every doc with a verified near-dup
    #                     pair to a smaller id)
    # must equal
    #   batch kept-set   (dedup_exact + minhash pairs + CC min-id
    #                     representative — the pipeline's own stages),
    #
    # and per-doc duplicated-anchor counts must equal the batch
    # anchor relation on the same filtered corpus. The kept-set
    # equivalence holds because (a) exact duplicates have identical
    # shingle sets, so they surface as Jaccard-1.0 pairs at ingest,
    # and (b) near-dup clusters on this corpus are edge-to-min (every
    # non-representative has a DIRECT verified edge to a smaller id,
    # not just a path) — if either premise breaks on future testdata
    # this cell fails loudly rather than silently weakening.
    from streamz_spark.operators.components import dedup_clusters as dc
    from streamz_spark.operators.dedup import dedup_exact, minhash_near_duplicates
    from streamz_spark.operators.text import word_kgrams, word_shingles
    from streamz_spark.streaming.stateful import (
        streaming_duplicated_anchors,
        streaming_minhash_neardup,
    )

    span_k = 8
    # --- streaming side: two stateful queries over the ordered replay
    cand_batches = sink_to_list(
        streaming_minhash_neardup(
            _quality_lang_filter(_replay_ordered(spark, "documents", "doc_id")),
            num_perm=64, bands=16, min_est_jaccard=0.0, k=3,
        )
    )
    cand = pd.concat([b for b in cand_batches if len(b)], ignore_index=True)
    anchor_batches = sink_to_list(
        streaming_duplicated_anchors(
            _quality_lang_filter(_replay_ordered(spark, "documents", "doc_id")),
            k=span_k,
        )
    )
    anchors_s = pd.concat([b for b in anchor_batches if len(b)], ignore_index=True)

    # exact-Jaccard verify of the streamed candidates (the batch op's
    # verify stage, run once over the collected candidate set)
    filtered = _quality_lang_filter(load_table(spark, SF_DIR, "documents"))
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in filtered.select(
            "doc_id", word_shingles("text", 3).alias("sh")
        ).collect()
    }
    drop_s = set()
    for a, b in zip(cand.id_a, cand.id_b):
        sa, sb = sh.get(int(a), set()), sh.get(int(b), set())
        inter = len(sa & sb)
        if sa and sb and inter / (len(sa) + len(sb) - inter) >= 0.5:
            drop_s.add(int(b))  # id_a < id_b: keep the smaller id
    kept_s = sorted(set(sh) - drop_s)
    n_anchors_s = anchors_s.groupby("id").size().to_dict() if len(anchors_s) else {}
    got = pd.DataFrame(
        {"doc_id": kept_s,
         "n_anchors": [int(n_anchors_s.get(i, 0)) for i in kept_s]}
    )

    # --- batch side: the pipeline's own dedup stages + anchor relation
    deduped = dedup_exact(filtered)
    pairs = minhash_near_duplicates(deduped, num_perm=64, k=3, bands=16, threshold=0.5)
    fuzzy_drop = {
        r["doc_id"]
        for r in dc(deduped, pairs).filter(~F.col("keep")).select("doc_id").collect()
    }
    exact_kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    kept_b = sorted(exact_kept - fuzzy_drop)
    kgr = filtered.select(
        "doc_id", F.posexplode(word_kgrams("text", span_k)).alias("pos", "gram")
    )
    freq = kgr.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    n_anchors_b = {
        r["doc_id"]: r["n"]
        for r in kgr.join(freq.filter(F.col("cnt") >= 2), "gram")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = pd.DataFrame(
        {"doc_id": kept_b,
         "n_anchors": [int(n_anchors_b.get(i, 0)) for i in kept_b]}
    )
    return got, want


CELLS["pretrain_pipeline/documents"] = _cell_pretrain_pipeline_documents


def _cell_semdedup_embeddings(spark):
    # ingest-time SemDeDup vs the batch operator, EXACT equality: both
    # sides use the same seed centroids and the same edge-based drop
    # rule (cosine >= threshold to a lower-id same-cell vector), so
    # the streaming kept-set equals the batch keep flags regardless of
    # arrival order or cluster shape — no clique-ness premise needed
    # (unlike the minhash cell, whose batch side resolves transitive
    # clusters). The synthetic embeddings table has NO natural near
    # dups (max pairwise cosine ≈ 0.48), so every 5th vector is
    # planted back as an exact copy under a shifted id — the cell then
    # proves real drops, not a vacuous all-keep.
    import os as os2
    import tempfile as tf2

    from pyspark.sql import functions as F2

    from streamz_spark.operators.dedup import semdedup
    from streamz_spark.streaming.sources import from_directory
    from streamz_spark.streaming.stateful import streaming_semdedup

    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    planted = base.filter(F2.col("vec_id") % 5 == 0).select(
        (F2.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    emb = base.unionByName(planted)
    # seed centroids exactly as the batch op builds them
    seed_rows = (
        emb.select(F2.col("vec_id").alias("id"),
                   F2.col("embedding").cast("array<double>").alias("v"))
        .orderBy("id").limit(16).collect()
    )
    cents = [(ci, r["v"]) for ci, r in enumerate(seed_rows)]
    # ordered replay of the augmented frame in 4 contiguous id chunks
    lo, hi = emb.agg(F2.min("vec_id"), F2.max("vec_id")).first()
    span = (int(hi) - int(lo) + 4) // 4
    tmp = tf2.mkdtemp(prefix="matrix_semdedup_")
    for i in range(4):
        emb.filter(
            (F2.col("vec_id") >= int(lo) + i * span)
            & (F2.col("vec_id") < int(lo) + (i + 1) * span)
        ).coalesce(1).write.mode("overwrite").parquet(
            os2.path.join(tmp, f"chunk={i:05d}")
        )
    stream = from_directory(
        spark, os2.path.join(tmp, "chunk=*"), emb.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    pair_batches = sink_to_list(streaming_semdedup(stream, cents, threshold=0.9))
    pairs = pd.concat(
        [b for b in pair_batches if len(b)] or [pd.DataFrame({"id_b": []})],
        ignore_index=True,
    )
    drop_s = set(int(b) for b in pairs.id_b)
    assert drop_s, "planted duplicates must produce drops"
    all_ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    got = pd.DataFrame(
        {"vec_id": all_ids, "keep": [i not in drop_s for i in all_ids]}
    )
    want = (
        semdedup(emb, n_clusters=16, threshold=0.9, centroids="seed")
        .select("vec_id", "keep")
        .toPandas()
    )
    return got, want


CELLS["semdedup/embeddings"] = _cell_semdedup_embeddings


def _cell_nb_classifier_scoring_documents(spark):
    # model-apply-on-stream: a Naive Bayes quality model trained on
    # the static corpus scores the same corpus replayed as a stream
    # (stream-static broadcast model join + streaming doc-key
    # aggregate in complete mode) — the per-doc scores must be
    # IDENTICAL to the batch apply (integer micro-nat sums are
    # order/batching-independent by construction; this cell is the
    # proof that holds across the batch/stream boundary)
    from streamz_spark.operators.text import nb_quality_apply, nb_quality_train
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "__y", F.col("lang") == "en"
    )
    model = nb_quality_train(docs, "__y", vocab_limit=20)
    got = sink_to_list(
        nb_quality_apply(
            replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"), model
        ),
        output_mode="complete",
    )[-1]
    want = nb_quality_apply(docs, model).toPandas()
    return got, want


CELLS["nb_classifier_scoring/documents"] = _cell_nb_classifier_scoring_documents


def _cell_temperature_mixture_documents(spark):
    # profile-once/apply-at-ingest mixing: temperature rates computed
    # on the static corpus, applied to the same corpus replayed as a
    # stream (stream-static broadcast rate join + stateless md5-ppm
    # draw + repetition explode). The kept multiset must be IDENTICAL
    # to the batch apply — the draw depends only on the row id, so
    # micro-batching cannot move it
    from streamz_spark.operators.sampling import (
        apply_mixture_rates,
        temperature_mixture_rates,
    )
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents")
    rates = temperature_mixture_rates(docs, "lang")
    shape = lambda df: apply_mixture_rates(
        df, rates, "lang", repeat=True
    ).select("doc_id", "lang", "rate_ppm", "copy_idx")
    got = pd.concat(
        sink_to_list(shape(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))),
        ignore_index=True,
    )
    want = shape(docs).toPandas()
    return got, want


CELLS["temperature_mixture/documents"] = _cell_temperature_mixture_documents


def _cell_bpe_meter_documents(spark):
    # batch-trained tokenizer metering a stream: merges learned on the
    # static corpus, the replayed corpus metered at ingest. The
    # streaming shape skips the (doc, word) pre-aggregate (one
    # stateful aggregate per streaming query) — explode, stream-static
    # broadcast segmentation join, per-doc sum in complete mode. Piece
    # counts are integers summed per doc, so batching cannot move them
    from streamz_spark.operators.text import BPE_PRETOKEN_PATTERN
    from streamz_spark.operators.tokenizer import (
        bpe_learned_token_meter,
        bpe_segment_types,
        bpe_train,
    )
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe_train(docs, num_merges=16)
    seg = bpe_segment_types(
        docs.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_PATTERN), 0)
            ).alias("word")
        ).distinct(),
        merges,
    ).select("word", "n_pieces")

    stream = replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")
    toks = stream.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_PATTERN), 0)
        ).alias("word"),
    )
    got = sink_to_list(
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        ),
        output_mode="complete",
    )[-1]
    want = bpe_learned_token_meter(docs, merges).toPandas()
    return got, want


CELLS["bpe_meter/documents"] = _cell_bpe_meter_documents





def _cell_incremental_dedup_documents(spark):
    # the daily-crawl mode AS A STREAM: the historical index is a
    # static relation (fingerprints + shingles + banded signatures —
    # production's stored index artifact), today's ingest is replayed
    # as micro-batches, and every screen is a stream-static join:
    # exact = left join on the normalized fingerprint, fuzzy = LSH
    # band-bucket left join + exact-Jaccard verify, per-doc max flags
    # in complete mode. Kept-set must equal batch incremental_dedup.
    from streamz_spark.operators.dedup import (
        _minhash_signatures_from_shingles,
        incremental_dedup,
    )
    from streamz_spark.operators.text import fingerprint, word_shingles
    from streamz_spark.streaming.sources import replay_table

    NUM_PERM, BANDS, RPB = 64, 16, 4
    docs = load_table(spark, SF_DIR, "documents")
    inc_b = docs.where(F.col("doc_id") % 10 < 2)
    idx = docs.where(F.col("doc_id") % 10 >= 2)
    want = (
        incremental_dedup(inc_b, idx, num_perm=NUM_PERM, bands=BANDS)
        .select("doc_id")
        .toPandas()
    )

    # static index artifacts
    idx_fp = idx.select(fingerprint("text", "fp")).distinct()
    sh_idx = idx.select(
        F.col("doc_id").alias("id"), word_shingles("text", 3).alias("sh")
    ).where(F.size("sh") > 0)
    band_idx = (
        _minhash_signatures_from_shingles(sh_idx, NUM_PERM)
        .select(
            F.col("id").alias("idx_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at("signature", b * RPB + r + 1)
                                    for r in range(RPB)
                                ]
                            ).alias("bhash"),
                        )
                        for b in range(BANDS)
                    ]
                )
            ).alias("bh"),
        )
        .select("idx_id", "bh.band", "bh.bhash")
    )
    sh_idx_named = sh_idx.select(
        F.col("id").alias("idx_id"), F.col("sh").alias("sh_x")
    )

    stream = replay_table(spark, SF_DIR, "documents", chunk_col="doc_id").where(
        F.col("doc_id") % 10 < 2
    )
    s = stream.select(
        "doc_id", fingerprint("text", "fp"), word_shingles("text", 3).alias("sh")
    )
    # exact screen: stream-static left join on the fingerprint
    s = s.join(idx_fp.withColumn("ex", F.lit(1)), "fp", "left")
    # per-row narrow signature (two selects — same two-stage hash shape
    # as the batch operator), empty-shingle docs get an empty band array
    s = s.select(
        "doc_id", "ex", "sh",
        F.transform("sh", lambda x: F.xxhash64(x)).alias("hs"),
    ).select(
        "doc_id", "ex", "sh",
        F.when(
            F.size("sh") > 0,
            F.array(
                *[
                    F.array_min(
                        F.transform("hs", lambda h: F.xxhash64(h, F.lit(i)))
                    )
                    for i in range(NUM_PERM)
                ]
            ),
        ).alias("signature"),
    )
    banded = s.select(
        "doc_id", "ex", "sh",
        F.explode_outer(
            F.when(
                F.col("signature").isNotNull(),
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at("signature", b * RPB + r + 1)
                                    for r in range(RPB)
                                ]
                            ).alias("bhash"),
                        )
                        for b in range(BANDS)
                    ]
                ),
            )
        ).alias("bh"),
    ).select("doc_id", "ex", "sh", F.col("bh.band").alias("band"), F.col("bh.bhash").alias("bhash"))
    ver = (
        banded.join(band_idx, ["band", "bhash"], "left")
        .join(sh_idx_named, "idx_id", "left")
        .withColumn(
            "fz",
            F.when(
                F.col("sh_x").isNotNull()
                & (
                    F.size(F.array_intersect("sh", "sh_x"))
                    / (
                        F.size("sh")
                        + F.size("sh_x")
                        - F.size(F.array_intersect("sh", "sh_x"))
                    )
                    >= 0.5
                ),
                F.lit(1),
            ),
        )
    )
    flags = ver.groupBy("doc_id").agg(
        F.max("ex").alias("ex"), F.max("fz").alias("fz")
    )
    got_flags = sink_to_list(flags, output_mode="complete")[-1]
    kept = got_flags[got_flags["ex"].isna() & got_flags["fz"].isna()][["doc_id"]]
    return kept.reset_index(drop=True), want


CELLS["incremental_dedup/documents"] = _cell_incremental_dedup_documents



def _cell_topk_similarity_embeddings(spark):
    # ingest-time exact top-k similarity with BOUNDED per-query state:
    # cosine scoring runs JVM-side in a stream-static broadcast join,
    # the keyed state holds exactly k (id, score) pairs per query. The
    # last emitted top-k per query must equal the batch brute-force
    # operator (same cosine expression, same deterministic tie-break).
    from streamz_spark.operators.similarity import brute_force_topk
    from streamz_spark.streaming.sources import replay_table
    from streamz_spark.streaming.stateful import streaming_topk_similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    want = brute_force_topk(emb, queries, k=5).toPandas()

    stream = replay_table(spark, SF_DIR, "embeddings", chunk_col="vec_id")
    batches = sink_to_list(
        streaming_topk_similarity(stream, queries, k=5), output_mode="update"
    )
    allb = pd.concat(
        [b.assign(__b=i) for i, b in enumerate(batches) if len(b)],
        ignore_index=True,
    )
    got = (
        allb[allb.groupby("qid")["__b"].transform("max") == allb["__b"]]
        .drop(columns="__b")
        .reset_index(drop=True)
    )
    return got, want


CELLS["topk_similarity/embeddings"] = _cell_topk_similarity_embeddings



def _cell_stupid_backoff_documents(spark):
    # CCNet deployment shape: the stupid-backoff LM is TRAINED on the
    # static reference corpus, then SCORES the corpus replayed as a
    # stream — every scoring join is stream-static (broadcast LM
    # tables), the per-doc total is a complete-mode aggregate. Integer
    # micro-nat floors make streaming == batch an exact integer
    # comparison regardless of batching.
    from streamz_spark.operators.text import (
        stupid_backoff_nll_quality,
        stupid_backoff_score,
        stupid_backoff_tables,
    )
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents")
    want = stupid_backoff_nll_quality(
        docs, vocab_limit=50, bigram_limit=500
    ).toPandas()

    lm1, lm2, scalars, j1, j2 = stupid_backoff_tables(
        docs, vocab_limit=50, bigram_limit=500
    )
    stream = replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")
    got = sink_to_list(
        stupid_backoff_score(stream, lm1, lm2, scalars, join1=j1, join2=j2),
        output_mode="complete",
    )[-1]
    return got, want


CELLS["stupid_backoff/documents"] = _cell_stupid_backoff_documents



def _cell_media_features_documents(spark):
    # multimodal Arrow-batched featurization AT INGEST: attach the
    # binary media column, run the mapInPandas featurizer on the
    # stream (stateless — append mode), fold the feature vector
    # JVM-side. Batch and stream must agree bit-exactly (digest-derived
    # features, left-to-right fold).
    from streamz_spark.operators import multimodal as mm
    from streamz_spark.streaming.sources import replay_table

    proj = lambda df: mm.extract_features(
        mm.attach_media(df, "text"), dim=8
    ).select(
        "doc_id",
        F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias(
            "feature_sum"
        ),
        F.size("feature").alias("dim"),
    )
    got = pd.concat(
        sink_to_list(
            proj(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))
        ),
        ignore_index=True,
    )
    want = proj(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


CELLS["media_features/documents"] = _cell_media_features_documents



def _cell_dedup_paragraphs_documents(spark):
    # ingest-time paragraph dedup: paragraphs explode narrowly on the
    # stream, keyed state on the paragraph fingerprint implements the
    # corpus-wide FIRST-occurrence rule (arrival order = doc_id order
    # via contiguous-range replay; within a batch the state fn sorts by
    # (doc_id, pidx)). Reassembled per-doc output must equal the batch
    # operator row for row.
    from streamz_spark.operators.dedup import dedup_paragraphs
    from streamz_spark.operators.text import fingerprint, tokenize
    from streamz_spark.streaming.stateful import accumulate

    WINDOW = 20
    docs = load_table(spark, SF_DIR, "documents")
    want = dedup_paragraphs(docs, window=WINDOW).toPandas()

    stream = _replay_ordered(spark, "documents", "doc_id")
    toks = tokenize("text")
    paras = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1, F.lit(WINDOW)),
            lambda s: F.array_join(F.slice(toks, s + 1, WINDOW), " "),
        ),
    )
    ex = stream.select(
        "doc_id", F.posexplode(paras).alias("pidx", "ptext")
    ).withColumn("fp", fingerprint("ptext", "fp"))

    def step(state, pdf):
        seen = bool(state[0]) if state else False
        pdf = pdf.sort_values(["doc_id", "pidx"])
        kept = []
        for _ in range(len(pdf)):
            kept.append(not seen)
            seen = True
        out = pdf.assign(kept=kept)[["doc_id", "pidx", "ptext", "kept"]]
        return (True,), out

    emitted = sink_to_list(
        accumulate(
            ex.select("fp", "doc_id", "pidx", "ptext"),
            ["fp"],
            step,
            state_schema="seen boolean",
            output_schema="doc_id long, pidx int, ptext string, kept boolean",
            output_mode="append",
        ),
        output_mode="append",
    )
    allp = pd.concat([b for b in emitted if len(b)], ignore_index=True)
    got = (
        allp.sort_values(["doc_id", "pidx"])
        .groupby("doc_id")
        .apply(
            lambda g: pd.Series(
                {
                    "text_deduped": " ".join(g[g["kept"]]["ptext"]),
                    "n_paras": len(g),
                    "n_paras_dropped": int((~g["kept"]).sum()),
                }
            ),
            include_groups=False,
        )
        .reset_index()
    )
    got["n_paras"] = got["n_paras"].astype("int64")
    got["n_paras_dropped"] = got["n_paras_dropped"].astype("int64")
    return got, want


CELLS["dedup_paragraphs/documents"] = _cell_dedup_paragraphs_documents


def _cell_perplexity_bucket_documents(spark):
    # CCNet deployment shape: the LM and the per-language tercile cut
    # thresholds derive from the static reference corpus; the stream
    # scores each doc (stream-static LM join, complete-mode per-doc
    # aggregate) and classifies against the cuts as a LITERAL-map
    # projection after the aggregate — no stream-side sort, no ntile,
    # no post-aggregate join. Integer micro-nat scores make streaming
    # == batch an exact comparison regardless of batching.
    from streamz_spark.operators.text import (
        perplexity_buckets,
        perplexity_cut_table,
        unigram_lm_tables,
        unigram_nll_score,
    )
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents")
    want = perplexity_buckets(docs, vocab_limit=20).toPandas()

    lm, scalars, _join = unigram_lm_tables(docs, vocab_limit=20)
    batch_scored = unigram_nll_score(docs, lm, scalars).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    cut_rows = perplexity_cut_table(batch_scored).collect()
    p33 = F.create_map(
        *[x for r in cut_rows for x in (F.lit(r["lang"]), F.lit(r["p33"]))]
    )
    p66 = F.create_map(
        *[x for r in cut_rows for x in (F.lit(r["lang"]), F.lit(r["p66"]))]
    )

    stream = replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")
    # ride the language through the per-doc aggregate inside the key
    sid = stream.withColumn("__id", F.struct("doc_id", "lang"))
    scored = unigram_nll_score(sid, lm, scalars, id_col="__id")
    lang = F.col("__id").getField("lang")
    nll = F.col("nll_mean_micro")
    classified = scored.select(
        F.col("__id").getField("doc_id").alias("doc_id"),
        lang.alias("lang"),
        "n_tokens",
        "nll_mean_micro",
        F.when(nll <= F.element_at(p33, lang), F.lit("head"))
        .when(nll <= F.element_at(p66, lang), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        (nll <= F.element_at(p66, lang)).alias("kept"),
    )
    got = sink_to_list(classified, output_mode="complete")[-1]
    return got, want


CELLS["perplexity_bucket/documents"] = _cell_perplexity_bucket_documents


def _cell_heavy_hitters_events(spark):
    # ingest-time Misra-Gries sketch (bounded per-shard state) feeding
    # the offline verify pass — the deployment split of the batch
    # heavy_hitter_keys entry: the streamed candidate set must cover
    # every true heavy hitter, so verify(candidates) == batch exact
    from streamz_spark.queries.extra import _HH_K, _HH_KEY, EXTRA_REGISTRY
    from streamz_spark.streaming.stateful import streaming_heavy_hitters

    shards = 4
    stream = _replay_ordered(spark, "events", "event_id").select(
        F.expr(_HH_KEY).alias("key")
    )
    emits = sink_to_list(
        streaming_heavy_hitters(stream, "key", k=_HH_K, shards=shards),
        output_mode="update",
    )
    allb = pd.concat(
        [b.assign(__b=i) for i, b in enumerate(emits) if len(b)],
        ignore_index=True,
    )
    final = allb.sort_values("__b").groupby("shard", as_index=False).last()
    cand = sorted({int(x) for keys in final["keys"] for x in keys})
    # the bounded-state claim IS the point: candidates never exceed
    # shards·k no matter how many batches streamed
    assert len(cand) <= shards * _HH_K, len(cand)

    ev = load_table(spark, SF_DIR, "events").select(F.expr(_HH_KEY).alias("key"))
    n = ev.count()
    got = (
        ev.filter(F.col("key").isin(cand))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * _HH_K > F.lit(n))
        .toPandas()
    )
    want = EXTRA_REGISTRY["heavy_hitter_keys"].fn(spark, SF_DIR).toPandas()
    return got, want


CELLS["heavy_hitters/events"] = _cell_heavy_hitters_events


def _cell_stream_stream_join_events(spark):
    # NATIVE watermarked stream-stream interval join (Spark's own
    # state-backed join, not a custom stateful op): every view joined
    # to the same user's clicks within the following 30 minutes. The
    # reference cannot express this at all (its zip/combine_latest
    # family has no time-interval semantics); batch twin is the plain
    # range join.
    # watermarks need TIMESTAMP (tz) — the table carries TIMESTAMP_NTZ
    stream = _replay_ordered(spark, "events", "event_id").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("value").alias("v_val"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_val"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND c_ts >= v_ts "
            "AND c_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
    ).select("v_user", "v_ts", "c_ts", "v_val", "c_val")
    got = pd.concat(
        sink_to_list(joined, output_mode="append"), ignore_index=True
    )

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    bv = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_val"),
    )
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_val"),
    )
    want = (
        bv.join(
            bc,
            F.expr(
                "v_user = c_user AND c_ts >= v_ts "
                "AND c_ts <= v_ts + INTERVAL 30 MINUTES"
            ),
        )
        .select("v_user", "v_ts", "c_ts", "v_val", "c_val")
        .toPandas()
    )
    return got, want


CELLS["stream_stream_join/events"] = _cell_stream_stream_join_events


def _cell_c4_clean_documents(spark):
    # C4 line-level cleaning (Raffel et al. 2020 §2.2) is per-row
    # stateless — pure narrow string expressions — so applying it at
    # ingest time over replayed chunks must be bit-identical to the
    # batch scan (C4's map-only cleaning phase run as a stream)
    from streamz_spark.operators.quality import c4_clean
    from streamz_spark.queries.extra import _c4_line_docs
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: c4_clean(_c4_line_docs(df)).select(
        "doc_id", "lines_total", "lines_kept", "text_clean", "kept"
    )
    got = pd.concat(
        sink_to_list(shape(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id"))),
        ignore_index=True,
    )
    want = shape(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


CELLS["c4_clean/documents"] = _cell_c4_clean_documents


def _cell_quality_funnel_documents(spark):
    # the attrition funnel as an ingest-time monitor: the cumulative
    # stage flags are per-row stateless, the totals a complete-mode
    # streaming aggregate — the final micro-batch's funnel must equal
    # the batch report (all-integer, exact)
    from streamz_spark.operators.quality import (
        default_quality_stages,
        quality_funnel,
    )
    from streamz_spark.streaming.sources import replay_table

    shape = lambda df: quality_funnel(df, default_quality_stages())
    got = sink_to_list(
        shape(replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")),
        output_mode="complete",
    )[-1]
    want = shape(load_table(spark, SF_DIR, "documents")).toPandas()
    return got, want


CELLS["quality_funnel/documents"] = _cell_quality_funnel_documents


def _cell_contamination_spans_documents(spark):
    # targeted decontamination at ingest: the pure-expression inline
    # form (benchmark gram hashes as a literal, per-row islands fold)
    # over replayed chunks must equal the BATCH relational operator —
    # two independent implementations of the same contract
    from streamz_spark.operators.contamination import (
        contamination_spans,
        contamination_spans_inline,
    )
    from streamz_spark.operators.text import word_kgrams
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    gh = [
        r["gh"]
        for r in bench.select(F.explode(word_kgrams("text", 7)).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .collect()
    ]
    stream = replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")
    got = pd.concat(
        sink_to_list(contamination_spans_inline(stream, gh, k=7)),
        ignore_index=True,
    )
    want = contamination_spans(docs, bench, k=7).toPandas()
    return got, want


CELLS["contamination_spans/documents"] = _cell_contamination_spans_documents


def _cell_decontaminate_documents(spark):
    # fully-stateless ingest-time decontamination: in-row span fold +
    # in-row cut over replayed chunks must equal the BATCH two-step
    # (relational spans + join-back cut_spans) projected to the same
    # columns — again two independent implementations of one contract
    from streamz_spark.operators.contamination import (
        contamination_spans,
        decontaminate_inline,
    )
    from streamz_spark.operators.dedup import cut_spans
    from streamz_spark.operators.text import word_kgrams
    from streamz_spark.streaming.sources import replay_table

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    gh = [
        r["gh"]
        for r in bench.select(F.explode(word_kgrams("text", 7)).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .collect()
    ]
    stream = replay_table(spark, SF_DIR, "documents", chunk_col="doc_id")
    got = pd.concat(
        sink_to_list(decontaminate_inline(stream, gh, k=7)),
        ignore_index=True,
    )
    want = cut_spans(docs, contamination_spans(docs, bench, k=7)).select(
        "doc_id", "text_deduped", "n_tokens_removed"
    ).toPandas()
    return got, want


CELLS["decontaminate/documents"] = _cell_decontaminate_documents


# parametrized LAST so late-registered cells are included
@pytest.mark.parametrize("cell", sorted(CELLS))
def test_stream_batch_cell(cell, spark):
    got, want = CELLS[cell](spark)
    _assert_frames_match(got, want, cell)
