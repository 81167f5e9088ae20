"""Learned BPE tokenizer: distributed training + corpus metering.

The reference has no tokenizer at all; this implements the published
byte-pair-encoding recipe (Sennrich et al. 2016, arXiv:1508.07909, as
productionized by GPT-2's pre-tokenizer split) the way a 100 TB
pipeline has to run it:

- **The corpus-sized work is ONE distributed aggregate.** BPE training
  never needs the corpus token stream — it needs word-*type* counts
  (Sennrich §3.2 trains on a frequency dict; HuggingFace tokenizers
  does the same). So the only 100 TB-scale stage is
  pre-tokenize → explode → groupBy(word) → count: map-side
  combinable, output bounded by the number of distinct word types,
  orders of magnitude below corpus tokens.
- **Merge learning runs on the compact type table** with two arms,
  dispatched like :func:`~streamz_spark.operators.components
  .connected_components`: at or below ``driver_limit`` types the
  merges are learned in exact pure Python on the collected frequency
  dict (milliseconds; scheduling a Spark job per merge on a tiny
  table wastes minutes of latency) — above it, each merge round is a
  narrow pair-explode + one tiny groupBy + a global argmax over the
  distributed type table, with periodic localCheckpoints to stop
  lineage growth. Same merges either way (differential-tested,
  identical deterministic tie-break: highest pair count, then
  lexicographically smallest pair — UTF-8 binary order, which Spark
  string sort and Python str comparison agree on).
- **Applying the tokenizer touches Python only per word TYPE, never
  per corpus token**: :func:`bpe_segment_types` folds the learned
  merges over each distinct word once (Arrow-batched ``mapInPandas``
  over the type table); the corpus metering path is then pure JVM —
  explode the same pre-tokenizer regex, size-dispatched join against
  the (word → piece count) table, one doc-key aggregate. Identical
  plan family to the unigram-NLL scorer.

Pre-tokens come from the same lookahead-free GPT-2-style regex the
metering entry uses (``text.BPE_PRETOKEN_PATTERN``), leading spaces
included — the space-prefixed word IS the GPT-2 word unit, so no
end-of-word marker is needed.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamz_spark.operators.text import BPE_PRETOKEN_PATTERN

__all__ = [
    "bpe_train",
    "bpe_word_types",
    "bpe_segment_types",
    "bpe_learned_token_meter",
    "learn_merges",
    "apply_merges",
]

_DRIVER_TYPE_LIMIT = 2_000_000


# ------------------------------------------------------------------ pure py
def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word by replaying the learned merges in rank order —
    a left-to-right single pass per merge, exactly the operation the
    training fold performs, so train-time and apply-time segmentations
    agree by construction.
    """
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def learn_merges(
    types: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE merge learning on a (word, count) frequency dict —
    the driver arm. Deterministic: best pair = (max summed count,
    then lexicographically smallest (left, right)).
    """
    seqs: list[tuple[list[str], int]] = [(list(w), c) for w, c in types]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for syms, c in seqs:
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        left, right = best
        for idx, (syms, c) in enumerate(seqs):
            if len(syms) < 2:
                continue
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[idx] = (out, c)
    return merges


# ------------------------------------------------------------------ spark
def bpe_word_types(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """The one corpus-sized stage: distinct pre-token types with
    frequencies. Map-side-combinable groupBy on the word key;
    ``min_count`` floors away noise types (at web scale the type
    table's long tail is OCR garbage — practical BPE trainers floor
    it; 1 keeps every type, the textbook recipe).
    """
    toks = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), 0)
        ).alias("word")
    )
    out = toks.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def _merge_round_expr(syms, left: str, right: str):
    """One merge applied to a symbol array, pure Catalyst: a fold
    (``aggregate``) that either coalesces the accumulator's last
    element with the incoming symbol or appends. Left-to-right
    non-overlapping by construction — after a merge the new last
    element is ``left+right``, which can never equal ``left`` (right
    is non-empty), so a single pass cannot cascade.
    """
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == l) & (s == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _learn_merges_distributed(
    types: DataFrame, num_merges: int, checkpoint_every: int = 8
) -> list[tuple[str, str]]:
    """The >driver_limit arm: each round is a narrow adjacent-pair
    explode over the type table, one tiny (pair-key) groupBy, and a
    global argmax — then the winning merge folds into the symbol
    arrays map-side. Rounds are sequential by nature (each merge
    depends on the last); localCheckpoint every few rounds bounds the
    growing ``aggregate``-chain lineage.
    """
    t = types.select(
        F.split(F.col("word"), "").alias("syms"), F.col("count")
    )
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        n = F.size("syms")
        pairs = (
            t.filter(n >= 2)
            .select(
                "count",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("l"),
                        F.slice("syms", 2, n - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(
                F.col("p.l").alias("left"), F.col("p.r").alias("right")
            )
            .agg(F.sum("count").alias("cnt"))
        )
        best = (
            pairs.orderBy(
                F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((left, right))
        t = t.select(
            _merge_round_expr(F.col("syms"), left, right).alias("syms"),
            "count",
        )
        if (i + 1) % checkpoint_every == 0:
            t = t.localCheckpoint(eager=True)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_count: int = 1,
    mode: str = "auto",
    driver_limit: int = _DRIVER_TYPE_LIMIT,
) -> DataFrame:
    """Learn a BPE merge table from a corpus. Returns a DataFrame
    ``(rank, left, right, merged)`` — the portable ``merges.txt``
    artifact, vocab-sized, broadcastable anywhere.

    ``mode="auto"`` dispatches on the type-table size (one cheap
    count of the already-aggregated table): pure-Python exact learning
    at or below ``driver_limit`` types, distributed merge rounds
    above. Both arms produce identical merges (same counts, same
    tie-break; differential-tested).
    """
    spark = df.sparkSession
    types = bpe_word_types(df, text_col, min_count=min_count)
    if mode == "auto":
        mode = "driver" if types.count() <= driver_limit else "distributed"
    if mode == "driver":
        collected = [(r["word"], r["count"]) for r in types.collect()]
        merges = learn_merges(collected, num_merges)
    elif mode == "distributed":
        merges = _learn_merges_distributed(types, num_merges)
    else:
        raise ValueError(f"mode must be auto|driver|distributed, got {mode!r}")
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        schema="rank long, left string, right string, merged string",
    )


def bpe_segment_types(
    types: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    word_col: str = "word",
) -> DataFrame:
    """Segment each distinct word type once (Arrow-batched
    ``mapInPandas`` — Python cost is O(types), never O(corpus
    tokens)). Output: input columns + ``pieces array<string>`` +
    ``n_pieces``.
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    mlist = list(merges)
    in_schema = types.schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
        + ", pieces array<string>, n_pieces long"
    )

    def seg(batches: Iterator) -> Iterator:
        for pdf in batches:
            pieces = [apply_merges(w, mlist) for w in pdf[word_col]]
            pdf = pdf.copy()
            pdf["pieces"] = pieces
            pdf["n_pieces"] = [len(p) for p in pieces]
            yield pdf

    return types.mapInPandas(seg, schema=out_schema)


def bpe_learned_token_meter(
    df: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_join: str = "auto",
    broadcast_limit: int = 8 << 20,
) -> DataFrame:
    """Meter a corpus under a LEARNED tokenizer: per-doc subword count
    ``(id_col, n_words, n_pieces)``.

    Plan: explode the pre-tokenizer regex (narrow JVM), aggregate to
    per-doc word counts keyed by word, join the per-TYPE piece counts
    (the only Python product, O(types)), one doc-key aggregate. The
    segmentation join dispatches broadcast vs shuffle on the estimated
    type-table size like the unigram-LM join (``seg_join`` =
    auto|broadcast|shuffle). Words absent from the merge table's
    training corpus fall back to character count — every char is a
    base symbol.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), 0)
        ).alias("word"),
    )
    # pre-aggregate to (doc, word) so the seg join touches distinct
    # doc-word pairs, not every corpus token occurrence
    dw = toks.groupBy("__id", "word").agg(F.count(F.lit(1)).alias("occ"))
    types = dw.select("word").distinct()
    seg = bpe_segment_types(types, merges).select("word", "n_pieces")
    if seg_join == "auto":
        # type-table bytes ~ sum(len(word)) * small factor; a cheap
        # upper bound from the distinct count is enough to dispatch
        seg_join = (
            "broadcast"
            if types.count() * 64 <= broadcast_limit
            else "shuffle"
        )
    if seg_join == "broadcast":
        seg = F.broadcast(seg)
    elif seg_join == "shuffle":
        # explicit hint: without it Catalyst's size estimate would
        # re-broadcast the seg table and defeat the dispatch
        seg = seg.hint("shuffle_hash")
    else:
        raise ValueError(f"seg_join must be auto|broadcast|shuffle, got {seg_join!r}")
    return (
        dw.join(seg, "word", "left")
        .withColumn(
            "__pieces",
            F.coalesce(F.col("n_pieces"), F.length("word").cast("long")),
        )
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.sum("occ").cast("long").alias("n_words"),
            F.sum(F.col("occ") * F.col("__pieces")).cast("long").alias("n_pieces"),
        )
    )
