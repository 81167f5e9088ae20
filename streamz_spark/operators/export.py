"""Training-data export operators: deterministic global shuffle and
token-budget sequence packing. (Splits and sampling live in
:mod:`streamz_spark.operators.sampling`.)

Scale design: no global sort barriers and no driver-side state. The
shuffle and split are pure hash expressions (narrow or one exchange);
packing is a per-shard sequential pass (``repartition(shards) +
mapInPandas`` — the measured-cheaper shape vs per-group
applyInPandas, see operators/windows.py ewm notes), so a 100 TB corpus
packs in one shuffle with shards sized by ``num_shards``.

No reference equivalent (streamz leaves corpus export to user code);
semantics defined here and tested in tests/test_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = [
    "deterministic_shuffle",
    "pack_sequences",
    "chunk_documents",
    "corpus_data_card",
    "corpus_diff",
    "write_partitioned_corpus",
]


def corpus_data_card(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    p50: str = "exact",
    p50_accuracy: int = 10_000,
) -> DataFrame:
    """Per-source corpus profile (the "data card" a pretraining team
    publishes): doc/token/char totals, median tokens-per-doc, mean word
    length (integer micro units — associative sums, no float-order
    exposure), language count and the dominant language with a
    DETERMINISTIC tie-break (docs desc, lang asc).

    Shape: one narrow per-doc projection feeds a (source, lang)
    map-side-combinable aggregate; every source-level stat except the
    median derives from that tiny table. The median has two arms:

    - ``p50="exact"``: ``F.percentile`` — exact interpolated median
      (matches ``quantile_cont``, the DuckDB-oracle arm). Its partial
      aggregation buffer is the FULL per-group value list, so the
      source-key exchange still carries one value per document.
    - ``p50="sketch"``: ``F.percentile_approx`` — the mergeable KLL-
      style sketch (Spark's ApproximatePercentile; rank error bounded
      by ``1/p50_accuracy``). The map-side partial is a BOUNDED sketch,
      so the exchange carries |sources| × sketch bytes regardless of
      corpus size — the 100 TB arm. Tolerance differential vs the
      exact arm + plan contract in tests/test_quality.py.

    All joins are source-cardinality broadcasts.
    """
    from pyspark.sql import Window

    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.text import token_count

    if p50 not in ("exact", "sketch"):
        raise ValueError(f"p50 must be 'exact' or 'sketch', got {p50!r}")
    docs = ensure_scan_parallelism(docs)
    perdoc = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        token_count(text_col).alias("n_tok"),
        F.length(text_col).cast("long").alias("n_ch"),
        (
            F.length(text_col).cast("double")
            - F.length(F.regexp_replace(text_col, r"[^ \t\n]", "")).cast("double")
        ).alias("spaces"),
    ).withColumn(
        "mwl_micro",
        F.floor(
            F.when(
                F.col("n_tok") > 0,
                (F.col("n_ch").cast("double") - F.col("spaces"))
                / F.col("n_tok").cast("double"),
            ).otherwise(F.lit(0.0))
            * 1000000.0
        ).cast("long"),
    )
    # perdoc feeds TWO corpus-wide aggregates ((source,lang) stats and
    # the per-source percentile) whose branches the planner keeps as
    # separate subtrees — without a barrier the per-doc text processing
    # (tokenize split + the regexp_replace space count, the operator's
    # entire CPU cost) evaluates once per branch (3 parquet scans in
    # the pre-fix plan: slc→src, slc→top, pctl). perdoc is a ~40-byte
    # narrow row per doc, so materializing it once is far cheaper than
    # re-deriving it from full text per consumer — the standard
    # persist-vs-rescan call, same barrier rationale as
    # dsir_importance_resample / perplexity_buckets.
    perdoc = perdoc.localCheckpoint(eager=False)
    slc = perdoc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tok").alias("tok"),
        F.sum("n_ch").alias("ch"),
        F.sum("mwl_micro").alias("mwl"),
    )
    src = slc.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("n_tokens"),
        F.sum("ch").cast("long").alias("n_chars"),
        F.sum("mwl").cast("long").alias("mwl_sum"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    top = (
        slc.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("n").desc(), F.col("lang").asc()
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("n").cast("long").alias("top_lang_docs"),
        )
    )
    if p50 == "exact":
        p50_agg = F.percentile("n_tok", F.lit(0.5))
    else:
        p50_agg = F.percentile_approx(
            "n_tok", F.lit(0.5), F.lit(p50_accuracy)
        ).cast("double")
    pctl = perdoc.groupBy("source").agg(p50_agg.alias("tokens_per_doc_p50"))
    return (
        src.join(F.broadcast(top), "source")
        .join(F.broadcast(pctl), "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            (
                F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
            ).alias("tokens_per_doc_mean"),
            "tokens_per_doc_p50",
            F.expr("mwl_sum div n_docs").cast("long").alias("mean_word_len_micro"),
            "n_langs",
            "top_lang",
            "top_lang_docs",
        )
    )


def corpus_diff(
    old: "DataFrame",
    new: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Version diff between two corpus snapshots — the audit a team
    runs when a dataset release changes: per document id, whether it
    was ``added`` (only in new), ``removed`` (only in old),
    ``changed`` (present in both, normalized fingerprint differs) or
    ``unchanged``. Output: ``(id_col, status, fp_old, fp_new)``.

    One full-outer join on the id key — both sides reduced to
    (id, fingerprint) 2-column projections first, so the shuffle moves
    32-byte digests, not document bodies. Deterministic end to end
    (md5 fingerprints), so the whole diff is SQL-oracle-checkable.
    Pair with a ``status <> 'unchanged'`` filter + broadcast of the
    (usually tiny) changed-id set to pull full rows for inspection
    without ever shuffling text.
    """
    from streamz_spark.operators.text import fingerprint

    o = old.select(F.col(id_col).alias("id"), fingerprint(text_col, "fp_old"))
    n = new.select(F.col(id_col).alias("id"), fingerprint(text_col, "fp_new"))
    return (
        o.join(n, "id", "full_outer")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("fp_old").isNull(), F.lit("added"))
            .when(F.col("fp_new").isNull(), F.lit("removed"))
            .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
            "fp_old",
            "fp_new",
        )
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Reproducible pseudo-random global order for training export.

    Hash-partition on xxhash64(id, seed) then sort *within* partitions
    by the same hash — a total order (partition index × intra-partition
    rank) without a global range-sort barrier: one exchange, no
    driver-side sampling pass, identical layout for identical
    (data, seed) regardless of input partitioning. Writing the result
    partition-by-partition yields the canonical shuffled corpus.
    """
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        df.withColumn("__h", h)
        .repartition(int(parts), F.col("__h"))
        .sortWithinPartitions("__h", id_col)
        .drop("__h")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    num_shards: int | None = None,
) -> DataFrame:
    """Greedy next-fit packing of documents into fixed token-budget
    training sequences.

    Documents are hash-sharded (one exchange), each shard is sorted by
    (token_count desc, id) and packed next-fit in a single sequential
    pandas pass; pack ids are globalized as shard*2^40 + local index so
    no coordination is needed between shards. Deterministic for a given
    (data, num_shards). Documents longer than the budget get a
    singleton pack (callers chunk them upstream if needed).

    Output: (id, n_tokens, pack_id, pack_tokens) with one row per input
    document; pack_tokens is the filled total of that document's pack —
    Σ pack_tokens/ (n_packs × budget) is the packing efficiency.
    """
    spark = df.sparkSession
    shards = int(
        num_shards or spark.conf.get("spark.sql.shuffle.partitions")
    )
    slim = df.select(
        F.col(id_col).alias("id"), F.col(token_col).cast("long").alias("n_tokens")
    ).repartition(shards, F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)))

    schema = StructType(
        [
            StructField("id", slim.schema["id"].dataType),
            StructField("n_tokens", LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_tokens", LongType()),
        ]
    )

    def pack(iterator):
        import pandas as pd
        from pyspark import TaskContext

        shard = TaskContext.get().partitionId()
        base = shard << 40
        parts = [p for p in iterator]
        if not parts:
            return
        pdf = pd.concat(parts).sort_values(
            ["n_tokens", "id"], ascending=[False, True], ignore_index=True
        )
        pack_ids, fills = [], {}
        cur, cur_fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur_fill > 0 and cur_fill + n > budget:
                fills[cur] = cur_fill
                cur += 1
                cur_fill = 0
            pack_ids.append(base + cur)
            cur_fill += n
        fills[cur] = cur_fill
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_tokens"] = pdf["pack_id"].map(lambda p: fills[p - base]).astype("int64")
        yield pdf

    return slim.mapInPandas(pack, schema=schema)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
    out_col: str = "chunk_text",
) -> DataFrame:
    """Split long documents into training-window chunks of at most
    ``max_tokens`` tokens with ``overlap`` tokens of context carried
    between consecutive chunks — the upstream step
    :func:`pack_sequences` documents for over-budget docs, and the
    standard long-document treatment in every pretraining tokenizer
    pipeline (stride = max_tokens − overlap).

    Pure narrow transform: the token array is sliced at the stride
    positions inside one projection (sequence → transform → slice) and
    ``posexplode`` emits one row per chunk — no shuffle, no UDF, and
    the explode's output is bounded by total tokens / stride. Docs
    with no tokens produce no chunks (they carry nothing to train on).

    Output: ``(id_col, chunk_idx, n_chunk_tokens, out_col)`` with
    0-based ``chunk_idx``; every chunk except possibly the last has
    ``max_tokens`` tokens when the doc is long enough.
    """
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.text import tokenize

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    df = ensure_scan_parallelism(df)
    toks = tokenize(text_col)
    n = F.size(toks)
    # start positions: 0, stride, 2*stride, ... bounded so every chunk
    # past the first contributes at least one NEW token (a start s > 0
    # with s + overlap >= n would emit a chunk made entirely of the
    # previous chunk's overlap — redundant coverage)
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)),
            lambda s: F.slice(toks, s + 1, max_tokens),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("__c").cast("long").alias("n_chunk_tokens"),
            F.array_join("__c", " ").alias(out_col),
        )
    )


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_by: "tuple[str, ...] | list[str]" = ("split",),
    sort_within_by: "tuple[str, ...] | list[str] | None" = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write the corpus in a pruning-friendly layout: hive-partitioned
    on `partition_by` (read-side filters on those columns become
    PARTITION pruning — directories never opened) and optionally
    sorted within files on `sort_within_by` (read-side range filters
    on those become ROW-GROUP pruning via parquet min/max stats).

    Layout is a write-time decision that pays forever: at 100 TB a
    `split='val'` or `lang='en'` reader should touch only its
    directories, and a `doc_id BETWEEN` reader only the row groups
    whose stats overlap. The one exchange here (repartition on the
    partition columns) also prevents the classic partitionBy explosion
    — without it every input task writes one file into EVERY partition
    directory, producing tasks x partitions tiny files.

    Low-cardinality partition keys can skew that exchange (one task
    per key); pass an additional high-cardinality column in
    `partition_by`'s repartition via `sort_within_by` ordering or use
    `max_records_per_file` to re-split fat partitions at write time.
    """
    cols = [F.col(c) for c in partition_by]
    out = df.repartition(*cols)
    if sort_within_by:
        out = out.sortWithinPartitions(*partition_by, *sort_within_by)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.partitionBy(*list(partition_by)).format(fmt).save(path)
