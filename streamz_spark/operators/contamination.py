"""Benchmark-contamination detection for training corpora.

Standard LLM decontamination (public recipe: GPT-3 appendix C /
Gopher §A.1 / PaLM): a training document is contaminated when a large
fraction of its k-word shingles (k≈13 in published pipelines) also
appears in an evaluation benchmark. The reference engine has no such
operator; it's core to the 100 TB training-data story, so it ships as
a first-class op.

Scale design: both sides reduce to distinct (doc, shingle) posting
lists; the benchmark side is collapsed to a *distinct shingle set*
(typically ≪ corpus — benchmarks are MBs against TBs of corpus), so
the hit-count join is corpus-posting ⋈ benchmark-shingles on the
shingle key. AQE broadcasts the benchmark side when it fits, else it
is a balanced high-cardinality shuffle; either way the corpus is
scanned once and never self-joined. Per-doc totals ride along from
the shingling pass — no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamz_spark.operators.text import add_word_kgrams

__all__ = ["contamination_check", "contamination_spans", "contamination_spans_inline", "decontaminate_inline"]


def _bloom_bits(n_items: int, fpp: float) -> int:
    """Optimal Bloom size: m = -n·ln(p) / ln(2)^2 (standard formula)."""
    import math

    return max(64, int(-n_items * math.log(fpp) / (math.log(2.0) ** 2)))


def _bloom_prune(
    posting: DataFrame, bench: DataFrame, col: str, expected_items: int, fpp: float
) -> DataFrame:
    """Filter ``posting`` to rows whose ``col`` might be in ``bench``.

    Driver builds the bitmap from the benchmark side's xxhash64 values
    (small side by contract), Spark broadcasts it, executors probe it
    in a vectorized Arrow batch. k hash probes derive from one 64-bit
    hash via Kirsch-Mitzenmacher double hashing: idx_i = h1 + i*h2."""
    import math

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    m_bits = _bloom_bits(expected_items, fpp)
    n_hashes = max(1, round(m_bits / expected_items * math.log(2.0)))
    n_words = (m_bits + 63) // 64

    # xxhash64 returns signed longs; reinterpret as uint64 bit patterns
    hashes = np.array(
        [r["h"] for r in bench.select(F.xxhash64(col).alias("h")).collect()],
        dtype=np.int64,
    ).astype(np.uint64)
    bitmap = np.zeros(n_words, dtype=np.uint64)
    h1 = hashes % np.uint64(m_bits)
    h2 = (hashes >> np.uint64(17) | hashes << np.uint64(47)) % np.uint64(m_bits - 1) + np.uint64(1)
    for i in range(n_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bitmap, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))

    sc = posting.sparkSession.sparkContext
    b_bitmap = sc.broadcast(bitmap)
    mb, nh = m_bits, n_hashes

    @pandas_udf(BooleanType())
    def might_contain(h):
        import pandas as pd

        bm = b_bitmap.value
        hv = h.to_numpy(dtype=np.int64).astype(np.uint64)
        p1 = hv % np.uint64(mb)
        p2 = (hv >> np.uint64(17) | hv << np.uint64(47)) % np.uint64(mb - 1) + np.uint64(1)
        ok = np.ones(len(hv), dtype=bool)
        for i in range(nh):
            idx = (p1 + np.uint64(i) * p2) % np.uint64(mb)
            ok &= (bm[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(ok)

    return posting.filter(might_contain(F.xxhash64(col)))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    k: int = 13,
    threshold: float = 0.8,
    bloom_prefilter: bool = False,
    bloom_expected_items: int = 4_000_000,
    bloom_fpp: float = 0.01,
) -> DataFrame:
    """Flag training docs whose k-gram overlap with a benchmark set
    exceeds ``threshold``.

    Returns one row per doc with ≥1 shingle:
    ``(id_col, n_shingles, n_hits, overlap, contaminated)`` where
    ``overlap = n_hits / n_shingles`` over the doc's *distinct*
    shingles. Docs shorter than k words have no shingles and are
    reported with ``n_shingles = 0, overlap = 0.0`` (can't be judged —
    published pipelines fall back to exact-substring rules there).

    ``bloom_prefilter=True`` is the 100 TB path: a Bloom sketch over
    the benchmark shingle hashes (a few MB — benchmarks are MBs
    against TBs of corpus) is built once on the driver, broadcast to
    executors, and applied as a vectorized membership predicate on the
    corpus posting list BEFORE the hit join — only probable-hit
    shingles (true hits + ~fpp of the rest) ever shuffle, which at a
    1:10^6 benchmark:corpus ratio removes ~99% of the join input. The
    exact join then runs on the survivors, so results are IDENTICAL to
    the exact path (Bloom has no false negatives; false positives are
    eliminated by the verify join) — same oracle, same hashes.

    Spark's own runtime bloom filters (bloom_filter_agg/might_contain)
    are internal-only expressions in this Spark version, so the sketch
    is a numpy bitmap over JVM-computed xxhash64 values, probed in an
    Arrow-batched pandas UDF (vectorized double-hashing — the standard
    Kirsch-Mitzenmacher construction).
    """
    from streamz_spark.io import ensure_scan_parallelism

    # corpus shingling is the dominant narrow stage — fan a low-split
    # scan out to all cores first (no-op at real scale)
    docs = ensure_scan_parallelism(docs)
    bench = (
        add_word_kgrams(
            benchmark, bench_text_col or text_col, k, "__bsh", distinct=True
        )
        .select(F.explode_outer("__bsh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )
    overlap = F.when(
        F.col("n_shingles") > 0,
        F.col("n_hits") / F.col("n_shingles"),
    ).otherwise(F.lit(0.0))
    final_cols = [
        id_col,
        "n_shingles",
        "n_hits",
        overlap.alias("overlap"),
        (overlap >= threshold).alias("contaminated"),
    ]

    if bloom_prefilter:
        # bloom path (bench too big to broadcast): per-doc totals are a
        # pure PROJECTION — word_shingles emits the distinct set, so
        # n_shingles == size(array). The previous shape re-exploded the
        # corpus into a groupBy(id) count + join-back just to recover
        # that number: one corpus-wide exchange + broadcast join for a
        # value the narrow row already carries. Only probable-hit
        # posting rows (true hits + ~fpp) survive to the shuffle join.
        shingled_b = add_word_kgrams(
            docs.select(F.col(id_col), F.col(text_col)),
            text_col, k, "__sh", distinct=True,
        )
        totals = shingled_b.select(
            F.col(id_col), F.size("__sh").cast("long").alias("n_shingles")
        )
        posting = shingled_b.select(
            F.col(id_col), F.explode_outer("__sh").alias("shingle")
        ).filter(F.col("shingle").isNotNull())
        hits = (
            _bloom_prune(posting, bench, "shingle", bloom_expected_items, bloom_fpp)
            .join(bench, "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        return (
            totals.join(hits, id_col, "left")
            .fillna(0, subset=["n_hits"])
            .select(*final_cols)
        )

    # exact path: ONE shingling pass. explode_outer carries n_shingles
    # on every posting row (zero-shingle docs keep one null-shingle
    # row), the hit join is a left join against the benchmark shingle
    # set (broadcast by AQE when it fits — benchmarks are MBs against
    # TBs of corpus), and a single groupBy(id) recovers totals + hit
    # counts. The previous two-branch shape evaluated word_shingles —
    # the dominant cost — twice per corpus row.
    shingled = add_word_kgrams(
        docs.select(F.col(id_col), F.col(text_col)),
        text_col, k, "__sh", distinct=True,
    ).select(id_col, "__sh")
    posting = shingled.select(
        id_col,
        # long, matching the bloom path's count() totals dtype
        F.size("__sh").cast("long").alias("__n"),
        F.explode_outer("__sh").alias("shingle"),
    )
    marked = posting.join(
        bench.withColumn("__hit", F.lit(1)), "shingle", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.max("__n").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hits"),
        )
        .select(*final_cols)
    )


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    k: int = 8,
) -> DataFrame:
    """TARGETED decontamination — the span-level mode of Lee et al.
    (2022) applied cross-corpus: report every maximal token span of a
    training document whose k-grams all occur in the evaluation
    benchmark, so the pipeline can CUT the benchmark text and keep the
    document (`contamination_check` drops or flags whole documents;
    frontier recipes surgically remove the overlapping passage — the
    doc's unique prose is fine training data).

    Algorithm: positional k-gram anchors on the doc side (one scan,
    same anchor machinery as `dedup.duplicated_spans`), the benchmark
    side collapsed to its DISTINCT gram-hash set, a semi-join keeps
    doc anchors whose gram appears in the benchmark, then the shared
    gaps-and-islands merge (`dedup._merge_anchor_spans`) produces
    maximal spans.

    Scale shape: the benchmark is MBs against TBs of corpus (the
    `contamination_check` contract), so AQE plans the semi-join as a
    broadcast and the corpus anchors never shuffle on the gram key at
    all — the ONLY corpus exchange is the doc-key merge. Compare
    `duplicated_spans`' self-dedup, which necessarily pays the gram
    exchange; the cross-corpus asymmetry removes it.

    Output: ``(id_col, span_start, span_end, span_len, n_anchors)``
    with 0-based inclusive token positions. Feed to
    :func:`dedup.cut_spans` for the removal transform.
    """
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.dedup import _merge_anchor_spans

    bench_text_col = bench_text_col or text_col
    docs = ensure_scan_parallelism(docs)
    kg = (
        add_word_kgrams(
            docs.select(F.col(id_col).alias("id"), F.col(text_col)),
            text_col, k, "__kg",
        )
        .select("id", F.posexplode_outer("__kg").alias("pos", "gram"))
        .filter(F.col("gram").isNotNull())
        .select("id", "pos", F.xxhash64("gram").alias("gh"))
    )
    bench_gh = (
        add_word_kgrams(benchmark, bench_text_col, k, "__bkg")
        .select(F.explode_outer("__bkg").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    anchors = kg.join(bench_gh, "gh", "left_semi").select("id", "pos")
    return _merge_anchor_spans(anchors, k, id_col)


def contamination_spans_inline(
    df: DataFrame,
    bench_gh: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Streaming-native form of :func:`contamination_spans`: the
    benchmark's distinct gram-hash set rides in as a LITERAL array
    (valid by the same benchmark-is-small contract; the
    `streaming_semdedup` centroid-inlining precedent), so the whole
    span computation is per-row expressions — anchor detection, the
    gaps-and-islands merge as an `aggregate` fold over the (already
    ordered) anchor positions, and the final explode. No shuffle, no
    window, no state: runs unchanged on a stream, where the relational
    form's doc-key window cannot.

    An INDEPENDENT second implementation of the same contract —
    the matrix cell differentials it against the relational operator,
    which is a stronger check than replaying one implementation twice.

    Output schema == :func:`contamination_spans`.
    """
    bench_lit = F.array(*[F.lit(int(h)) for h in bench_gh])
    from streamz_spark.operators.text import word_kgrams

    grams = word_kgrams(text_col, k)
    # ordered anchor positions whose gram hash is in the benchmark set
    anchors = F.filter(
        F.transform(
            grams,
            lambda g, i: F.struct(
                i.cast("long").alias("pos"), F.xxhash64(g).alias("gh")
            ),
        ),
        lambda s: F.array_contains(bench_lit, s["gh"]),
    )
    positions = F.transform(anchors, lambda s: s["pos"])
    # islands fold: acc is ARRAY<STRUCT<s, last, n>>; chain while
    # pos <= last + k (k-token windows overlap or touch), else open a
    # new span — positions arrive ascending by construction
    empty = F.expr("CAST(array() AS ARRAY<STRUCT<s: BIGINT, last: BIGINT, n: BIGINT>>)")
    new_span = lambda p: F.struct(
        p.alias("s"), p.alias("last"), F.lit(1).cast("long").alias("n")
    )
    merged = lambda last, p: F.struct(
        last["s"].alias("s"), p.alias("last"), (last["n"] + 1).alias("n")
    )
    spans = F.aggregate(
        positions,
        empty,
        lambda acc, p: F.when(
            (F.size(acc) == 0)
            | (p > F.element_at(acc, -1)["last"] + F.lit(k)),
            F.concat(acc, F.array(new_span(p))),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(merged(F.element_at(acc, -1), p)),
            )
        ),
    )
    out = df.select(F.col(id_col).alias("__id"), F.explode(spans).alias("sp"))
    return out.select(
        F.col("__id").alias(id_col),
        F.col("sp.s").cast("long").alias("span_start"),
        (F.col("sp.last") + F.lit(k - 1)).cast("long").alias("span_end"),
        (F.col("sp.last") - F.col("sp.s") + F.lit(k)).cast("long").alias("span_len"),
        F.col("sp.n").cast("long").alias("n_anchors"),
    )


def decontaminate_inline(
    df: DataFrame,
    bench_gh: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Fully-stateless ingest-time decontamination: spans AND cut both
    per-row — :func:`contamination_spans_inline`'s islands fold
    produces the span list inside the row, and the cut is the same
    token-position filter `dedup.cut_spans` uses, evaluated against
    that in-row list instead of a joined-back aggregate. No shuffle,
    no join, no window, no state: a document is decontaminated the
    moment it arrives, which is exactly where a production ingest
    pipeline wants this (the benchmark set is fixed; waiting for a
    batch join-back buys nothing).

    Output: ``(id_col, out_col, n_tokens_removed)`` — row-equal to
    ``cut_spans(df, contamination_spans(df, bench))`` projected to the
    same columns (the matrix cell differentials the two paths).
    """
    from streamz_spark.operators.text import tokenize, word_kgrams

    bench_lit = F.array(*[F.lit(int(h)) for h in bench_gh])
    grams = word_kgrams(text_col, k)
    anchors = F.filter(
        F.transform(
            grams,
            lambda g, i: F.struct(
                i.cast("long").alias("pos"), F.xxhash64(g).alias("gh")
            ),
        ),
        lambda s: F.array_contains(bench_lit, s["gh"]),
    )
    positions = F.transform(anchors, lambda s: s["pos"])
    empty = F.expr(
        "CAST(array() AS ARRAY<STRUCT<s: BIGINT, last: BIGINT>>)"
    )
    spans = F.aggregate(
        positions,
        empty,
        lambda acc, p: F.when(
            (F.size(acc) == 0)
            | (p > F.element_at(acc, -1)["last"] + F.lit(k)),
            F.concat(
                acc,
                F.array(F.struct(p.alias("s"), p.alias("last"))),
            ),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        p.alias("last"),
                    )
                ),
            )
        ),
    )
    toks = tokenize(text_col)
    with_spans = df.withColumn(
        "__spans",
        F.transform(
            spans,
            lambda sp: F.struct(
                sp["s"].alias("span_start"),
                (sp["last"] + F.lit(k - 1)).alias("span_end"),
            ),
        ),
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return (
        with_spans.withColumn(
            out_col,
            F.when(F.size("__spans") == 0, F.col(text_col)).otherwise(
                F.array_join(kept, " ")
            ),
        )
        .withColumn(
            "n_tokens_removed",
            F.when(F.size("__spans") == 0, F.lit(0)).otherwise(
                F.size(toks) - F.size(kept)
            ).cast("long"),
        )
        .select(id_col, out_col, "n_tokens_removed")
    )
