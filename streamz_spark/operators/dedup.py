"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design: every variant is a bounded-fan-out candidate generation
(hash bucket / LSH band / shingle posting list) followed by an exact
verify join — never an O(n²) cross join. At 100 TB the shuffle keys
are (band_id, band_hash) / shingle / bucket, all high-cardinality, so
partitions stay balanced; hot shingles are capped by document
frequency (`max_df`) exactly like a search posting-list cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamz_spark.operators.text import add_word_kgrams, fingerprint, tokenize

__all__ = [
    "exact_duplicates",
    "dedup_exact",
    "duplicated_spans",
    "remove_duplicated_spans",
    "cut_spans",
    "dedup_paragraphs",
    "fuzzy_levenshtein_pairs",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "plan_lsh_params",
    "dedup_index_artifacts",
    "incremental_dedup",
    "simhash",
    "md5_hash60",
    "embedding_near_duplicates",
    "semdedup",
]


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_group: int = 2,
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint →
    groupBy → keep groups with ≥ ``min_group`` members (default: only
    true duplicate groups; ``min_group=1`` returns every group — the
    dedup transform's kept representatives). One shuffle on the md5 key.
    """
    fp = df.select(F.col(id_col), fingerprint(text_col, "fp"))
    out = fp.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id")
    )
    return out.filter(F.col("n_dups") >= min_group) if min_group > 1 else out


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per fingerprint group —
    the actual dedup transform (exact_duplicates is the report).

    Shape: ONE corpus scan and ONE exchange on the md5 key, rank-1
    filter via a window (min_by over the fingerprint partition). The
    groupBy-min + join-back alternative scans the corpus twice and —
    once the min-table outgrows broadcast, i.e. at any real corpus
    size where distinct fingerprints ≈ row count — degrades to a
    sort-merge join that shuffles the full corpus a second time. The
    window's per-partition sort on (md5, id) spills gracefully and
    costs what the SMJ's sort would have cost alone.
    """
    from pyspark.sql import Window as W

    fp = df.withColumn("__fp", fingerprint(text_col, "__fp"))
    w = W.partitionBy("__fp").orderBy(id_col)
    return (
        fp.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__fp", "__rk")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cross-corpus duplicated TOKEN SPANS — the substring-level exact
    dedup mode of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (2022), approximated at k-gram
    granularity: any token span all of whose k-grams occur ≥
    ``min_count`` times corpus-wide (including within one document) is
    reported as a maximal duplicated span. Doc-level exact/minhash
    dedup misses these — boilerplate headers, license blocks, quoted
    passages shared across otherwise-distinct documents.

    Algorithm: positional k-gram anchors (``word_kgrams`` +
    posexplode) → ONE hash exchange on ``xxhash64(gram)`` → global
    occurrence count as a whole-partition window over the gram key
    (anchors whose gram repeats survive the filter) → per-doc
    gaps-and-islands interval merge (anchors at positions p₁ < p₂
    chain into one span iff p₂ ≤ p₁ + k, i.e. their k-token windows
    overlap or touch). Every token of a reported span lies in some
    repeated k-gram; spans shorter than k tokens are invisible by
    construction (the paper's suffix-array formulation has the same
    minimum-match length, typically 50 BPE tokens).

    Scale shape: NO pair expansion and NO join anywhere — a k-gram
    occurring 10⁶ times contributes 10⁶ anchor rows (linear), never
    10¹² pairs, and the corpus is scanned and k-grammed exactly once
    (a groupBy+semi-join formulation column-prunes its aggregate
    branch, defeating exchange reuse and re-scanning the corpus). The
    window's per-partition sort is a Tungsten radix sort on the int64
    key that spills gracefully, so a hot boilerplate gram is a spill,
    never an aggregation-buffer blowup; the interval merge is one
    exchange on the doc key. Total: two corpus exchanges (gram hash,
    doc key) plus the scan fan-out. The 64-bit hash key shuffles
    10-30× fewer bytes than gram text at birthday-bound collision odds
    n²/2⁶⁵ — negligible below ~10⁸ distinct grams, ~3% at 10⁹; past
    that switch the key to the gram string or concat two seeded
    xxhash64s.

    Output: ``(id_col, span_start, span_end, span_len, n_anchors)``
    with 0-based inclusive token positions.
    """
    from pyspark.sql import Window as W

    from streamz_spark.io import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    # ONE corpus pass, ONE exchange on gh, NO join: the occurrence
    # count is a whole-partition window over the gh key, so the corpus
    # is scanned and k-grammed exactly once (the groupBy+semi-join
    # formulation column-prunes its aggregate branch to gh-only, which
    # defeats exchange reuse and re-scans the corpus). WindowExec
    # sorts each partition on the 8-byte key — Tungsten radix-sorts
    # int64 prefixes and spills gracefully, so a 10⁸-occurrence hot
    # gram is a spill, never an aggregation-buffer OOM (the
    # posting-array alternative buffers the hot gram's members in one
    # reducer row). Pinned by test_duplicated_spans_plan_shape.
    kg = (
        add_word_kgrams(
            df.select(F.col(id_col).alias("id"), F.col(text_col)),
            text_col, k, "__kg",
        )
        .select("id", F.posexplode_outer("__kg").alias("pos", "gram"))
        .filter(F.col("gram").isNotNull())
        .select("id", "pos", F.xxhash64("gram").alias("gh"))
        .repartition("gh")
    )
    w_gh = W.partitionBy("gh")
    anchors = (
        kg.withColumn("cnt", F.count(F.lit(1)).over(w_gh))
        .filter(F.col("cnt") >= min_count)
        .select("id", "pos")
    )
    return _merge_anchor_spans(anchors, k, id_col)


def _merge_anchor_spans(anchors: DataFrame, k: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of ``(id, pos)`` anchor rows into maximal
    spans: anchors at p₁ < p₂ chain iff p₂ ≤ p₁ + k (their k-token
    windows overlap or touch). ONE exchange on the doc key. Shared by
    :func:`duplicated_spans` (self-dedup) and
    :func:`contamination.contamination_spans` (cross-corpus)."""
    from pyspark.sql import Window as W

    w_ord = W.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(w_ord)
    flagged = anchors.withColumn(
        "new_span",
        F.when(prev.isNull() | (F.col("pos") > prev + k), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "span_id",
        F.sum("new_span").over(
            w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        flagged.groupBy("id", "span_id")
        .agg(
            F.min("pos").alias("s"),
            F.max("pos").alias("e"),
            F.count(F.lit(1)).alias("n_anchors"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("s").cast("long").alias("span_start"),
            (F.col("e") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.col("e") - F.col("s") + F.lit(k)).cast("long").alias("span_len"),
            F.col("n_anchors").cast("long").alias("n_anchors"),
        )
    )


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Cut the token ranges of a span report (``(id_col, span_start,
    span_end, ...)`` — from :func:`duplicated_spans` or
    :func:`contamination.contamination_spans`) out of every document.

    Shape: the span report aggregates to ONE row of ranges per
    affected doc, joins back on the doc key, and the cut is a narrow
    JVM filter over the token array — no explode of the output side,
    no Python; unaffected docs pass through verbatim on the left
    join's null arm. Adds ``out_col`` + ``n_tokens_removed``."""
    from streamz_spark.operators.text import tokenize

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = tokenize(text_col)
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    out = df.join(per_doc, id_col, "left")
    return (
        out.withColumn(
            out_col,
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
                F.array_join(kept, " ")
            ),
        )
        .withColumn(
            "n_tokens_removed",
            F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(
                F.size(toks) - F.size(kept)
            ).cast("long"),
        )
        .drop("__spans")
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    out_col: str = "text_deduped",
) -> DataFrame:
    """The TRANSFORM behind :func:`duplicated_spans`: cut every
    corpus-duplicated token span out of every document (Lee et al.
    2022 remove all copies of a duplicated substring and report no
    quality loss — ownership bookkeeping to keep exactly one copy
    buys nothing for training data and costs a global argmin per
    span).

    Shape: the span report (2 corpus exchanges, no join — see
    duplicated_spans) aggregates to ONE row of span ranges per
    affected document, joins back to the corpus on the doc key, and
    the cut itself is a narrow JVM ``filter`` over the token array
    (position ∉ any [start, end]) — no explode of the output side, no
    Python. Docs with no duplicated span pass through unchanged via
    the left join's null arm. Adds ``out_col`` plus
    ``n_tokens_removed``; the original column is preserved for
    auditability.
    """
    spans = duplicated_spans(df, id_col, text_col, k=k, min_count=min_count)
    return cut_spans(df, spans, id_col, text_col, out_col)


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Paragraph-level exact dedup — the intermediate granularity
    between doc-level (:func:`dedup_exact`) and token-span-level
    (:func:`remove_duplicated_spans`): CCNet dedups at paragraph
    granularity over shard hashes and MassiveText (Gopher appendix)
    removes repeated paragraphs across documents; the reference's
    `unique` op (streamz/core.py:1121) is the same first-occurrence
    rule one element at a time. Corpora without explicit paragraph
    breaks (this testdata) use fixed ``window``-token segments — the
    same convention :func:`chunk_documents` applies to training
    windows; with real newline-delimited text, split on the break
    instead (the plan shape is identical).

    Rule: a paragraph is kept iff it is the corpus-wide FIRST
    occurrence of its (normalized) text, ordering by
    ``(id_col, paragraph index)`` — so one copy of every boilerplate
    block survives in the lowest-id document carrying it, and every
    later copy is cut from its document.

    Shape: ONE corpus scan; segmenting is a narrow
    sequence→slice→array_join projection (no UDF); then exactly TWO
    exchanges and ZERO joins — a window rank over the md5(paragraph)
    key picks first occurrences (same rank-1 single-exchange shape as
    :func:`dedup_exact`, and the same reasoning: a groupBy-min +
    join-back re-scans and re-shuffles the corpus once the min table
    outgrows broadcast), and the per-doc reassembly groupBy shuffles
    on the doc key. A boilerplate paragraph repeated 10⁶ times is 10⁶
    rows under one md5 key — a Tungsten sort spill, never a buffer
    blowup, and never a pair expansion.

    Output: one row per document with ≥1 token —
    ``(id_col, out_col, n_paras, n_paras_dropped)``; a fully
    duplicated document comes back with an empty string (callers drop
    or keep it by policy).
    """
    from pyspark.sql import Window as W

    from streamz_spark.operators.text import tokenize

    if window < 1:
        raise ValueError("window must be >= 1")
    toks = tokenize(text_col)
    # empty docs produce no paragraphs (posexplode of NULL emits no
    # rows), so they drop from the output in every engine identically
    paras = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1, F.lit(window)),
            lambda s: F.array_join(F.slice(toks, s + 1, window), " "),
        ),
    )
    ex = df.select(
        F.col(id_col), F.posexplode(paras).alias("__pidx", "__ptext")
    )
    w = W.partitionBy(fingerprint("__ptext", "__fp")).orderBy(id_col, "__pidx")
    ranked = ex.withColumn("__keep", F.row_number().over(w) == 1)
    parts = F.array_sort(
        F.collect_list(F.struct("__pidx", "__keep", "__ptext"))
    )
    return ranked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(parts, lambda s: s["__keep"]),
                lambda s: s["__ptext"],
            ),
            " ",
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(F.col("__keep"), 0).otherwise(1))
        .cast("long")
        .alias("n_paras_dropped"),
    )


def fuzzy_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: "F.Column | str",
    max_dist: int = 2,
) -> DataFrame:
    """Blocked edit-distance near-dup pairs (fuzzy record matching):
    candidate pairs come from an equi-join on a cheap caller-supplied
    blocking key, ``levenshtein`` verifies only within blocks — the
    standard O(Σ block²) shape instead of O(n²) all-pairs.

    The detail that matters at every scale: edit distance is computed
    once per DISTINCT name pair (the name domain is tiny next to the
    row count), then expanded to id pairs through broadcast joins —
    the naive row-level blocked join repeats levenshtein per row pair
    AND serializes on the few block keys (measured 47 s → ~1.6 s at
    sf0.1). Where the id side outgrows broadcast, swap the expansion
    joins to shuffle on the name key (high-cardinality, salted if a
    single name dominates).

    Output: ``(id_a, id_b, name_a, name_b, dist)`` with id_a < id_b.
    """
    blk = F.col(block) if isinstance(block, str) else block
    p = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name"),
        blk.alias("__blk"),
    )
    names = p.select("__name", "__blk").distinct()
    # the block join's probe side sets the parallelism of the Σ block²
    # levenshtein stage; after the distinct, AQE coalesces the tiny
    # name relation to one partition and the verify serializes on a
    # single core (measured: ~1.7 s single-task CPU at sf0.1). An
    # explicit round-robin fan-out is AQE-stable (user repartitions are
    # never coalesced); at scale the name relation arrives wide and
    # this adds one exchange of the (already tiny) distinct-name set.
    names = names.repartition(df.sparkSession.sparkContext.defaultParallelism)
    na = names.select(F.col("__name").alias("name_a"), F.col("__blk").alias("__blk"))
    nb = names.select(F.col("__name").alias("name_b"), F.col("__blk").alias("__blk"))
    # one row per (name_a, name_b, block): blocking is strict — a name
    # pair matches only within a shared block, and when the block is
    # not a pure function of the name the distinct() keeps the pair
    # from being emitted once per shared block
    npairs = (
        na.join(nb, "__blk")
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "__blk", "dist")
        .distinct()
    )
    a = p.select(F.col("__id").alias("id_a"), F.col("__name").alias("name_a"), "__blk")
    b = p.select(F.col("__id").alias("id_b"), F.col("__name").alias("name_b"), "__blk")
    # expansion joins carry the block key, so ids pair only inside the
    # block where their names co-occur; the id_a < id_b orientation
    # then makes each (id_a, id_b) row unique without an id-level
    # distinct (which would shuffle the full expanded relation)
    return (
        a.join(F.broadcast(npairs), ["name_a", "__blk"])
        .join(F.broadcast(b), ["name_b", "__blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    approx_keys: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle posting lists.

    explode(shingles) → ONE groupBy(shingle) into per-shingle posting
    ARRAYS → pairs expanded narrowly from each sorted array
    (transform/slice/flatten) → |A∩B| per pair → Jaccard from per-doc
    shingle counts. ``max_df`` drops ultra-common shingles so no single
    shingle key can blow up the pair fan-out at scale — with posting
    arrays it is a free ``size(ids) <= max_df`` filter.

    The previous formulation self-joined the posting list on the
    shingle STRING: the same rows shuffled twice (once per join side)
    carrying full shingle text, plus a separate count-aggregate +
    anti-join pair of shuffles for the max_df cutoff — four wide
    stages where this shape needs one. Per-shingle docs are distinct
    (word_shingles emits array_distinct), so sorted-array expansion
    reproduces the a.id < b.id join exactly.

    ``approx_keys=True`` (opt-in; default stays exact) shuffles the
    posting list on ``xxhash64(shingle)`` instead of the shingle
    string: the posting exchange carries 8-byte keys instead of
    ~(k·word) bytes of gram text — the largest remaining at-scale
    shuffle cost in the catalog (see OPTIMIZATION_r08/r09). The
    Jaccard denominators (per-doc shingle-set sizes) stay EXACT
    string-distinct counts; only ``n_common`` can drift, on a
    corpus-wide key collision merging two grams' posting lists —
    expected spurious collisions are birthday-bounded at D²/2⁶⁵ for D
    distinct corpus shingles (≈ 2.7e-8 at D=10⁶, ≈ 0.03 at 10⁹,
    certain by 10¹⁰ — past ~10⁹ distinct grams keep the exact default
    or widen the key to two seeded hashes). Self-pairs from a
    within-doc collision are filtered at the pair expansion.
    """
    # fan the scan out first: shingling is the expensive narrow stage,
    # and a single-row-group input would otherwise run it on one core
    # (no-op when the scan already has >= cores splits)
    from streamz_spark.io import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    # persist: the shingle set feeds three subtrees (sizes, posting,
    # callers' verify joins) — without it Catalyst re-tokenizes per
    # branch. The persisted relation holds the STRING arrays in both
    # modes: the columnar cache dictionary-encodes repeated gram text,
    # while random int64 hashes are incompressible (a hash-inside-the-
    # array variant blew the 100× cache past local memory and OOMed
    # the sizes broadcast build), so approx mode hashes AT the posting
    # projection below — only the exchange key narrows.
    sh = add_word_kgrams(
        df.select(F.col(id_col).alias("id"), F.col(text_col)),
        text_col, k, "sh", distinct=True,
    ).select("id", "sh").persist()
    sizes = sh.select("id", F.size("sh").alias("n_sh")).filter(F.col("n_sh") > 0)
    posting = sh.select("id", F.explode("sh").alias("shingle"))
    if approx_keys:
        # int64 posting key; sizes (the Jaccard denominators) stay
        # exact string-distinct counts — only n_common can drift, on a
        # corpus-wide key collision
        posting = posting.select("id", F.xxhash64("shingle").alias("shingle"))
    plist = (
        posting.groupBy("shingle")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_df is not None:
        plist = plist.filter(F.size("ids") <= max_df)
    plist = plist.select(F.array_sort("ids").alias("ids"))
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = plist.select(F.explode(pair_arr).alias("p"))
    if approx_keys:
        # a WITHIN-doc key collision duplicates the doc id inside one
        # posting array, which the sorted-array expansion would emit
        # as a self-pair — drop those (narrow predicate; exact mode
        # cannot produce them because per-doc shingles are distinct)
        pairs = pairs.filter(F.col("p.id_a") != F.col("p.id_b"))
    inter = (
        pairs
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a, "id_a").join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def _minhash_signatures_from_shingles(sh: DataFrame, num_perm: int) -> DataFrame:
    """Per-doc signature array: element i = min over shingles of
    xxhash64(xxhash64(shingle), seed=i). No explode, no shuffle — two
    narrow projections.

    Two-stage hash: each shingle STRING (~20-40 bytes) is hashed once
    into an int64 array in its own projection; the num_perm permutation
    hashes then re-hash 8-byte longs. The stages must stay in SEPARATE
    selects — CollapseProject keeps them apart because the base-hash
    array is non-cheap and referenced by every permutation lambda
    (higher-order lambdas defeat codegen subexpression elimination, so
    a single-projection form re-inlines the string hash into all
    num_perm lambdas — measured on the full near-dup pipeline at
    sf0.1: 5.4 s string-hash-per-permutation vs 4.1 s two-stage).
    Works on streaming frames too (no persist barrier involved).

    Measured alternatives at sf0.1 (slower, kept as notes):
    - seeded string-hash per permutation (single projection): the
      string pass dominates at num_perm× cost;
    - one base hash + affine (a*h+b) permutations as array exprs in one
      projection: re-inlined as above;
    - explode + num_perm min-aggregates over a shared hash column:
      shares the base hash but pays an extra shuffle and 64 interpreted
      agg buffers.
    """
    hs = sh.select("id", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs"))

    def perm_min(i: int):
        # NB: keep the lambda unary — F.transform passes the array index
        # to two-argument lambdas
        return F.array_min(F.transform("hs", lambda h: F.xxhash64(h, F.lit(i))))

    sig = F.array(*[perm_min(i) for i in range(num_perm)]).alias("signature")
    return hs.select("id", sig)


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, k: int = 3,
) -> DataFrame:
    """MinHash signature per document: signature element i = min over
    shingles of permutation_i(xxhash64(shingle)). One xxhash64 per
    shingle, shared by all permutations via the explode+aggregate shape
    (see _minhash_signatures_from_shingles).
    """
    from streamz_spark.io import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    sh = add_word_kgrams(
        df.select(F.col(id_col).alias("id"), F.col(text_col)).filter(
            F.size(tokenize(text_col)) >= k
        ),
        text_col, k, "sh", distinct=True,
    ).select("id", "sh")
    return _minhash_signatures_from_shingles(sh, num_perm)


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate pairs that collide in ≥1
    band. Shuffle key = (band_idx, band_hash): high cardinality, well
    balanced. Classic LSH from Broder / MMDS ch.3.
    """
    n = bands * rows_per_band
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("signature", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.bhash").alias("bhash"))
    # persist: both sides of the self-join read this subtree; without it
    # the signature job (the expensive xxhash pass) runs twice
    banded = banded.persist()
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    k: int = 3,
    bands: int | str = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: MinHash → LSH candidates → exact Jaccard
    verify on the candidate pairs only (join back to shingle sets).
    Output = verified pairs ≥ threshold; LSH only bounds the candidate
    set, the verify step makes results hash-independent up to recall.

    ``bands="auto"`` derives the banding from ``threshold`` via
    :func:`plan_lsh_params` (S-curve FP/FN optimization) instead of
    the fixed default — at the defaults (0.5, 64) the planner lands on
    the same 16 bands, so "auto" is a no-op there by construction.
    """
    if bands == "auto":
        bands, _ = plan_lsh_params(threshold, num_perm)
    rows_per_band = num_perm // bands
    # fan the scan out: shingling + the per-shingle xxhash pass is the
    # expensive narrow stage (no-op on an already-split input)
    from streamz_spark.io import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    # persist: shingles feed the signature path and both verify sides
    sh = add_word_kgrams(
        df.select(F.col(id_col).alias("id"), F.col(text_col)).filter(
            F.size(tokenize(text_col)) >= k
        ),
        text_col, k, "sh", distinct=True,
    ).select("id", "sh").persist()
    sigs = _minhash_signatures_from_shingles(sh, num_perm)
    cand = minhash_lsh_candidates(sigs, bands, rows_per_band)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _lsh_band_table(
    sigs: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bhash) from (id, signature) — classic LSH banding."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at(
                                    "signature", b * rows_per_band + r + 1
                                )
                                for r in range(rows_per_band)
                            ]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "bh.band", "bh.bhash")


def dedup_index_artifacts(
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    k: int = 3,
    bands: int | str = 16,
    threshold: float | None = None,
):
    """Build the STORED index artifact for :func:`incremental_dedup`:
    ``(fingerprints, shingles, band_table)`` — the three relations a
    production deployment persists once (parquet, partitioned on the
    join keys) and joins every incoming batch against, so the
    per-batch cost is incoming-sized instead of index-sized.

    * ``fingerprints``: 1-column normalized-md5 keys (``__fp``);
    * ``shingles``: ``(id, sh)`` distinct word k-shingle sets (the
      exact-Jaccard verify side);
    * ``band_table``: ``(id, band, bhash)`` LSH band buckets of the
      MinHash signatures.
    """
    from streamz_spark.io import ensure_scan_parallelism

    if bands == "auto":
        bands, _ = plan_lsh_params(
            threshold if threshold is not None else 0.5, num_perm
        )
    index = ensure_scan_parallelism(index)
    fp = index.select(fingerprint(text_col, "__fp"))
    sh = add_word_kgrams(
        index.select(F.col(id_col).alias("id"), F.col(text_col)).filter(
            F.size(tokenize(text_col)) >= k
        ),
        text_col, k, "sh", distinct=True,
    ).select("id", "sh")
    band_table = _lsh_band_table(
        _minhash_signatures_from_shingles(sh, num_perm), bands, num_perm // bands
    )
    return fp, sh, band_table


def incremental_dedup(
    incoming: DataFrame,
    index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    k: int = 3,
    bands: int | str = 16,
    threshold: float = 0.5,
    index_artifacts=None,
) -> DataFrame:
    """Deduplicate an ``incoming`` batch AGAINST a historical ``index``
    corpus — the daily-crawl production mode: the index is the 100 TB
    accumulated corpus, incoming is today's ingest, and the output is
    the incoming rows that survive both exact and near-dup screening
    against the index. (Duplicates *within* incoming are deliberately
    kept — self-dedup is :func:`dedup_exact` / cluster drop-lists,
    composable before or after.)

    Two screens, both asymmetric joins (never an index self-join):

    1. **Exact**: normalized-md5 fingerprint anti-join — incoming is
       dropped when its fingerprint exists in the index. Both sides
       exchange on the md5 key; the index side is a 2-column
       projection of the historical corpus.
    2. **Fuzzy**: MinHash signatures + LSH banding on BOTH sides, a
       band-bucket equi-join ``incoming_bands ⋈ index_bands`` on
       ``(band, bhash)`` — candidate fan-out is bounded by bucket
       collisions, never |incoming| × |index| — then the exact-Jaccard
       verify against index shingles drops incoming ids with any
       verified match ≥ ``threshold``.

    At 100 TB the index's banded signature table and shingle sets are
    the stored index artifact: build them ONCE with
    :func:`dedup_index_artifacts` (persist as parquet, partitioned on
    the join keys) and pass them as ``index_artifacts=(fp, shingles,
    band_table)`` — then every batch's cost is incoming-sized. Passing
    ``index`` instead derives the same artifacts lazily inside this
    call (identical results, index-sized recompute per batch). Output
    recall follows the LSH banding exactly as in
    :func:`minhash_near_duplicates`; the verify step makes every
    emitted drop exact.
    """
    from streamz_spark.io import ensure_scan_parallelism

    if (index is None) == (index_artifacts is None):
        raise ValueError("pass exactly one of index or index_artifacts")
    if bands == "auto":
        # same planner dispatch as minhash_near_duplicates — the
        # resolved banding must match the STORED artifact's if
        # index_artifacts are passed (parameters are pinned at store
        # creation; DedupIndexStore owns that invariant)
        bands, _ = plan_lsh_params(threshold, num_perm)
    rows_per_band = num_perm // bands
    incoming = ensure_scan_parallelism(incoming)
    if index_artifacts is not None:
        idx_fp, sh_idx, band_idx = index_artifacts
    else:
        idx_fp, sh_idx, band_idx = dedup_index_artifacts(
            index, id_col=id_col, text_col=text_col,
            num_perm=num_perm, k=k, bands=bands,
        )
        sh_idx = sh_idx.persist()

    # exact screen: anti-join on the normalized fingerprint
    inc_fp = incoming.withColumn("__fp", fingerprint(text_col, "__fp"))
    after_exact = inc_fp.join(idx_fp, "__fp", "left_anti").drop("__fp")

    # fuzzy screen: band join incoming x index, exact-Jaccard verify
    sh_inc = add_word_kgrams(
        incoming.select(F.col(id_col).alias("id"), F.col(text_col)).filter(
            F.size(tokenize(text_col)) >= k
        ),
        text_col, k, "sh", distinct=True,
    ).select("id", "sh").persist()
    band_inc = _lsh_band_table(
        _minhash_signatures_from_shingles(sh_inc, num_perm), bands, rows_per_band
    )
    cand = (
        band_inc.withColumnRenamed("id", "inc_id")
        .join(band_idx.withColumnRenamed("id", "idx_id"), ["band", "bhash"])
        .select("inc_id", "idx_id")
        .distinct()
    )
    fuzzy_dropped = (
        cand.join(
            sh_inc.select(F.col("id").alias("inc_id"), F.col("sh").alias("sh_i")),
            "inc_id",
        )
        .join(
            sh_idx.select(F.col("id").alias("idx_id"), F.col("sh").alias("sh_x")),
            "idx_id",
        )
        .withColumn("n_common", F.size(F.array_intersect("sh_i", "sh_x")))
        .where(
            F.col("n_common")
            / (F.size("sh_i") + F.size("sh_x") - F.col("n_common"))
            >= threshold
        )
        .select(F.col("inc_id").alias(id_col))
        .distinct()
    )
    return after_exact.join(fuzzy_dropped, id_col, "left_anti")


def md5_hash60(col) -> F.Column:
    """Deterministic 60-bit int64 hash from the md5 hex digest.

    ``conv(substr(md5(x), 1, 15), 16, 10)`` has a bit-identical DuckDB
    counterpart ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (verified),
    which makes every hash-derived pipeline (SimHash, MinHash, LSH)
    reproducible in a SQL oracle. xxhash64 stays the production default
    (single JVM intrinsic vs md5's digest + hex parse).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprint: sign-sum of per-token hash bits. Computed
    bit-plane-wise with JVM expressions: for each bit position, sum
    (+1/-1) over tokens, majority → bit. One row per doc; the only
    possible exchange is the low-split fan-out (no-op at scale).

    ``hash_fn="md5"`` switches the token hash to the DuckDB-reproducible
    md5-derived 60-bit variant (oracle-checkable); default xxhash64.
    """
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.text import tokenize

    df = ensure_scan_parallelism(df)
    toks = F.array_distinct(tokenize(text_col))
    if hash_fn == "md5":
        h = F.transform(toks, md5_hash60)
    else:
        h = F.transform(toks, lambda t: F.xxhash64(t))
    bit_exprs = []
    for i in range(bits):
        # +1 if bit i set else -1, summed over tokens
        votes = F.aggregate(
            h,
            F.lit(0),
            lambda acc, x: acc + F.when(F.shiftright(x, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_exprs.append(F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(2**i).cast("long"))
    sim = bit_exprs[0]
    for e in bit_exprs[1:]:
        sim = sim + e
    return df.select(F.col(id_col), sim.alias("simhash"))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    prefilter: str = "auto",
    broadcast_limit: int = 20_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold.

    Two-phase: a candidate prefilter, then an exact verify join that
    recomputes cosine with the deterministic sequential expression, so
    results are independent of the prefilter's summation order.

    ``prefilter="auto"`` dispatches on corpus size: up to
    ``broadcast_limit`` rows, a BLAS prefilter (the L2-normalized
    matrix broadcasts and each partition computes its block × matrixᵀ
    with numpy, margin ``threshold − 1e-6`` ≫ float noise → no false
    negatives). Beyond the limit the pairwise work grows as n², so
    candidates come from hyperplane-LSH buckets instead
    (``prefilter="lsh"``; shuffles on (table, bucket), never collects
    — approximate above the limit, like every billion-scale near-dup
    system). The 20k default is where the O(n²) sims (not the
    broadcast) start dominating — measured at 20k vectors on
    local[32]: blas 19s vs LSH 2.7s at 98.5% recall on a dup-heavy
    corpus. LSH recall tracks the collision probability
    (1−θ/π)^planes per table: strong at the 0.95 default threshold,
    weak at moderate thresholds (e.g. 0.5) — lower ``planes`` in
    lsh_buckets when hunting low-similarity pairs at scale.
    ``prefilter="none"`` is the exact expression-only self-join
    baseline (quadratic; small inputs only).
    """
    from streamz_spark.operators.similarity import cosine_expr, with_norm

    v = with_norm(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))

    if prefilter == "auto":
        prefilter = "blas" if df.count() <= broadcast_limit else "lsh"

    if prefilter == "lsh":
        from streamz_spark.operators.similarity import lsh_auto_planes, lsh_buckets

        # bucketed candidates, exact-cosine verify, id_a < id_b
        # canonical. Planes scale with the corpus (constant bucket
        # occupancy — fixed planes are quadratic in candidate volume);
        # the verify cosine is computed INSIDE the bucket self-join
        # where both vectors are collocated, and multi-table duplicate
        # pairs collapse via a groupBy over narrow (id, id, cosine)
        # tuples — re-attaching vectors to deduped id pairs through two
        # more shuffle joins moved the full vector payload per
        # CANDIDATE and dominated at 200k+ vectors (round-8 rewrite,
        # same shape as hyperplane_lsh_ann).
        dim = len(df.select(vec_col).first()[0])
        # persist: self-joined below (see hyperplane_lsh_ann)
        buckets = lsh_buckets(
            v, planes=lsh_auto_planes(v.count()), tables=8, dim=dim
        ).persist()
        a, b = buckets.alias("a"), buckets.alias("b")
        return (
            a.join(
                b,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                cosine_expr("a.v", "b.v", "a.norm", "b.norm").alias("cosine"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.max("cosine").alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    if prefilter == "none":
        a, b = v.alias("a"), v.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                cosine_expr("a.v", "b.v", "a.norm", "b.norm").alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    import numpy as np

    spark = df.sparkSession
    rows = v.select("id", "v").collect()  # matrix must broadcast (LSH path otherwise)
    ids = np.array([r["id"] for r in rows], dtype="int64")
    mat = np.array([r["v"] for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)
    margin = threshold - 1e-6

    def scan(batches):
        import pandas as pd

        all_ids, all_mat = b_ids.value, b_mat.value
        pos = {i: p for p, i in enumerate(all_ids)}
        for pdf in batches:
            block_pos = np.array([pos[i] for i in pdf["id"]], dtype="int64")
            sims = all_mat[block_pos] @ all_mat.T
            out_a, out_b = [], []
            for r, i in enumerate(pdf["id"]):
                hits = all_ids[(sims[r] >= margin) & (all_ids > i)]
                out_a.extend([i] * len(hits))
                out_b.extend(hits.tolist())
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    cand = v.select("id").mapInPandas(scan, schema="id_a long, id_b long")
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", cosine_expr("va", "vb", "na", "nb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    threshold: float = 0.9,
    seed: int = 42,
    centroids: str = "kmeans",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering the embedding space and comparing
    pairs ONLY within a cluster — the published recipe for pruning
    web-scale corpora (LAION/C4) where near-duplicates share no exact
    tokens but collapse to the same embedding neighborhood.

    Output: one row per input vector, ``(id_col, cell, keep)`` —
    ``keep = false`` for every vector whose cosine to a LOWER-id
    vector in the same cluster reaches ``threshold``. (The paper keeps
    the cluster member with the lowest centroid similarity; at dedup
    thresholds the members are interchangeable, and the min-id rule is
    deterministic and SQL-reproducible — the same keep rule as this
    engine's other dedup modes.) The dedup transform is the standard
    anti-join against ``keep = false`` rows.

    Scale shape: centroid assignment is one broadcast of the packed
    centroid array + a narrow argmin projection (NO shuffle, same
    pattern as ivf_ann); the only corpus shuffle is the self-join on
    the cell key, and per-cluster candidate work is O(cell_size²) with
    cells sized n/n_clusters (``n_clusters=None`` → ⌈√n⌉, keeping
    total verify work ~n^1.5 instead of all-pairs n²). KMeans trains
    on a bounded 100k sample (same policy as ivf_ann);
    ``centroids="seed"`` uses the n_clusters lowest-id vectors so the
    whole pipeline is reproducible in a SQL oracle.
    """
    import math

    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.similarity import cosine_expr, with_norm

    spark = df.sparkSession
    v = with_norm(
        ensure_scan_parallelism(df).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ),
        "v", "norm",
    )
    n = v.count() if (n_clusters is None or centroids != "seed") else None
    if n_clusters is None:
        n_clusters = max(4, math.ceil(math.sqrt(n)))
    if centroids == "seed":
        seed_rows = v.orderBy("id").limit(n_clusters).select("id", "v").collect()
        cent_rows = [(ci, [float(x) for x in r["v"]]) for ci, r in enumerate(seed_rows)]
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        max_train = 100_000
        train_src = (
            v.sample(fraction=min(1.0, max_train / n), seed=seed)
            if n > max_train else v
        )
        train = train_src.select("id", array_to_vector(F.col("v")).alias("features"))
        model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(train)
        cent_rows = [
            (ci, [float(x) for x in c]) for ci, c in enumerate(model.clusterCenters())
        ]
    cent_packed = F.broadcast(
        spark.createDataFrame(
            [(cent_rows,)], "cents array<struct<cell:int,cvec:array<double>>>"
        )
    )
    # nearest cell from ONE broadcast row: every centroid distance is
    # scored inside a single projection and the argmin falls out of
    # array_sort on (d2, cell) structs — no shuffle, no window
    nearest = F.element_at(
        F.array_sort(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("v"), c["cvec"], lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        ),
        1,
    )["cell"]
    # persist: both self-join sides and the final output read the
    # assigned frame; without it the centroid argmin evaluates thrice
    assigned = (
        v.crossJoin(cent_packed)
        .select("id", "v", "norm", nearest.alias("cell"))
        .persist()
    )
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("norm").alias("na"), "cell",
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("norm").alias("nb"), "cell",
    )
    drop = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_expr("va", "vb", "na", "nb") >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        assigned.join(drop.withColumn("__dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )


def plan_lsh_params(
    threshold: float,
    num_perm: int = 64,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Choose the LSH banding ``(bands, rows_per_band)`` for a target
    Jaccard ``threshold`` — the standard S-curve optimization (MMDS
    ch.3 / the datasketch parameterization, re-derived): candidate
    probability at similarity ``s`` is ``P(s) = 1 - (1 - s^r)^b``;
    pick the divisor pair of ``num_perm`` minimizing

        fp_weight * ∫₀ᵗ P(s) ds  +  fn_weight * ∫ₜ¹ (1 - P(s)) ds

    (false positives below the threshold cost verify work; false
    negatives above it cost recall — weight per deployment: crawl
    dedup usually upweights FN, candidate-budgeted pipelines FP).

    Driver-side pure math over the ≤ d(num_perm) divisor pairs — use
    it to parameterize :func:`minhash_near_duplicates`,
    :func:`dedup_index_artifacts` and the streaming near-dup state,
    which all take explicit ``bands``. Deterministic (fixed 1024-point
    midpoint quadrature), no RNG, no Spark.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_perm < 2:
        raise ValueError(f"num_perm must be >= 2, got {num_perm}")

    def _p_candidate(s: float, b: int, r: int) -> float:
        return 1.0 - (1.0 - s**r) ** b

    n_q = 1024
    best, best_err = None, None
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        fp = fn = 0.0
        # midpoint rule on [0, t] and [t, 1]
        w_lo = threshold / n_q
        w_hi = (1.0 - threshold) / n_q
        for i in range(n_q):
            s_lo = (i + 0.5) * w_lo
            s_hi = threshold + (i + 0.5) * w_hi
            fp += _p_candidate(s_lo, b, r) * w_lo
            fn += (1.0 - _p_candidate(s_hi, b, r)) * w_hi
        err = fp_weight * fp + fn_weight * fn
        if best_err is None or err < best_err:
            best, best_err = (b, r), err
    return best
