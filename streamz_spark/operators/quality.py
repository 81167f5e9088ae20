"""Repetition / quality filters and PII scrubbing for LLM corpus
cleaning (Gopher-style signals: Rae et al. 2021, "Scaling Language
Models" §A1.1; RefinedWeb follows the same family).

Everything here is narrow JVM expression work — no shuffle, no UDF —
so it runs at full codegen speed and scales embarrassingly: at 100 TB
these are the cheapest passes in the pipeline (a projection over the
scan).

Expression-design note: per the measured CollapseProject pitfall
(word_shingles docstring), no lambda body references a computed array —
run statistics come from element-bound folds over ``sort_array`` output
(state = struct carried through ``F.aggregate``), so each array is
evaluated once per row regardless of length.

No reference equivalent: streamz users do this via pandas inside
``map_partitions``; semantics are defined here and differential-tested
against pure-Python implementations in tests/test_quality.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from streamz_spark.operators.text import tokenize

__all__ = [
    "c4_clean",
    "split_lines",
    "duplicate_line_stats",
    "ngram_run_stats",
    "repetition_signals",
    "gopher_quality_filter",
    "pii_signals",
    "pii_scrub",
    "source_overlap",
    "quality_funnel",
    "default_quality_stages",
]


def split_lines(col: Column | str) -> Column:
    """Non-empty trimmed lines of a document ([] for blank text)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    return lines


def _sum_len(arr: Column) -> Column:
    """Total characters across an array of strings (element-bound fold)."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))


def duplicate_line_stats(lines: Column) -> Column:
    """struct(dup_line_frac, dup_line_char_frac) over a line array.

    dup_line_frac: fraction of line *occurrences* beyond the first of
    their value (Gopher's duplicate-line fraction). dup_line_char_frac:
    same, weighted by line length in characters.
    """
    n = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    total_chars = _sum_len(lines)
    distinct_chars = _sum_len(F.array_distinct(lines))
    frac = F.when(n > 0, (n - n_distinct) / n).otherwise(F.lit(0.0))
    char_frac = F.when(total_chars > 0, (total_chars - distinct_chars) / total_chars).otherwise(
        F.lit(0.0)
    )
    return F.struct(frac.alias("dup_line_frac"), char_frac.alias("dup_line_char_frac"))


def _word_ngrams_with_dups(toks: Column, n: int) -> Column:
    """All word n-grams (duplicates preserved — frequency matters here,
    unlike the MinHash shingle *set*). zip_with over shifted slices,
    element-bound like word_shingles."""
    m = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(toks) >= n, acc).otherwise(F.array().cast("array<string>"))


def ngram_run_stats(grams: Column) -> Column:
    """struct(top_chars, dup_chars, all_chars) for an n-gram array.

    Sorts the grams and folds run-lengths with a struct accumulator —
    one pass, lambda touches only (acc, x), so the gram array is built
    once per row. top_chars = count×len of the most frequent gram
    (ties: larger char coverage wins); dup_chars = Σ count×len over
    grams occurring more than once; all_chars = Σ count×len over all.
    """
    sorted_g = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("all"),
    )

    def step(acc, x):
        cur = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1).cast("long"))
        ln = F.length(x).cast("long")
        # when a run reaches 2, both the first and second occurrence
        # become "duplicated" chars; later occurrences add one gram each
        dup_add = (
            F.when(cur == 2, 2 * ln).when(cur > 2, ln).otherwise(F.lit(0).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            cur.alias("cur"),
            F.greatest(acc["top"], cur * ln).alias("top"),
            (acc["dup"] + dup_add).alias("dup"),
            (acc["all"] + ln).alias("all"),
        )

    st = F.aggregate(sorted_g, zero, step)
    return F.struct(
        st["top"].alias("top_chars"),
        st["dup"].alias("dup_chars"),
        st["all"].alias("all_chars"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Gopher repetition signals as columns:

    - ``dup_line_frac`` / ``dup_line_char_frac``
    - ``top_{n}gram_char_frac`` for n in top_ngram_ns — fraction of
      gram-characters covered by the single most frequent word n-gram
    - ``dup_{n}gram_char_frac`` for n in dup_ngram_ns — fraction of
      gram-characters inside word n-grams that occur more than once

    Char fractions are over total n-gram characters (the standard
    overlap-ignoring approximation), raw doubles (bit-reproducible).
    """
    t = F.col(text_col)
    ls = duplicate_line_stats(split_lines(t))
    toks = tokenize(t)
    cols = [
        ls["dup_line_frac"].alias("dup_line_frac"),
        ls["dup_line_char_frac"].alias("dup_line_char_frac"),
    ]
    for n in top_ngram_ns:
        st = ngram_run_stats(_word_ngrams_with_dups(toks, n))
        cols.append(
            F.when(st["all_chars"] > 0, st["top_chars"] / st["all_chars"])
            .otherwise(F.lit(0.0))
            .alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ngram_ns:
        st = ngram_run_stats(_word_ngrams_with_dups(toks, n))
        cols.append(
            F.when(st["all_chars"] > 0, st["dup_chars"] / st["all_chars"])
            .otherwise(F.lit(0.0))
            .alias(f"dup_{n}gram_char_frac")
        )
    return df.select("*", *cols)


# Gopher §A1.1 thresholds (document REMOVED when a signal exceeds its
# cap / falls outside its range). Word-count bounds are parameters —
# the paper's 50..100k default is tuned for web pages, not snippets.
_GOPHER_CAPS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_10gram_char_frac": 0.10,
}


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    mean_word_len_range: tuple[float, float] = (3.0, 10.0),
    keep_col: str = "keep",
) -> DataFrame:
    """Boolean ``keep`` column from the Gopher rule set: word-count and
    mean-word-length ranges plus the repetition caps. Keeps all input
    rows (filtering is the caller's `.filter(F.col("keep"))`) so the
    signal columns stay inspectable.
    """
    out = repetition_signals(df, text_col)
    toks = tokenize(F.col(text_col))
    n_words = F.size(toks)
    mean_wl = F.when(
        n_words > 0, _sum_len(toks) / n_words
    ).otherwise(F.lit(0.0))
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= mean_word_len_range[0])
        & (mean_wl <= mean_word_len_range[1])
    )
    for sig, cap in _GOPHER_CAPS.items():
        keep = keep & (F.col(sig) <= cap)
    return out.withColumn("n_words", n_words).withColumn(keep_col, keep)


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

# Conservative, backreference-free patterns (portable across Java regex
# and RE2-style engines; DuckDB-reproducible with the 'g' flag).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # optional country code + NANP-shaped 10-digit body; matches bare
    # 10-digit runs too (PII recall beats false-positive avoidance here)
    "phone": r"(\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
}


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (``n_email``/``n_ipv4``/``n_phone``)
    — regexp_count stays JVM-side; use to route documents to scrubbing
    or removal."""
    t = F.col(text_col)
    return df.select(
        "*",
        *[
            F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace PII matches with ``<EMAIL>``/``<IPV4>``/``<PHONE>``
    tokens. Order matters: emails first (an email's host part must not
    be half-eaten by the ipv4/phone patterns), then IPs, then phones.
    """
    t = F.col(text_col)
    ordered = [k for k in ("email", "ipv4", "phone") if k in kinds]
    for name in ordered:
        t = F.regexp_replace(t, PII_PATTERNS[name], f"<{name.upper()}>")
    return df.withColumn(out_col or text_col, t)


def common_shingle_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 3,
    approx_keys: bool = False,
) -> DataFrame:
    """Cross-document boilerplate signal: the fraction of a document's
    distinct k-word shingles that also occur in >= ``min_docs`` OTHER
    documents' shingle sets (CCNet/RefinedWeb-style boilerplate
    detection, generalized from lines to n-grams — this corpus has no
    line structure, and n-grams also catch templated prose).

    Returns one row per input doc: ``(id, n_shingles, n_common,
    common_frac)``. Scale shape: the posting list is shingled ONCE
    (localCheckpoint — it feeds both the document-frequency aggregate
    and the per-doc rollup), the df-aggregate is a balanced shuffle on
    the shingle key, and the join back is against only the shingles
    that cleared ``min_docs`` — boilerplate is by definition high-df,
    so that set is small and broadcasts at any corpus size.

    ``approx_keys=True`` (opt-in; default stays exact) runs the
    df-aggregate — the one corpus-sized exchange here — on
    ``xxhash64(shingle)`` instead of the gram string: 8-byte shuffle
    keys instead of ~(k·word)-byte text. A hash collision merges two
    grams' document-frequency counts, which can only push a gram OVER
    the ``min_docs`` bar (never under), inflating ``n_common`` by at
    most the collision count; expected corpus-wide collisions are
    D²/2⁶⁵ for D distinct shingles (≈ 2.7e-8 at 10⁶, ≈ 0.03 at 10⁹) —
    negligible until ~10⁹ distinct grams, keep exact past that.
    """
    from streamz_spark.operators.text import add_word_kgrams

    # shingles are distinct per doc, so per-doc totals are just the
    # posting row count (COUNT(col) skips the explode_outer null row
    # for shingle-less docs) — no second shingle expression, and no
    # materialization barrier: the posting is recomputed for the two
    # consumers (df-aggregate, rollup), which is 2x a codegen'd narrow
    # scan. (A localCheckpoint here measured ~15x SLOWER than the
    # recompute: checkpoint materialization runs the expression tree
    # outside whole-stage codegen.) Gram construction via the compiled
    # NGram path (add_word_kgrams) — bit-identical, ~2x less CPU than
    # the zip_with chain, which matters ×2 here since both consumers
    # re-run the shingling.
    from streamz_spark.io import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    grams = add_word_kgrams(
        df.select(F.col(id_col), F.col(text_col)), text_col, k, "__sh",
        distinct=True,
    )
    if approx_keys:
        # hash per-doc inside the array (narrow, re-deduped so a
        # within-doc collision cannot double-count one doc's rows in
        # either consumer); both consumers below see int64 keys
        grams = grams.withColumn(
            "__sh",
            F.array_distinct(F.transform("__sh", lambda s: F.xxhash64(s))),
        )
    posting = grams.select(
        F.col(id_col),
        F.explode_outer("__sh").alias("shingle"),
    )
    common = (
        posting.filter(F.col("shingle").isNotNull())
        .groupBy("shingle")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("shingle", F.lit(1).alias("__c"))
    )
    out = (
        posting.join(F.broadcast(common), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("shingle").cast("long").alias("n_shingles"),
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_common"),
        )
    )
    frac = F.when(
        F.col("n_shingles") > 0, F.col("n_common") / F.col("n_shingles")
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_shingles", "n_common", frac.alias("common_frac")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_lines: int = 5,
    line_badwords: tuple[str, ...] = ("javascript",),
    doc_badstrings: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4's cleaning heuristics (Raffel et al. 2020 §2.2 — the public
    Common Crawl -> C4 recipe): keep only lines that end in a terminal
    punctuation mark AND have at least `min_words_per_line` words AND
    contain none of `line_badwords`; drop any page left with fewer
    than `min_lines` kept lines, or containing any `doc_badstrings`
    (C4 uses "lorem ipsum", javascript lines, and the curly brace to
    drop boilerplate/code pages).

    Pure narrow string expressions — zero shuffle, zero UDF: at 100 TB
    this runs scan-bound inside whole-stage codegen, exactly like the
    reference recipe's map-only cleaning phase. Adds:
    `lines_kept` / `lines_total` counts, `text_clean` (kept lines
    re-joined), and the final `kept` flag. Case-insensitive matching
    mirrors C4's lowercased bad-word filtering.
    """
    lines = split_lines(F.col(text_col))
    lw = F.lower(F.col(text_col))

    def line_ok(x):
        ok = x.rlike(r"[.!?\"\u2019\u201d]$")
        ok = ok & (F.size(F.split(F.trim(x), r"\s+")) >= min_words_per_line)
        low = F.lower(x)
        for w in line_badwords:
            ok = ok & ~low.contains(w.lower())
        return ok

    kept_lines = F.filter(lines, line_ok)
    doc_ok = F.size(kept_lines) >= min_lines
    for s in doc_badstrings:
        doc_ok = doc_ok & ~lw.contains(s.lower())
    return df.select(
        "*",
        F.size(lines).cast("long").alias("lines_total"),
        F.size(kept_lines).cast("long").alias("lines_kept"),
        F.array_join(kept_lines, "\n").alias("text_clean"),
        doc_ok.alias("kept"),
    )


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 3,
    max_sources: int | None = None,
    hot_join: str = "auto",
    hot_broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Cross-source content-overlap audit: for every pair of sources,
    how many distinct word k-shingles they share, plus the overlap
    coefficient — the curation diagnostic for overlapping crawl dumps,
    mirrored sites, and syndicated content (e.g. consecutive Common
    Crawl snapshots overlap heavily; a mixing plan that treats them as
    independent double-counts that mass).

    Output: ``(source_a, source_b, shared_shingles, shingles_a,
    shingles_b, overlap_ppm)`` with ``source_a < source_b``;
    ``overlap_ppm = shared * 1e6 div min(|A|, |B|)`` — the overlap
    coefficient in integer ppm (integers only, engine-exact).

    Scale shape: ONE corpus shingling pass into a distinct
    ``(source, shingle)`` relation (the distinct is a balanced shuffle
    on the composite key), then a self-equi-join on the shingle key —
    per-shingle fan-out is bounded by (sources containing it choose
    2), i.e. by SOURCE cardinality squared, never corpus size — into a
    map-side-combinable pair groupBy. Per-source totals are a tiny
    aggregate broadcast back onto the pair rows. Sources are
    low-cardinality by definition (domains/dumps, not documents), so
    the output is |sources|² bounded.
    """
    from streamz_spark.operators.text import add_word_kgrams

    sh = (
        add_word_kgrams(
            df.select(F.col(source_col).alias("src"), F.col(text_col)),
            text_col, k, "__sh", distinct=True,
        )
        .select("src", F.explode_outer("__sh").alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
        # feeds both the per-source totals and the pair join: shingle
        # the corpus once
        .localCheckpoint(eager=False)
    )
    totals = sh.groupBy("src").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_sources is not None:
        # df-cutoff on the SOURCE frequency (the posting-list cap of
        # ngram_jaccard_pairs, lifted to sources): a shingle present
        # in more than max_sources sources is cross-source boilerplate
        # — it saturates every pair equally and contributes
        # C(sources, 2) join rows PER SHINGLE, which at 10^4 sources
        # is the fan-out that melts the self-join. Totals (the
        # overlap-coefficient denominators) are computed BEFORE the
        # cut, so the ppm stays a fraction of each source's true
        # shingle count.
        #
        # Shape (the `common_shingle_stats` pattern): aggregate the
        # SMALL high-df set — shingles in > max_sources sources — with
        # a map-side-combinable hash groupBy, then anti-join it away.
        # The earlier Window.partitionBy(s) form paid an exchange+SORT
        # over the full corpus-sized (source, shingle) relation in
        # exactly the high-fan-out regime the cut exists for.
        #
        # Anti-join dispatch (``hot_join``): the cut list is tiny by
        # construction for real boilerplate (high-df), so the default
        # path is a broadcast anti-join — no sort, no second corpus
        # shuffle. But at 100 TB with a LOW max_sources the
        # >max_sources set can reach tens of millions of rows — a
        # driver-pressure broadcast. ``"auto"`` counts the hot set
        # (forcing the shared shingling checkpoint, which every
        # downstream branch reuses) and degrades to a ``shuffle_hash``
        # anti-join past ``hot_broadcast_limit`` rows — the same
        # size-dispatch contract as ``unigram_nll_quality(lm_join=
        # "auto")`` / ``embedding_near_duplicates(prefilter="auto")``.
        if hot_join not in ("auto", "broadcast", "shuffle"):
            raise ValueError(f"hot_join must be auto|broadcast|shuffle, got {hot_join!r}")
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__nsrc"))
            .filter(F.col("__nsrc") > max_sources)
            .select("s")
        )
        mode = hot_join
        if mode == "auto":
            # checkpoint the hot set so the dispatch count and the
            # anti-join share ONE aggregate (the count also forces the
            # shared shingling checkpoint every downstream branch reuses)
            hot = hot.localCheckpoint(eager=False)
            mode = "broadcast" if hot.count() <= hot_broadcast_limit else "shuffle"
        hot_rel = F.broadcast(hot) if mode == "broadcast" else hot.hint("shuffle_hash")
        sh = sh.join(hot_rel, "s", "left_anti")
    a = sh.select(F.col("src").alias("source_a"), "s")
    b = sh.select(F.col("src").alias("source_b"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    ta = F.broadcast(totals.select(F.col("src").alias("source_a"), F.col("n_sh").alias("shingles_a")))
    tb = F.broadcast(totals.select(F.col("src").alias("source_b"), F.col("n_sh").alias("shingles_b")))
    return (
        pairs.join(ta, "source_a")
        .join(tb, "source_b")
        .withColumn(
            "overlap_ppm",
            F.expr("(shared_shingles * 1000000) div least(shingles_a, shingles_b)").cast("long"),
        )
        .select(
            "source_a", "source_b", "shared_shingles",
            "shingles_a", "shingles_b", "overlap_ppm",
        )
    )


def quality_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]],
    group_col: str | None = None,
) -> DataFrame:
    """Per-stage attrition report for a filter chain — the funnel
    table every published pipeline reports (C4/Gopher/RefinedWeb all
    publish per-rule removal rates): stage i counts documents that
    survive stages 1..i (SEQUENTIAL semantics, the order the chain
    would run), so `dropped` attributes each loss to the first rule
    that fires, exactly like the production pipeline would.

    ``stages`` is an ordered list of ``(name, boolean Column)``.
    Output: one row per stage — ``(stage_idx, stage, docs_in,
    docs_kept, dropped, drop_ppm)``, integers only (``drop_ppm =
    dropped * 1e6 div docs_in``).

    Scale shape: ONE narrow projection computes all cumulative flags,
    ONE map-side-combinable 1-row aggregate sums them, and the
    per-stage unpivot runs on that single row — no shuffle of the
    corpus, no second scan, cost identical to one boolean pass
    regardless of stage count.
    """
    if not stages:
        raise ValueError("quality_funnel requires at least one stage")
    cum = []
    acc = F.lit(True)
    for name, pred in stages:
        acc = acc & pred
        cum.append((name, acc))
    group_cols = [group_col] if group_col else []
    flagged = df.select(
        *group_cols,
        *[c.cast("long").alias(f"__s{i}") for i, (_, c) in enumerate(cum)],
    )
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(f"__s{i}").alias(f"__k{i}") for i in range(len(cum))],
    ]
    # grouped form (`group_col=`): per-source attrition — same single
    # scan, the aggregate becomes one map-side-combinable groupBy on
    # the (low-cardinality) group key, unpivot runs per group row
    totals = (
        flagged.groupBy(*group_cols).agg(*aggs) if group_cols
        else flagged.agg(*aggs)
    )
    # unpivot the 1-row-per-group totals into stage rows: stack is
    # evaluated on |groups| rows — negligible
    def _sql_str(s):
        # stage names land inside single-quoted SQL literals — escape
        # backslashes and quotes so a name like "it's" can't break the
        # generated stack() expression with an opaque parse error
        return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"

    pairs = ", ".join(
        "{}L, {}, {}, __k{}".format(
            i, _sql_str(name), "__n" if i == 0 else f"__k{i-1}", i
        )
        for i, (name, _) in enumerate(cum)
    )
    n = len(cum)
    stacked = totals.select(
        *group_cols,
        F.expr(
            f"stack({n}, {pairs}) AS (stage_idx, stage, docs_in, docs_kept)"
        ),
    )
    return stacked.select(
        *group_cols,
        F.col("stage_idx").cast("long"),
        "stage",
        F.col("docs_in").cast("long"),
        F.col("docs_kept").cast("long"),
        (F.col("docs_in") - F.col("docs_kept")).cast("long").alias("dropped"),
        F.when(F.col("docs_in") > 0,
               F.expr("((docs_in - docs_kept) * 1000000) div docs_in"))
         .otherwise(F.lit(0)).cast("long").alias("drop_ppm"),
    )


def default_quality_stages(
    text_col: str = "text", lang_col: str = "lang"
) -> list:
    """The standard heuristic chain as integer-exact predicates (every
    ratio comparison is cross-multiplied to integers, so both engines
    agree bit-for-bit): nonempty -> >= 20 tokens -> mean word length
    in [3, 10] -> digit ratio <= 20% -> duplicate-line fraction <= 30%
    -> lang == 'en'. Mirrors the C4/Gopher rule families documented in
    `c4_clean` / `gopher_quality_filter`; this chain is the funnel's
    default, not a replacement for those operators."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(toks)).cast("long")
    n = F.length(text_col).cast("long")
    spaces = F.length(F.regexp_replace(F.col(text_col), r"[^ \t\n]", "")).cast("long")
    digits = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")).cast("long")
    lines = split_lines(F.col(text_col))
    n_lines = F.size(lines).cast("long")
    n_dup_lines = (F.size(lines) - F.size(F.array_distinct(lines))).cast("long")
    letters = n - spaces
    return [
        ("nonempty", n_tok > 0),
        ("min_tokens_20", n_tok >= 20),
        ("mean_word_len_3_10",
         (letters >= 3 * n_tok) & (letters <= 10 * n_tok)),
        ("digit_ratio_le_20pct", digits * 5 <= n),
        ("dup_line_frac_le_30pct", n_dup_lines * 10 <= n_lines * 3),
        ("lang_en", F.col(lang_col) == "en"),
    ]
