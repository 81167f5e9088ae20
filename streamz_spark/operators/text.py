"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` —
regex tokenization, ratio features, md5 fingerprints — so they stay
inside whole-stage codegen and parallelize embarrassingly (narrow,
no shuffle). No reference equivalent (streamz users call pandas
string methods through map_partitions); semantics defined here and
mirrored 1:1 in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokenize",
    "token_count",
    "quality_features",
    "language_id",
    "fingerprint",
    "normalize_unicode",
    "word_kgrams",
    "word_shingles",
    "tfidf_top_terms",
    "bm25_term_topk",
    "domain_mixture_weights",
    "BPE_PRETOKEN_PATTERN",
    "bpe_token_count",
    "unigram_nll_quality",
    "stupid_backoff_tables",
    "stupid_backoff_score",
    "stupid_backoff_nll_quality",
    "nb_quality_classifier",
    "nb_quality_train",
    "nb_quality_apply",
]

# tiny deterministic stopword lists for the heuristic language id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "de", "que", "los", "es", "en", "por", "con", "para"],
}


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens of trimmed lowercased text ([] for empty)."""
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / whitespace ratio features plus a
    composite [0,1] quality score — the standard cheap pre-filter for
    LLM corpus cleaning.
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    nonempty = n > 0

    def _char_count(chars: str) -> Column:
        # occurrences of any char in `chars`: length delta after
        # translate-delete — a per-char table lookup, ~10x cheaper than
        # the equivalent regexp_replace('[^chars]') length (same value;
        # the DuckDB oracles keep the regex formulation)
        return (F.length(t) - F.length(F.translate(t, chars, ""))).cast("double")

    punct = _char_count(".,;:!?'\"()[]{}-")
    digits = _char_count("0123456789")
    spaces = _char_count(" \t\n")
    upper = _char_count("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    ntok = token_count(t)
    mean_word_len = F.when(ntok > 0, (n - spaces) / ntok).otherwise(F.lit(0.0))

    punct_ratio = F.when(nonempty, punct / n).otherwise(F.lit(0.0))
    digit_ratio = F.when(nonempty, digits / n).otherwise(F.lit(0.0))
    space_ratio = F.when(nonempty, spaces / n).otherwise(F.lit(0.0))
    upper_ratio = F.when(nonempty, upper / n).otherwise(F.lit(0.0))

    # composite score: penalize extreme ratios and degenerate word lengths
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), punct_ratio * 4)
        * F.lit(0.25)
        - F.least(F.lit(1.0), digit_ratio * 4) * F.lit(0.25)
        - F.when((mean_word_len < 2) | (mean_word_len > 12), F.lit(0.25)).otherwise(F.lit(0.0))
        - F.when(ntok < 5, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    # raw doubles: per-row ratio arithmetic is bit-identical across engines
    return df.select(
        "*",
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        space_ratio.alias("space_ratio"),
        upper_ratio.alias("upper_ratio"),
        ntok.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        F.greatest(score, F.lit(0.0)).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language id: count stopword hits per language over the
    token set, argmax with deterministic tie-break on language code.
    Pure expressions (arrays_overlap-style counting), no UDF.
    """
    toks = tokenize(text_col)
    hit_cols = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(toks, arr))
        hit_cols.append((lang, hits))
    # argmax via greatest + chained when (deterministic order)
    best = F.greatest(*[h for _, h in hit_cols])
    expr = F.lit("und")
    for lang, hits in reversed(hit_cols):  # earlier langs win ties
        expr = F.when((best > 0) & (hits == best), F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def fingerprint(
    col: Column | str, out_name: str = "fingerprint",
    unicode_form: str | None = None,
) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased
    text — identical builtin exists in DuckDB, so exact-dup queries are
    oracle-checkable end to end. ``unicode_form="NFC"`` (etc.) runs
    :func:`normalize_unicode` first, so composed/decomposed encodings
    of the same text collapse to one fingerprint (DuckDB mirror:
    ``md5(regexp_replace(lower(trim(nfc_normalize(x))), ...))``).
    """
    c = F.col(col) if isinstance(col, str) else col
    if unicode_form is not None:
        c = normalize_unicode(c, unicode_form)
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(norm).alias(out_name)


def normalize_unicode(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC/NFKC/NFD/NFKD) — the
    canonicalization pass CCNet-style pipelines run before exact dedup
    so that composed vs decomposed encodings of the same text (e.g.
    ``é`` as U+00E9 vs ``e`` + U+0301, ligatures and fullwidth forms
    under NFKC) fingerprint identically.

    Spark has no builtin Unicode normalizer, so this is an
    Arrow-batched Pandas UDF over ``unicodedata`` — a narrow,
    shuffle-free projection (the documented Python-worker slow path;
    at 100 TB it costs one vectorized string pass, and it short-
    circuits nothing downstream since the output feeds the same md5/
    shingle expressions). Cross-engine: DuckDB's ``nfc_normalize``
    matches ``unicodedata.normalize('NFC', ·)`` (verified on composed/
    decomposed/ligature/fullwidth samples), so NFC-normalized
    pipelines stay oracle-checkable.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC|NFKC|NFD|NFKD, got {form!r}")

    @F.pandas_udf("string")
    def _norm(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(F.col(col) if isinstance(col, str) else col)


def word_kgrams(col: Column | str, k: int = 3) -> Column:
    """ALL k-word grams in order ('a b c' at each position) — the
    positional, non-distinct sibling of :func:`word_shingles` for
    span-level work where position matters (posexplode the result to
    get (pos, gram) anchors). Same O(n) zip_with construction.
    """
    toks = tokenize(col)
    n = F.size(toks)
    m = n - (k - 1)
    acc = F.slice(toks, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(n >= k, acc).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles ('a b c') — the MinHash/Jaccard unit.

    Built by zip_with over k shifted slices of the token array (O(n)
    per doc). The obvious transform-over-index-sequence form is ~3.4×
    slower: Catalyst's CollapseProject inlines the tokenizer into the
    per-element lambda, re-splitting the text for every index.
    """
    toks = tokenize(col)
    n = F.size(toks)
    m = n - (k - 1)
    acc = F.slice(toks, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def add_word_kgrams(
    df: DataFrame,
    text_col: str,
    k: int,
    out_col: str,
    distinct: bool = False,
) -> DataFrame:
    """Append a k-gram array column (``distinct=True`` → shingle set)
    using ``pyspark.ml.feature.NGram``'s compiled Scala UDF.

    Bit-identical to :func:`word_kgrams` / :func:`word_shingles`
    INCLUDING element order (adversarial equality pinned by
    ``tests/test_quality.py::test_ngram_helper_bit_equal``), but the
    gram construction is one compiled ``sliding(k).mkString`` pass
    instead of k-1 interpreted ``zip_with`` higher-order lambdas —
    measured ~2× less CPU on a 100× corpus (OPTIMIZATION_r08.md).
    DataFrame-level because a Transformer cannot be a Column; the
    ``tokenize()`` front end (and so the split/lower/trim semantics)
    is shared with the Column forms.
    """
    from pyspark.ml.feature import NGram

    toks_col, ng_col = f"__{out_col}_toks", f"__{out_col}_ng"
    # tokenize(NULL) is NULL through the otherwise-branch split;
    # coalesce to [] to match word_shingles' when(n >= k) → [] result
    # (NGram's UDF is not null-safe on its Seq input)
    toks = F.coalesce(
        tokenize(text_col), F.array().cast("array<string>")
    )
    out = NGram(n=k, inputCol=toks_col, outputCol=ng_col).transform(
        df.withColumn(toks_col, toks)
    )
    grams: Column = F.col(ng_col)
    if distinct:
        grams = F.array_distinct(grams)
    return out.withColumn(out_col, grams).drop(toks_col, ng_col)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 5,
) -> DataFrame:
    """Per-document top-n terms by TF-IDF — the classic corpus
    keyword/topic signal (salton-style tf·ln(N/df), smoothed as
    ``tf * (ln((N+1)/(df+1)) + 1)`` so corpus-wide terms don't zero
    out).

    Shape at scale: one groupBy on (doc, term) for TF, one on term for
    DF (both high-cardinality, balanced), a join on term, and a per-doc
    top-n window — the doc-count scalar rides in as a broadcast
    cross-join, not a collect. Output: ``(id, term, tf, df_count,
    rank)``; rank ties break lexicographically so results are
    total-ordered and engine-reproducible.
    """
    from pyspark.sql import Window as W

    # no scan fan-out here: the explode feeds a groupBy shuffle almost
    # immediately, so parallelism arrives with the exchange — measured
    # +25% from adding the extra round-robin shuffle at sf0.1
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term"))
    # tf is the small aggregated (doc, term) relation and feeds three
    # consumers (df-count, doc-count, scoring) — localCheckpoint (not
    # persist: cache entries outlive the caller and accumulate across
    # repeated invocations in a long-lived session; checkpoint blocks
    # are released by the ContextCleaner once the result is dropped)
    # so the corpus tokenization+explode runs exactly once
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    n_docs = tf.select("id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df_count") + 1)) + 1.0),
        )
    )
    w = W.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(F.col("id").alias(id_col), "term", "tf", "df_count", "rank")
    )


def bm25_term_topk(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-query-term top-n documents by BM25 (Robertson/Sparck-Jones)
    — the ranked-retrieval primitive TF-IDF lacks: term-frequency
    saturation (``k1``) and document-length normalization (``b``).

    Scale shape: the query-term filter lands BEFORE the (doc, term)
    shuffle, so only postings for the |terms| query terms — a vanishing
    fraction of a 100 TB corpus — are ever shuffled; document length is
    computed narrowly as ``size(split(text))`` with no explode, and the
    corpus scalars (N, avgdl) ride in as a broadcast cross-join of a
    1-row aggregate, never a collect. Ranking is per term (PARTITION BY
    term), so the idf factor is a positive per-partition constant and
    the ordering is decided purely by the tf / length part — engine
    libm differences in ``ln`` cannot reorder results. Ties break on
    doc_id, making the output total-ordered and reproducible.

    Output: ``(term, doc_id, tf, doc_len, df_count, rank)`` — integer
    columns only; the double score stays internal to the sort.
    """
    from pyspark.sql import Window as W

    toks = tokenize(text_col)
    docs = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("doc_len"),
    )
    # corpus scalars: one tiny all-reduce, broadcast back. Computed
    # from the raw frame with the narrow token_count() (size-of-split,
    # no token-array materialization) rather than from `docs`: the
    # corpus is read twice either way (the scalars must exist before
    # any posting can be scored, and persisting a 100 TB tokenized
    # projection costs more than the second scan), but this branch
    # never builds the array, so the extra pass is scan+count only.
    scalars = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("total_tokens"),
    )
    term_lits = F.array(*[F.lit(t) for t in terms])
    # array_intersect yields the distinct matched query terms per doc;
    # tf is a narrow per-row count of that term — no corpus-wide
    # explode ever happens, only |matched terms| <= |terms| rows/doc
    postings = (
        docs.select(
            "id",
            "doc_len",
            "toks",
            F.explode(F.array_intersect("toks", term_lits)).alias("term"),
        )
        .withColumn(
            "tf",
            F.size(F.filter("toks", lambda x: x == F.col("term"))).cast("long"),
        )
        .drop("toks")
    )
    # postings feeds BOTH the df aggregate and the scored join; without
    # a barrier each consumer re-runs the corpus tokenize +
    # array_intersect. Unlike common_shingle_stats' corpus-wide posting
    # (where recompute measured cheaper than materialization), this
    # frame is tiny — only rows matching the |terms| query terms
    # survive the explode — so one materialization beats a second full
    # tokenize pass at any corpus size.
    postings = postings.localCheckpoint(eager=False)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df_count") + 0.5)
                / (F.col("df_count") + 0.5)
            ),
        )
        .withColumn(
            "score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))),
        )
    )
    w = W.partitionBy("term").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "term",
            F.col("id").alias(id_col),
            "tf",
            "doc_len",
            "df_count",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain token accounting and uniform-target resampling
    weights — the static domain-mixing computation every large-scale
    pretraining pipeline runs before sampling (a DoReMi-style reweight
    with the uniform reference mix).

    ``token_share`` is each domain's fraction of corpus tokens;
    ``resample_weight`` is the factor that equalizes domain token mass
    (``total / (n_domains * domain_tokens)``) — >1 means upsample.
    Both are single IEEE divisions of exact integer counts, so the
    values are bit-reproducible across engines.

    Scale shape: one map-side-combinable groupBy on the domain key
    (tiny cardinality), corpus totals via a broadcast 1-row aggregate.
    Token counts come from ``size(split(...))`` — narrow, no explode.
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    totals = per.agg(
        F.count(F.lit(1)).alias("n_domains"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    # explicit zero-token guards: Spark's non-ANSI divide yields NULL
    # on /0 while an engine with double semantics yields inf — an
    # all-empty domain must mean the same thing (NULL weight) in both
    return (
        per.crossJoin(F.broadcast(totals))
        .withColumn(
            "token_share",
            F.when(
                F.col("total_tokens") > 0,
                F.col("n_tokens").cast("double")
                / F.col("total_tokens").cast("double"),
            ),
        )
        .withColumn(
            "resample_weight",
            F.when(
                F.col("n_tokens") > 0,
                F.col("total_tokens").cast("double")
                / (F.col("n_domains") * F.col("n_tokens")).cast("double"),
            ),
        )
        .select(
            "domain", "n_docs", "n_tokens", "token_share", "resample_weight"
        )
    )


# GPT-2-style pre-tokenizer, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB) match identically: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs, residual whitespace. Both
# engines use leftmost-first alternation, so counts are identical.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_count(col: Column | str, out_name: str = "n_bpe_tokens") -> Column:
    """Subword-style token count via the GPT-2-ish pre-tokenizer regex
    — the corpus-budget unit training pipelines actually meter (vs
    whitespace words). Narrow JVM regex, no explode, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), 0)).cast(
        "long"
    ).alias(out_name)


def unigram_nll_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_limit: int | None = None,
    lm_join: str = "auto",
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM
    trained on the corpus itself — the CCNet-style "LM perplexity"
    quality signal reduced to its order-0 form (no external model in
    this environment; the plumbing and the filtering semantics are the
    same, and the LM hook is the freq relation).

    **Vocabulary cap** (``vocab_limit``): CCNet scores against a
    fixed-vocabulary external LM; the corpus-trained analogue caps the
    LM to the top-V terms by count (ties → term asc, so the cut is
    deterministic in any engine) and scores every out-of-vocab token
    with the lumped residual mass ``p_oov = (n_total − Σ topV cnt) /
    n_total`` — a proper distribution over "topV + OOV". At a 100 TB
    corpus a whitespace vocabulary is 10⁸–10⁹ terms (heavy tail of
    typos/numbers/URLs); the cap is what makes the signal — and the
    plan — scale-invariant. ``vocab_limit=None`` keeps the exact
    corpus LM.

    **LM join dispatch** (``lm_join``): ``"broadcast"`` hash-joins the
    LM map-side; ``"shuffle"`` hints ``shuffle_hash`` so both sides
    exchange on ``term`` without sorting the exploded corpus;
    ``"auto"`` picks broadcast when the LM is ≤ ``broadcast_limit``
    rows (statically when ``vocab_limit`` bounds it, else from the
    checkpointed freq's count) and degrades to the shuffle join
    instead of OOMing executors — the same size-dispatch contract as
    ``dedup.embedding_near_duplicates(prefilter="auto")``.

    Determinism: per-token NLL is floor-scaled to integer micro-nats
    *before* summation, so the per-doc total is an integer SUM —
    associative and order-independent, bit-identical in any engine
    (the earlier design summed doubles in a running window, which
    relied on both engines associating strictly left-to-right).
    ``nll_mean`` divides two exactly-represented integers (sum <
    2⁵³), so even the double output is bit-reproducible. The only
    residual cross-engine exposure is a single per-term ``ln`` landing
    within 1–2 ulp of an integer micro-nat boundary (~1e-10 per
    distinct term value).

    Scale shape: one (term) groupBy for the LM counts (map-side
    combinable, localCheckpointed — the corpus explode+aggregate runs
    once), the top-V cut is a bounded TakeOrdered, the LM joins back
    by size-dispatched broadcast/shuffle-hash, and the per-doc total
    is a map-side-combinable groupBy on the doc key — no window sort,
    no corpus sort-merge, exchanges bounded at three.
    """
    # NOT fused through a doc-term count barrier (r09 measured
    # rejection, both fusion arms prototyped + A/B'd): deriving the LM
    # and the scoring join from one checkpointed groupBy(id, term)
    # matrix (tokenize once instead of twice) cut executor CPU 40% at
    # sf0.1 (8.9 -> 5.3 s) but DOUBLED it at the 100× replica
    # (60.6 -> 132.3 s, shuffle 3.8 -> 110 MB): at scale the doc-term
    # matrix is ~40% of corpus tokens, so its exchange + 20M-key hash
    # aggregate + checkpoint serialization cost far more than the one
    # saved tokenize pass — the sf0.1 win was stage latency, not
    # per-byte work. The two-pass compose below (freq aggregate
    # checkpointed vocab-sized, corpus tokenized once per pass) is the
    # scale-correct shape. Same verdict, worse, for the bigram analogue
    # (see stupid_backoff_nll_quality).
    lm, scalars, join = unigram_lm_tables(
        df,
        text_col=text_col,
        id_col=id_col,
        vocab_limit=vocab_limit,
        lm_join=lm_join,
        broadcast_limit=broadcast_limit,
    )
    return unigram_nll_score(
        df, lm, scalars, id_col=id_col, text_col=text_col, join=join
    )


def unigram_lm_tables(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_limit: int | None = None,
    lm_join: str = "auto",
    broadcast_limit: int = 2_000_000,
):
    """Train the unigram LM relations on ``df`` — returns
    ``(lm, scalars, join)``: the (capped) term table ``(term, cnt)``,
    the one-row scalars ``(n_total, oov_cnt)``, and the dispatched
    join mode. Train-once-score-elsewhere is CCNet's deployment shape
    (the LM trains on a reference corpus and scores the crawl);
    :func:`unigram_nll_score` applies the tables to any corpus —
    batch or streaming. Same split as :func:`stupid_backoff_tables`.
    """
    from streamz_spark.io import ensure_scan_parallelism

    if vocab_limit is not None and vocab_limit < 1:
        raise ValueError("vocab_limit must be >= 1")
    if lm_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"lm_join must be auto|broadcast|shuffle, got {lm_join!r}")

    df = ensure_scan_parallelism(df)
    toks = df.select(F.explode(tokenize(text_col)).alias("term"))
    # vocab-sized relation feeding 2-3 consumers (total, topV cut,
    # join) — localCheckpoint so the corpus aggregate runs exactly once
    freq = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    return _unigram_lm_from_freq(freq, vocab_limit, lm_join, broadcast_limit)


def _unigram_lm_from_freq(
    freq: DataFrame,
    vocab_limit: int | None,
    lm_join: str,
    broadcast_limit: int,
):
    """Cap + scalars + join dispatch over a trained ``(term, cnt)``
    relation — shared by :func:`unigram_lm_tables` (corpus-aggregated
    freq) and the fused :func:`unigram_nll_quality` (freq re-aggregated
    from the checkpointed doc-term matrix)."""
    total = freq.agg(F.sum("cnt").alias("n_total"))

    if vocab_limit is not None:
        lm = freq.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(vocab_limit)
        in_mass = lm.agg(F.sum("cnt").alias("in_vocab_mass"))
        scalars = total.crossJoin(in_mass).select(
            "n_total",
            (F.col("n_total") - F.col("in_vocab_mass")).alias("oov_cnt"),
        )
    else:
        lm = freq
        scalars = total.select("n_total", F.lit(None).cast("long").alias("oov_cnt"))

    if lm_join == "auto":
        lm_size = vocab_limit if vocab_limit is not None else freq.count()
        lm_join = "broadcast" if lm_size <= broadcast_limit else "shuffle"
    return lm, scalars, lm_join


def unigram_nll_score(
    df: DataFrame,
    lm: DataFrame,
    scalars: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    join: str = "broadcast",
) -> DataFrame:
    """Score ``df`` under a trained unigram LM (see
    :func:`unigram_lm_tables`). Pure projections + one LM join + one
    doc-key aggregate, so it runs unchanged on a STREAMING frame
    (stream-static joins; complete/update output for the per-doc
    aggregate). The scalars attach via a constant-key equi-join (not a
    crossJoin) so the plan is stream-legal."""
    from streamz_spark.io import ensure_scan_parallelism

    if not df.isStreaming:
        df = ensure_scan_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    return _unigram_score_terms(toks, lm, scalars, id_col=id_col, join=join)


def _unigram_score_terms(
    rel: DataFrame,
    lm: DataFrame,
    scalars: DataFrame,
    id_col: str,
    join: str,
) -> DataFrame:
    """Score an ``(id, term)`` relation (one row per token) under a
    unigram LM — the apply half of :func:`unigram_nll_score`."""
    lm_rel = F.broadcast(lm) if join == "broadcast" else lm.hint("shuffle_hash")
    scored = (
        rel.join(lm_rel, "term", "left")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(scalars.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
        .withColumn(
            "nll_micro",
            F.floor(
                -F.log(
                    F.coalesce(F.col("cnt"), F.col("oov_cnt")).cast("double")
                    / F.col("n_total").cast("double")
                )
                * 1000000.0
            ).cast("long"),
        )
    )
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("nll_micro").alias("nll_sum_micro"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            (F.col("nll_sum_micro").cast("double") / F.lit(1000000.0))
            / F.col("n_tokens").cast("double")
        ).alias("nll_mean"),
        F.expr("nll_sum_micro div n_tokens").cast("long").alias("nll_mean_micro"),
    )


def stupid_backoff_nll_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_limit: int | None = None,
    bigram_limit: int | None = None,
    alpha: float = 0.4,
    lm_join: str = "auto",
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Per-document mean NLL under a bigram **stupid-backoff** LM
    trained on the corpus itself — Brants et al. 2007 ("Large Language
    Models in Machine Translation"), the backoff scheme DESIGNED for
    distributed MapReduce-scale LM estimation (no discounting pass, no
    normalization — plain relative frequencies plus a fixed backoff
    factor), which makes it the natural order-1 upgrade of
    :func:`unigram_nll_quality` for CCNet-style perplexity filtering:

    * ``S(w_i | w_{i-1}) = cnt2(w_{i-1} w_i) / cnt1(w_{i-1})`` when the
      bigram was observed (and both terms are in-vocab),
    * else ``S(w_i | w_{i-1}) = alpha * S(w_i)`` with ``alpha = 0.4``
      (the paper's constant),
    * ``S(w) = cnt1(w) / N`` (unigram relative frequency; out-of-vocab
      tokens score through the lumped residual mass exactly as in
      :func:`unigram_nll_quality`),
    * the first token of a document has no context and scores
      ``S(w_1)`` un-backed-off.

    **One corpus aggregate.** Every token is emitted once as
    ``(prev, cur)`` with ``prev = NULL`` for document-initial tokens,
    so a single corpus-sized ``groupBy(prev, cur)`` yields the bigram
    type table AND — because each token occurs exactly once as
    ``cur`` — the unigram counts fall out as a bigram-TYPE-sized
    re-aggregation ``cnt1(w) = Σ_prev cnt2(prev, w)``. The corpus
    shuffles once for LM estimation, not twice.

    **Caps** (the 100 TB story): ``vocab_limit`` cuts the unigram LM to
    the top-V terms (ties → term asc) with OOV scored through the
    residual mass; ``bigram_limit`` cuts the bigram table to the top-B
    pairs (ties → prev asc, cur asc) — a *missing* bigram simply backs
    off, which is exactly stupid backoff's contract, so the cap
    degrades quality smoothly instead of changing semantics. At 100 TB
    the uncapped bigram type table is ~1e10 rows; the caps bound both
    join relations and make the plan scale-invariant.

    **Join dispatch**: ``lm_join`` = ``"broadcast"`` | ``"shuffle"`` |
    ``"auto"`` with the same size-dispatch contract as
    :func:`unigram_nll_quality` — auto broadcasts each LM relation
    when its (statically known or counted) size is ≤
    ``broadcast_limit`` rows and degrades to ``shuffle_hash`` joins
    (never a sort of the exploded corpus) otherwise.

    **Determinism**: per-token NLL is floored to integer micro-nats
    before summation (associative integer SUM, bit-identical across
    engines); the backoff factor multiplies INSIDE the log argument
    (``-ln(alpha * p)``) so both engines evaluate one ``ln`` per
    token. Output schema matches :func:`unigram_nll_quality`:
    ``(id_col, n_tokens, nll_mean, nll_mean_micro)``.
    """
    if lm_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"lm_join must be auto|broadcast|shuffle, got {lm_join!r}")
    # NOT fused through a doc-bigram count matrix (r09 measured
    # rejection): at sf0.1 the (id, prev, cur) aggregate + checkpoint
    # RAISED executor CPU 20-60% (5.2->6.2 s / 4.1->6.5 s) — bigram
    # types rarely repeat within one document, so the doc-bigram
    # matrix is ~token-count-sized and the aggregate saves nothing
    # while paying a corpus-sized materialization. The unigram
    # analogue lost at 100× for the same reason (see
    # unigram_nll_quality). The two-pass tables+score compose (one
    # tokenize per pass) stays the scale-correct shape.
    lm1, lm2, scalars, join1, join2 = stupid_backoff_tables(
        df,
        text_col=text_col,
        vocab_limit=vocab_limit,
        bigram_limit=bigram_limit,
        lm_join=lm_join,
        broadcast_limit=broadcast_limit,
    )
    return stupid_backoff_score(
        df,
        lm1,
        lm2,
        scalars,
        id_col=id_col,
        text_col=text_col,
        alpha=alpha,
        join1=join1,
        join2=join2,
    )


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) per token, prev = NULL at position 0 — narrow:
    the pair comes from the token array itself (element_at is 1-based,
    posexplode's pos is 0-based, so element_at(arr, pos) IS arr[pos-1]).
    Works on streaming frames (pure projections)."""
    return (
        df.select(F.col(id_col).alias("id"), tokenize(text_col).alias("__arr"))
        .select("id", "__arr", F.posexplode("__arr").alias("pos", "cur"))
        .select(
            "id",
            F.when(F.col("pos") == 0, F.lit(None).cast("string"))
            .otherwise(F.element_at("__arr", F.col("pos")))
            .alias("prev"),
            "cur",
        )
    )


def stupid_backoff_tables(
    df: DataFrame,
    text_col: str = "text",
    vocab_limit: int | None = None,
    bigram_limit: int | None = None,
    lm_join: str = "auto",
    broadcast_limit: int = 2_000_000,
):
    """Train the stupid-backoff LM relations on ``df`` — returns
    ``(lm1, lm2, scalars, join1, join2)``: the (capped) unigram table
    ``(term, cnt)``, the (capped) bigram table ``(prev, cur, cnt2)``,
    the one-row scalars ``(n_total, oov_cnt)``, and the dispatched
    join mode per table. Train-once-score-elsewhere is CCNet's actual
    deployment (the LM is trained on a reference corpus and scores the
    crawl); :func:`stupid_backoff_score` applies these tables to any
    corpus — batch or streaming (the tables are static relations, so
    the scoring joins are stream-static)."""
    from streamz_spark.io import ensure_scan_parallelism

    if vocab_limit is not None and vocab_limit < 1:
        raise ValueError("vocab_limit must be >= 1")
    if bigram_limit is not None and bigram_limit < 1:
        raise ValueError("bigram_limit must be >= 1")

    df = ensure_scan_parallelism(df)
    # the ONE corpus-sized aggregate; bigram-TYPE-sized result feeds
    # the unigram re-aggregation and the top-B cut, so it runs once
    pairs = (
        df.select(tokenize(text_col).alias("__arr"))
        .select("__arr", F.posexplode("__arr").alias("pos", "cur"))
        .select(
            F.when(F.col("pos") == 0, F.lit(None).cast("string"))
            .otherwise(F.element_at("__arr", F.col("pos")))
            .alias("prev"),
            "cur",
        )
    )
    pc = (
        pairs.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cnt2"))
        .localCheckpoint(eager=True)
    )
    return _sb_tables_from_pc(pc, vocab_limit, bigram_limit, lm_join, broadcast_limit)


def _sb_tables_from_pc(
    pc: DataFrame,
    vocab_limit: int | None,
    bigram_limit: int | None,
    lm_join: str,
    broadcast_limit: int,
):
    """Caps + scalars + join dispatch over a trained ``(prev, cur,
    cnt2)`` relation — shared by :func:`stupid_backoff_tables` (corpus-
    aggregated pc) and the fused :func:`stupid_backoff_nll_quality`
    (pc re-aggregated from the checkpointed doc-bigram matrix)."""
    # unigram counts derived (every token occurs exactly once as cur)
    cnt1 = (
        pc.groupBy(F.col("cur").alias("term"))
        .agg(F.sum("cnt2").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = cnt1.agg(F.sum("cnt").alias("n_total"))

    if vocab_limit is not None:
        lm1 = cnt1.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(vocab_limit)
        in_mass = lm1.agg(F.sum("cnt").alias("in_vocab_mass"))
        scalars = total.crossJoin(in_mass).select(
            "n_total",
            (F.col("n_total") - F.col("in_vocab_mass")).alias("oov_cnt"),
        )
    else:
        lm1 = cnt1
        scalars = total.select("n_total", F.lit(None).cast("long").alias("oov_cnt"))

    lm2 = pc.where(F.col("prev").isNotNull())
    if bigram_limit is not None:
        lm2 = lm2.orderBy(
            F.col("cnt2").desc(), F.col("prev").asc(), F.col("cur").asc()
        ).limit(bigram_limit)

    if lm_join == "auto":
        lm1_size = vocab_limit if vocab_limit is not None else cnt1.count()
        lm2_size = bigram_limit if bigram_limit is not None else pc.count()
        join1 = "broadcast" if lm1_size <= broadcast_limit else "shuffle"
        join2 = "broadcast" if lm2_size <= broadcast_limit else "shuffle"
    else:
        join1 = join2 = lm_join
    return lm1, lm2, scalars, join1, join2


def stupid_backoff_score(
    df: DataFrame,
    lm1: DataFrame,
    lm2: DataFrame,
    scalars: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    join1: str = "broadcast",
    join2: str = "broadcast",
) -> DataFrame:
    """Score ``df`` under trained stupid-backoff tables (see
    :func:`stupid_backoff_tables`). Pure projections + LM joins + one
    doc-key aggregate, so it runs unchanged on a STREAMING frame
    (stream-static joins; use complete/update output for the per-doc
    aggregate). Output schema matches :func:`unigram_nll_quality`."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    toks = _bigram_pairs(df, id_col, text_col)
    return _sb_score_rel(
        toks, lm1, lm2, scalars, id_col=id_col, alpha=alpha,
        join1=join1, join2=join2,
    )


def _sb_score_rel(
    rel: DataFrame,
    lm1: DataFrame,
    lm2: DataFrame,
    scalars: DataFrame,
    id_col: str,
    alpha: float,
    join1: str,
    join2: str,
) -> DataFrame:
    """Score an ``(id, prev, cur)`` relation (one row per token) under
    stupid-backoff tables — the apply half of
    :func:`stupid_backoff_score`."""
    def _hint(rel_: DataFrame, mode: str) -> DataFrame:
        return F.broadcast(rel_) if mode == "broadcast" else rel_.hint("shuffle_hash")

    c1 = _hint(lm1.select(F.col("term").alias("cur"), F.col("cnt").alias("cnt_cur")), join1)
    p1 = _hint(lm1.select(F.col("term").alias("prev"), F.col("cnt").alias("cnt_prev")), join1)
    l2 = _hint(lm2, join2)

    bigram_ok = (
        F.col("prev").isNotNull()
        & F.col("cnt2").isNotNull()
        & F.col("cnt_prev").isNotNull()
        & F.col("cnt_cur").isNotNull()
    )
    backoff = F.when(F.col("prev").isNull(), F.lit(1.0)).otherwise(F.lit(alpha))
    # constant-key equi-join for the one-row scalars (instead of a
    # crossJoin) so the same scoring plan is legal on a STREAMING left
    # side (stream-static equi-joins are supported; cross joins are not)
    scored = (
        rel.join(c1, "cur", "left")
        .join(p1, "prev", "left")
        .join(l2, ["prev", "cur"], "left")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(scalars.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
        .withColumn(
            "nll_micro",
            F.floor(
                F.when(
                    bigram_ok,
                    -F.log(
                        F.col("cnt2").cast("double")
                        / F.col("cnt_prev").cast("double")
                    ),
                ).otherwise(
                    -F.log(
                        backoff
                        * F.coalesce(F.col("cnt_cur"), F.col("oov_cnt")).cast("double")
                        / F.col("n_total").cast("double")
                    )
                )
                * 1000000.0
            ).cast("long"),
        )
    )
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("nll_micro").alias("nll_sum_micro"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            (F.col("nll_sum_micro").cast("double") / F.lit(1000000.0))
            / F.col("n_tokens").cast("double")
        ).alias("nll_mean"),
        F.expr("nll_sum_micro div n_tokens").cast("long").alias("nll_mean_micro"),
    )


def nb_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_limit: int | None = None,
    alpha: float = 1.0,
    lm_join: str = "auto",
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Model-based quality filtering: train a multinomial Naive Bayes
    text classifier on weak labels and score every document — the
    modern corpus-curation recipe (DCLM / FineWeb-Edu filter with a
    fastText-class linear classifier; GPT-3's WebText-vs-CommonCrawl
    quality classifier). NB is the closed-form member of that family:
    the "training" is two token-count aggregates, so the whole
    pipeline is a deterministic Spark plan (no iterative optimizer)
    and exactly reproducible in a SQL oracle.

    Convenience composition of :func:`nb_quality_train` +
    :func:`nb_quality_apply` on the same frame (see those for the
    model construction, determinism contract, and scale shape).
    ``lm_join="auto"`` dispatches broadcast vs ``shuffle_hash`` on the
    model size vs ``broadcast_limit`` — the same size-dispatch
    contract as :func:`unigram_nll_quality`.

    Output: ``(id_col, n_tokens, score_micro, score, pred)`` where
    ``score_micro`` is the integer micro-nat log-odds, ``score`` its
    double form, ``pred = score_micro > 0``.
    """
    if lm_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"lm_join must be auto|broadcast|shuffle, got {lm_join!r}")
    model = nb_quality_train(
        df, label_col, text_col=text_col, vocab_limit=vocab_limit, alpha=alpha
    )
    if lm_join == "auto":
        size = vocab_limit if vocab_limit is not None else model[0].count()
        lm_join = "broadcast" if size <= broadcast_limit else "shuffle"
    return nb_quality_apply(df, model, id_col=id_col, text_col=text_col, lm_join=lm_join)


def nb_quality_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    vocab_limit: int | None = None,
    alpha: float = 1.0,
):
    """Train the :func:`nb_quality_classifier` model and return it as
    two relations — ``(model, scalars)`` where ``model`` is
    ``(term, llr_micro)`` (vocab-bounded: at most ``vocab_limit``
    rows) and ``scalars`` is ONE row ``(oov_llr_micro, prior_micro)``.

    Splitting train from apply is what production curation actually
    does: fit once on a labeled snapshot, then score any corpus — or
    any STREAM (apply is stateless exprs + a broadcast join, legal in
    a streaming plan). Per-term log-likelihood ratios are
    pre-collapsed to integer micro-nats at train time, so apply-side
    scoring is a join + integer sum with no floating-point work that
    could diverge between engines or runs.
    """
    from streamz_spark.io import ensure_scan_parallelism

    if vocab_limit is not None and vocab_limit < 1:
        raise ValueError("vocab_limit must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (Laplace smoothing keeps every log finite)")
    df = ensure_scan_parallelism(df)
    toks = df.select(
        F.col(label_col).cast("boolean").alias("y"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    freq = (
        toks.groupBy("term")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("cnt_pos"),
            F.sum(F.when(~F.col("y"), 1).otherwise(0)).alias("cnt_neg"),
        )
        .localCheckpoint(eager=True)
    )
    if vocab_limit is not None:
        lm = freq.orderBy(
            (F.col("cnt_pos") + F.col("cnt_neg")).desc(), F.col("term").asc()
        ).limit(vocab_limit)
    else:
        lm = freq
    totals = freq.agg(
        F.sum("cnt_pos").alias("n_pos"), F.sum("cnt_neg").alias("n_neg")
    )
    in_mass = lm.agg(
        F.count(F.lit(1)).alias("v_size"),
        F.sum("cnt_pos").alias("in_pos"),
        F.sum("cnt_neg").alias("in_neg"),
    )
    priors = df.agg(
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(~F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("d_neg"),
    )
    base = (
        totals.crossJoin(in_mass).crossJoin(priors)
        .select(
            F.assert_true(
                (F.col("d_pos") > 0) & (F.col("d_neg") > 0),
                F.lit("nb_quality_train needs both label classes non-empty"),
            ).alias("__chk"),
            (F.col("n_pos") - F.col("in_pos")).alias("oov_pos"),
            (F.col("n_neg") - F.col("in_neg")).alias("oov_neg"),
            (F.col("n_pos").cast("double") + F.lit(alpha) * (F.col("v_size") + 1))
            .alias("denom_pos"),
            (F.col("n_neg").cast("double") + F.lit(alpha) * (F.col("v_size") + 1))
            .alias("denom_neg"),
            F.floor(
                (F.log(F.col("d_pos").cast("double"))
                 - F.log(F.col("d_neg").cast("double"))) * 1000000.0
            ).cast("long").alias("prior_micro"),
        )
        .drop("__chk")
    )

    def _llr(pos_cnt, neg_cnt):
        return F.floor(
            (
                F.log((pos_cnt.cast("double") + F.lit(alpha)) / F.col("denom_pos"))
                - F.log((neg_cnt.cast("double") + F.lit(alpha)) / F.col("denom_neg"))
            ) * 1000000.0
        ).cast("long")

    model = lm.crossJoin(F.broadcast(base)).select(
        "term", _llr(F.col("cnt_pos"), F.col("cnt_neg")).alias("llr_micro")
    )
    scalars = base.select(
        _llr(F.col("oov_pos"), F.col("oov_neg")).alias("oov_llr_micro"),
        "prior_micro",
    )
    return model, scalars


def nb_quality_apply(
    df: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm_join: str = "broadcast",
) -> DataFrame:
    """Score a corpus — or a stream — against a trained
    :func:`nb_quality_train` model. Stateless per-token exprs + one
    model join + one doc-key aggregate; on a streaming frame the model
    join is a stream-static broadcast join and the per-doc aggregate
    is the (watermarkable) streaming aggregation. Output schema equals
    :func:`nb_quality_classifier`.
    """
    lm, scalars = model
    if lm_join not in ("broadcast", "shuffle"):
        raise ValueError(f"lm_join must be broadcast|shuffle, got {lm_join!r}")
    lm_rel = F.broadcast(lm) if lm_join == "broadcast" else lm.hint("shuffle_hash")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term")
    )
    scored = (
        toks.join(lm_rel, "term", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "id",
            F.coalesce(F.col("llr_micro"), F.col("oov_llr_micro")).alias("llr_micro"),
            "prior_micro",
        )
    )
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("llr_micro").alias("llr_sum_micro"),
        F.max("prior_micro").alias("prior_micro"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("llr_sum_micro") + F.col("prior_micro")).alias("score_micro"),
        ((F.col("llr_sum_micro") + F.col("prior_micro")).cast("double")
         / F.lit(1000000.0)).alias("score"),
        ((F.col("llr_sum_micro") + F.col("prior_micro")) > 0).alias("pred"),
    )


def perplexity_cut_table(scored_with_lang: DataFrame) -> DataFrame:
    """Per-language tercile VALUE cuts of the integer micro-nat NLL
    score: ``(lang, p33, p66)`` from a frame carrying ``lang`` and
    ``nll_mean_micro`` columns. Extracted so the CCNet deployment
    split (derive cuts from the reference corpus once, then
    stream-classify against the broadcast/literal cut table) can reuse
    the exact aggregate `perplexity_buckets` uses internally. Exact
    percentile for oracle reproducibility — at 100 TB swap for
    ``percentile_approx`` (mergeable KLL), same note as the composed
    operator."""
    return scored_with_lang.groupBy("lang").agg(
        F.floor(F.percentile("nll_mean_micro", F.lit(1.0 / 3.0)))
        .cast("long")
        .alias("p33"),
        F.floor(F.percentile("nll_mean_micro", F.lit(2.0 / 3.0)))
        .cast("long")
        .alias("p66"),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_limit: int | None = None,
    lm_join: str = "auto",
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by LM quality
    score into per-language terciles and keep head+middle (CCNet §4.3
    trains on the lower-perplexity two-thirds; the tail is where
    boilerplate and gibberish concentrate).

    Scoring is :func:`unigram_nll_quality` (same vocab cap, same LM
    join dispatch, same integer micro-nat determinism). The tercile
    cuts are **value cuts, not rank cuts**: one tiny per-language
    aggregate computes the exact 1/3 and 2/3 percentiles of
    ``nll_mean_micro`` (floored to integers so both engines classify
    identically), then every doc classifies by comparison against the
    broadcast cut table. That is the CCNet shape — they derive fixed
    perplexity thresholds from a sample, then stream-classify — and
    the 100 TB shape: NO per-language global sort, no ntile window
    over the corpus; the only corpus-wide exchanges are the NLL
    operator's own (LM groupBy + doc groupBy) plus one doc-key join
    to re-attach the language column. At scale swap the exact
    percentile for ``percentile_approx`` (mergeable KLL) — kept exact
    here for oracle reproducibility, same trade documented in
    sampling.top_fraction_by_group.

    Docs with zero tokens never score (no toks rows -> no NLL row) and
    are absent from the output, matching the oracle.

    Output: ``(id_col, lang, n_tokens, nll_mean_micro, bucket, kept)``
    where bucket ∈ head|middle|tail and kept = bucket != tail.
    """
    scores = unigram_nll_quality(
        df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        vocab_limit=vocab_limit,
        lm_join=lm_join,
        broadcast_limit=broadcast_limit,
    )
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    wl = scores.join(langs, id_col)
    # wl feeds BOTH the per-language cut aggregate and the final
    # classify join: without a barrier the whole NLL scoring chain
    # (corpus tokenize+explode, LM train groupBy, LM join, doc groupBy,
    # lang join) evaluates twice — the plan shows two full copies of
    # the subtree, 4 parquet scans for 2 logical passes. wl is one
    # narrow row per doc, so materializing it is far cheaper than
    # recomputing the scoring pipeline (same barrier rationale as
    # dsir_importance_resample's keyed frame).
    wl = wl.localCheckpoint(eager=False)
    cuts = perplexity_cut_table(wl)
    out = wl.join(F.broadcast(cuts), "lang")
    bucket = (
        F.when(F.col("nll_mean_micro") <= F.col("p33"), F.lit("head"))
        .when(F.col("nll_mean_micro") <= F.col("p66"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(
        F.col(id_col),
        "lang",
        "n_tokens",
        "nll_mean_micro",
        bucket.alias("bucket"),
        (F.col("nll_mean_micro") <= F.col("p66")).alias("kept"),
    )
