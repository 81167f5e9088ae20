"""Deterministic splitting and sampling for training-data pipelines.

Two staples of corpus preparation the reference never needed:

- **hash split** — assign every row to train/val/test by hashing its
  id. Deterministic (same row → same split on every run, any cluster
  size, any partitioning), stable under corpus growth (new rows don't
  reshuffle old ones — the property random splits lose), and pure
  map-side: no shuffle, no state.
- **stratified sample** — exact n-per-stratum sample, ordered by a
  seeded hash so it's uniform-at-random yet reproducible. One shuffle
  on the strata key; the per-stratum sort is bounded by the stratum
  size (use it for per-language / per-source eval carve-outs, not for
  strata with billions of rows — for those, hash-split within the
  stratum instead).

Hashes derive from md5 (first 8/12 hex chars → int), not xxhash64 /
Spark `hash`: md5 is bit-identical in every engine (DuckDB, Trino,
Python hashlib), which makes split assignments portable across the
whole data platform, not just reproducible inside Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "hash_split_fast",
    "stratified_sample",
    "sample_fractions",
    "dsir_select",
    "select_top_quality",
    "select_to_token_budget",
    "temperature_mixture_sample",
    "temperature_mixture_rates",
    "apply_mixture_rates",
]

_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, seed: str = "42", buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(seed ':' id)."""
    key = F.concat(F.lit(seed + ":"), F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % buckets
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    seed: str = "42",
    out_col: str = "split",
) -> DataFrame:
    """Assign a split label per row from cumulative hash-bucket ranges.

    ``splits`` maps label → weight (normalized; insertion order defines
    the bucket ranges, so keep it stable across runs). Default
    ``{"train": .9, "val": .05, "test": .05}``.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    bucket = hash_bucket(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    labels = list(splits)
    for name in labels[:-1]:
        acc += splits[name] / total
        cut = int(round(acc * _BUCKETS))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: str = "42",
    flag_col: str | None = None,
) -> DataFrame:
    """Exact, reproducible n-per-stratum sample.

    Rank rows inside each stratum by a seeded md5 hash (ties broken by
    id, so the result is total-ordered and engine-independent). With
    ``flag_col`` set, returns *all* rows with a boolean marker instead
    of filtering — useful when the sample flag is one feature among
    many.
    """
    ordkey = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string"))), 1, 12),
        16, 10,
    ).cast("long")
    w = W.partitionBy(*strata).orderBy(ordkey.asc(), F.col(id_col).asc())
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if flag_col is not None:
        return ranked.withColumn(flag_col, F.col("__rk") <= n_per_stratum).drop("__rk")
    return ranked.filter(F.col("__rk") <= n_per_stratum).drop("__rk")


def hash_split_fast(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.01,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Two-way train/test split on ``xxhash64`` — the Spark-internal
    fast path (codegen'd JVM hash, no md5 string round-trip). Same
    determinism/growth-stability guarantees as :func:`hash_split`, but
    assignments are only reproducible *inside Spark* — use
    :func:`hash_split` when the split must be recomputable by other
    engines.
    """
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    return df.withColumn(
        split_col,
        F.when(bucket < int(test_frac * 1_000_000), F.lit("test")).otherwise(F.lit("train")),
    )


def sample_fractions(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 0
) -> DataFrame:
    """Per-stratum *fractional* sampling (e.g. per-language quotas when
    rebalancing a corpus) — thin wrapper over ``sampleBy`` so pipelines
    name the intent; map-side filter, no shuffle, approximate counts.
    For an exact n-per-stratum carve-out use :func:`stratified_sample`.
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def dsir_select(
    raw: DataFrame,
    is_target: "Column | str",
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    seed: str = "42",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): pick the ``k`` raw documents whose hashed
    n-gram distribution looks most like a target domain, by importance
    weights under two bag-of-hashed-ngrams models.

    The published recipe exactly: features are unigrams+bigrams hashed
    into ``n_buckets``; the target and raw feature distributions are
    estimated by counting (Laplace ``alpha``); a document's log
    importance weight is Σ_occurrences ln(p_target[b]/p_raw[b]); and
    selection is Gumbel-top-k — adding Gumbel noise to the log weight
    and taking the k largest implements sampling WITHOUT replacement
    proportionally to the importance weights. ``is_target`` is a
    boolean column/expression marking the in-domain examples (both
    classes count into the raw model; the target model uses only
    target rows — DSIR's raw model is the full crawl).

    Determinism end-to-end (reproducible in a SQL oracle): the bucket
    hash and the Gumbel uniform both derive from md5 (bit-identical in
    any engine — see module docstring); per-occurrence log-ratios and
    the Gumbel perturbation are floored to integer micro-nats before
    summation/comparison; ties in the final key break by id.

    Scale shape: ONE corpus explode, pre-aggregated to (doc, bucket)
    counts and checkpointed — both the model estimate (a bucket-key
    rollup to n_buckets rows: metadata-sized, always broadcastable
    since n_buckets is a parameter, not data) and the per-doc weight
    sum read that one materialization, so the corpus is exploded and
    hashed exactly once; the weight join-back is a broadcast; the
    top-k is sort+limit (TakeOrderedAndProject — per-partition heaps,
    no global window); the selected-id set (k rows, bounded) joins
    back as a broadcast semi-join flag. No corpus self-join, no
    unbounded relation on the build side.

    Output: one row per raw doc with ≥1 token — ``(id_col, n_grams,
    logw_micro, gumbel_key_micro, selected)``. Empty docs carry no
    features, hence no weight, and are excluded (published pipelines
    drop them upstream).

    ``k`` is the one scale knob: the selected-id relation is k rows
    and broadcasts for the flag join. For k beyond broadcast comfort
    (~10⁷ ids), swap the flag join for a key threshold — take the
    k-th largest ``gumbel_key_micro`` from an approx-quantile pass
    and flag ``key >= threshold`` map-side; everything upstream is
    unchanged.
    """
    from streamz_spark.operators.text import add_word_kgrams, tokenize

    if k < 1:
        raise ValueError("k must be >= 1")
    y = F.col(is_target) if isinstance(is_target, str) else is_target
    d = add_word_kgrams(raw, text_col, 2, "__w2").select(
        F.col(id_col).alias("id"), y.cast("boolean").alias("y"),
        tokenize(text_col).alias("w1"), F.col("__w2").alias("w2"),
    )
    occ = d.select(
        "id", "y",
        F.explode_outer(F.concat("w1", "w2")).alias("gram"),
    ).filter(F.col("gram").isNotNull()).select(
        "id", "y",
        F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col("gram"))), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("b"),
    )
    # (doc, bucket) pre-aggregate, checkpointed: the model counts AND
    # the per-doc weight sum both read it, so the corpus explode+hash
    # runs exactly once and the second pass is over the (much smaller)
    # doc×bucket relation instead of raw occurrences
    doc_bucket = (
        occ.groupBy("id", "y", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    counts = doc_bucket.groupBy("b").agg(
        F.sum("c").alias("cnt_raw"),
        F.sum(F.when(F.col("y"), F.col("c")).otherwise(0)).alias("cnt_t"),
    )
    totals = counts.agg(
        F.sum("cnt_raw").alias("n_raw"), F.sum("cnt_t").alias("n_t")
    )
    # per-bucket log-ratio, floored to micro-nats ONCE per bucket —
    # n_buckets rows, broadcast to the occurrence stream
    llr = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.floor(
                (
                    F.log(
                        (F.col("cnt_t").cast("double") + F.lit(alpha))
                        / (F.col("n_t").cast("double") + F.lit(alpha) * F.lit(n_buckets))
                    )
                    - F.log(
                        (F.col("cnt_raw").cast("double") + F.lit(alpha))
                        / (F.col("n_raw").cast("double") + F.lit(alpha) * F.lit(n_buckets))
                    )
                ) * 1000000.0
            ).cast("long").alias("llr_micro"),
        )
    )
    logw = (
        doc_bucket.join(F.broadcast(llr), "b")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("llr_micro")).alias("logw_micro"),
        )
    )
    # Gumbel key: g = -ln(-ln(u)), u from the md5 of the doc id —
    # deterministic sampling without replacement ∝ exp(logw)
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed + ":g:"), F.col("id").cast("string"))), 1, 8), 16, 10)
        .cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = logw.withColumn(
        "gumbel_key_micro",
        (F.col("logw_micro") + F.floor(-F.log(-F.log(u)) * 1000000.0).cast("long")),
    )
    # keyed feeds BOTH the top-k and the final flag join-back: without
    # a barrier the doc_bucket⋈llr groupBy chain above runs twice (the
    # plan shows two Exchange+HashAggregate subtrees over the
    # checkpoint). keyed is one row per doc — materializing it is far
    # cheaper than recomputing the weight aggregation.
    keyed = keyed.localCheckpoint(eager=False)
    topk = (
        keyed.orderBy(F.col("gumbel_key_micro").desc(), F.col("id").asc())
        .limit(k)
        .select(F.col("id").alias("__sel_id"))
    )
    return (
        keyed.join(
            F.broadcast(topk.withColumn("__sel", F.lit(True))),
            keyed["id"] == F.col("__sel_id"),
            "left",
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            "logw_micro",
            "gumbel_key_micro",
            F.coalesce(F.col("__sel"), F.lit(False)).alias("selected"),
        )
    )


def select_top_quality(
    df: DataFrame,
    frac: float,
    score_col: str = "quality_score",
    by: str = "source",
    id_col: str = "doc_id",
    method: str = "rank",
) -> DataFrame:
    """Per-group quality pruning — keep the best ``frac`` of documents
    in each ``by`` group ranked by ``score_col`` (the FineWeb-style
    "keep the classifier's top slice per source" selection; also the
    within-domain half of quality-curriculum ordering).

    ``method="rank"`` (default): exact per-group top-``ceil(frac·n_g)``
    via ``row_number`` with a DETERMINISTIC tie-break (score desc, id
    asc) — reproducible in any engine. The cost is a per-group window
    sort of that group's rows: fine when groups are bounded, and the
    honest price of an exact k.

    ``method="threshold"``: per-group exact ``(1−frac)`` percentile
    cutoff (interpolated), keep ``score ≥ cutoff`` — NO corpus window
    sort (one doc-level aggregate exchange, then a broadcast
    group-cardinality cutoff join and a map-side filter). Ties at the
    cutoff inflate the kept count past ``frac·n_g`` — that and the
    interpolated cutoff's last-ulp sensitivity are why the oracle-
    hashed entry pins the rank arm and this arm is property-tested
    (superset-of-rank on ties, per-group fraction within tolerance).
    At 100 TB swap the exact percentile for the mergeable KLL sketch
    (`approx_sketches` benches it) and the cutoff join is unchanged.
    """
    if not (0.0 < frac <= 1.0):
        raise ValueError("frac must be in (0, 1]")
    if method not in ("rank", "threshold"):
        raise ValueError(f"method must be rank|threshold, got {method!r}")
    if method == "rank":
        counts = df.groupBy(F.col(by).alias("__by")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        rn = F.row_number().over(
            W.partitionBy(by).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        )
        return (
            df.withColumn("__rn", rn)
            .join(F.broadcast(counts), F.col(by) == F.col("__by"))
            .where(F.col("__rn") <= F.ceil(F.lit(frac) * F.col("__n")))
            .drop("__rn", "__by", "__n")
        )
    cuts = df.groupBy(F.col(by).alias("__by")).agg(
        F.percentile(score_col, F.lit(1.0 - frac)).alias("__cut")
    )
    return (
        df.join(F.broadcast(cuts), F.col(by) == F.col("__by"))
        .where(F.col(score_col) >= F.col("__cut"))
        .drop("__by", "__cut")
    )


def select_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    tokens_col: str,
    score_col: str = "quality_score",
    by: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy best-first corpus selection under a TOKEN budget — "fill
    a 1T-token training budget with the best documents": rank by
    ``score_col`` (desc, deterministic id tie-break) and keep documents
    while the running token total stays ≤ ``budget_tokens``. With
    ``by`` set, each group gets its own ``budget_tokens`` (the
    per-source variant that pairs with temperature mixing: compute the
    per-source token budgets from
    :func:`temperature_mixture_rates` ppm × total budget, then call
    this per group).

    The running total is an integer cumulative SUM over the quality
    order — associative, engine-exact — so the kept set is
    bit-reproducible in SQL. A document that OVERSHOOTS the budget is
    excluded and selection continues past it is NOT done (strict
    prefix semantics: the kept set is the maximal prefix of the
    quality ordering whose token sum fits). Prefix semantics keep the
    selection a pure window predicate; skip-and-continue greedy
    filling is order-dependent bin packing, not expressible as one
    window, and changes results under re-partitioning.

    Cost: grouped form = one window cumsum per group (per-group sort,
    same honest price as exact ``select_top_quality`` rank). Keyless
    form NEVER runs a single-partition window — it goes through
    ``order.global_cumulative``'s two-level range-partitioned scan
    (within-partition windows in parallel + an exclusive prefix
    combine over partition summaries). The no-sort scale path samples
    a score-vs-token ECDF (KLL sketch) to find the cutoff score, then
    applies it as a broadcast filter — same shape as
    ``select_top_quality``'s threshold arm.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    if by is not None:
        w = (
            W.partitionBy(by)
            .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cum = F.sum(F.col(tokens_col).cast("long")).over(w)
        return (
            df.withColumn("__cum", cum)
            .where(F.col("__cum") <= budget_tokens)
            .drop("__cum")
        )
    from streamz_spark.operators.order import global_cumulative

    out = global_cumulative(
        df.withColumn("__neg_score", -F.col(score_col)).withColumn(
            "__tok", F.col(tokens_col).cast("long")
        ),
        ["__neg_score", id_col],
        "__tok",
        "sum",
        "__cum",
    )
    return (
        out.where(F.col("__cum") <= budget_tokens)
        .drop("__cum", "__neg_score", "__tok")
    )


def temperature_mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    alpha: float = 0.5,
    budget: int | None = None,
    seed: str = "tmix",
    repeat: bool = False,
    copy_col: str = "copy_idx",
    rate_col: str = "rate_ppm",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled domain resampling — the multilingual /
    multi-source mixing rule (mBERT, XLM-R, mT5, PaLM data mixing):
    sample domain ``d`` with probability ``p_d ∝ n_d^alpha``, which
    flattens the natural distribution toward uniform as ``alpha → 0``
    (``alpha = 1`` keeps the natural mix, ``alpha = 0`` is uniform).
    The reference has no model-training data path at all; this is the
    standard knob every large-scale pretraining mix turns.

    Mechanics: per-domain doc counts ``n_d`` (one tiny
    map-side-combinable groupBy); integer micro-weights
    ``w_d = floor(n_d^alpha * 1e6)``; target per-domain share
    ``w_d / W``; acceptance rate for a total document budget ``B``
    (default: corpus size ``N``, i.e. re-mix at constant size)
    ``rate = B * w_d / (W * n_d)``, floored to integer ppm. Every row
    draws a uniform ppm from md5(seed ':' id) — the engine-portable
    hash the rest of this module uses — and keeps iff
    ``draw < rate_ppm``.

    With ``repeat=True`` rates above 1 *upsample by repetition* (the
    way low-resource domains actually get their temperature share:
    epochs, not magic): a row yields ``rate_ppm // 1e6`` full copies
    plus one more iff ``draw < rate_ppm % 1e6``, each tagged with
    ``copy_col``. With ``repeat=False`` rates cap at 1 (pure
    downsampling of over-represented domains).

    Determinism / oracle-portability: ``alpha = 0.5`` uses IEEE-exact
    ``sqrt`` so ``w_d`` is bit-identical in every engine; other alphas
    go through ``pow`` (floored to micro-units, so a last-ulp
    difference would need to land exactly on an integer boundary to
    diverge). All sums are integer sums; the rate is one
    multiply-divide chain over exactly-represented integer doubles,
    identical parenthesization on both sides.

    Scale shape (100 TB): the per-domain table is domain-cardinality
    rows (dozens), broadcast back — the corpus itself sees one narrow
    projection, a broadcast-joined rate lookup, and a map-side
    filter/explode. No corpus shuffle at all.

    Split form for profile-once/apply-at-ingest pipelines:
    :func:`temperature_mixture_rates` computes the rate table from a
    (batch) profile corpus; :func:`apply_mixture_rates` is the
    stateless per-row apply — it also accepts a *streaming* DataFrame
    (stream-static broadcast join + map-side filter/explode), which is
    how a production mix runs: rates from yesterday's profile, applied
    to today's ingest.
    """
    rates = temperature_mixture_rates(
        df,
        domain_col,
        alpha=alpha,
        budget=budget,
        rate_col=rate_col,
        weight_col=weight_col,
    )
    return apply_mixture_rates(
        df,
        rates,
        domain_col,
        id_col=id_col,
        seed=seed,
        repeat=repeat,
        copy_col=copy_col,
        rate_col=rate_col,
    )


def temperature_mixture_rates(
    profile: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
    rate_col: str = "rate_ppm",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-domain acceptance-rate table (ppm) for
    :func:`temperature_mixture_sample` — see there for the math. The
    output is domain-cardinality rows ``(__domain, rate_col)``, meant
    to be broadcast into the apply side.

    ``weight_col`` switches the budget unit from documents to that
    column's mass — pass a token-count column to get TOKEN-budget
    temperature mixing (``p_d ∝ tokens_d^alpha``, the unit production
    mixes actually fix: a domain of few huge docs and a domain of many
    tiny ones are the same "size" when their token masses match).
    Acceptance stays per-row, so expected *mass* per domain meets the
    temperature share while the draw stays a stateless row property.
    """
    dom = F.col(domain_col)
    mass = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long"))
    )
    per = profile.groupBy(dom.alias("__domain")).agg(
        mass.alias("__n_d")
    )
    if alpha == 0.5:
        raw_w = F.sqrt(F.col("__n_d").cast("double"))
    else:
        raw_w = F.pow(F.col("__n_d").cast("double"), F.lit(float(alpha)))
    per = per.withColumn(
        "__w_d", F.floor(raw_w * F.lit(1_000_000.0)).cast("long")
    )
    tot = per.agg(
        F.sum("__n_d").alias("__N"), F.sum("__w_d").alias("__W")
    )
    b_expr = F.lit(int(budget)).cast("double") if budget is not None else F.col("__N").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            rate_col,
            F.floor(
                (b_expr * F.col("__w_d").cast("double"))
                / (F.col("__W").cast("double") * F.col("__n_d").cast("double"))
                * F.lit(1_000_000.0)
            ).cast("long"),
        )
        .select("__domain", rate_col)
    )


def apply_mixture_rates(
    df: DataFrame,
    rates: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    seed: str = "tmix",
    repeat: bool = False,
    copy_col: str = "copy_idx",
    rate_col: str = "rate_ppm",
) -> DataFrame:
    """Apply a :func:`temperature_mixture_rates` table to a batch OR
    streaming DataFrame: broadcast rate lookup + deterministic md5-ppm
    draw + filter (or tagged repetition explode). Stateless per row,
    so the streaming form needs no state store and no watermark, and
    batching can never change the kept-set (the draw depends only on
    the row id).
    """
    dom = F.col(domain_col)
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    joined = df.join(F.broadcast(rates), dom == F.col("__domain")).drop("__domain")
    if not repeat:
        capped = F.least(F.col(rate_col), F.lit(1_000_000).cast("long"))
        return joined.withColumn(rate_col, capped).filter(draw < F.col(rate_col))
    n_copies = (F.col(rate_col) / F.lit(1_000_000)).cast("long") + F.when(
        draw < F.col(rate_col) % 1_000_000, F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    # sequence(0, n-1) with n = 0 would run DESCENDING in Spark
    # (inferred step -1) — filter zero-copy rows out first
    return (
        joined.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") >= 1)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )
