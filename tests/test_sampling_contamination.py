"""hash_split / stratified_sample (operators/sampling.py) and
contamination_check (operators/contamination.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from streamz_spark.operators.contamination import contamination_check
from streamz_spark.operators.sampling import hash_bucket, hash_split, stratified_sample


def _py_bucket(i, seed="42", buckets=10_000):
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) % buckets


class TestHashSplit:
    def test_matches_python_md5(self, spark):
        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        got = {r.id: r.bucket for r in df.select("id", hash_bucket("id").alias("bucket")).collect()}
        assert got == {i: _py_bucket(i) for i in range(500)}

    def test_split_proportions_and_determinism(self, spark):
        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        out = hash_split(df, "id")
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] == pytest.approx(4500, rel=0.05)
        # same rows → same assignment on a second run
        again = {r.id: r.split for r in hash_split(df, "id").collect()}
        first = {r.id: r.split for r in out.collect()}
        assert first == again

    def test_stable_under_growth(self, spark):
        # adding rows must not move existing assignments
        small = hash_split(spark.createDataFrame([(i,) for i in range(100)], "id long"), "id")
        big = hash_split(spark.createDataFrame([(i,) for i in range(200)], "id long"), "id")
        s = {r.id: r.split for r in small.collect()}
        b = {r.id: r.split for r in big.collect()}
        assert all(b[i] == s[i] for i in s)

    def test_no_shuffle_in_plan(self, spark):
        from streamz_spark.plans.inspect import exchange_count

        df = spark.createDataFrame([(i,) for i in range(10)], "id long")
        assert exchange_count(hash_split(df, "id")) == 0


class TestStratifiedSample:
    def test_exact_n_per_stratum(self, spark):
        rows = [(i, "abc"[i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, "id long, g string")
        out = stratified_sample(df, ["g"], 7, "id")
        counts = {r.g: r["count"] for r in out.groupBy("g").count().collect()}
        assert counts == {"a": 7, "b": 7, "c": 7}

    def test_flag_mode_keeps_all_rows(self, spark):
        rows = [(i, "ab"[i % 2]) for i in range(50)]
        df = spark.createDataFrame(rows, "id long, g string")
        out = stratified_sample(df, ["g"], 5, "id", flag_col="sampled")
        assert out.count() == 50
        assert out.filter("sampled").count() == 10

    def test_small_stratum_returns_all(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
        assert stratified_sample(df, ["g"], 10, "id").count() == 2


class TestContamination:
    def test_exact_copy_is_contaminated(self, spark):
        bench_text = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [
                (1, bench_text),                      # exact benchmark copy
                (2, "totally unrelated words here nothing shared at all among these tokens"),
                (3, bench_text + " with a small suffix appended here"),  # superset
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
        out = {r.doc_id: r for r in contamination_check(docs, bench, k=5, threshold=0.5).collect()}
        assert out[1].contaminated and out[1].overlap == 1.0
        assert not out[2].contaminated and out[2].n_hits == 0
        assert out[3].contaminated  # most of its shingles are benchmark shingles

    def test_short_doc_reported_zero(self, spark):
        docs = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
        bench = spark.createDataFrame([(9, "some benchmark text that is long enough ok")],
                                      "doc_id long, text string")
        r = contamination_check(docs, bench, k=5).collect()[0]
        assert r.n_shingles == 0 and r.overlap == 0.0 and not r.contaminated

    def test_corpus_scanned_once_no_self_join(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i} a b c d e f g h i j") for i in range(20)], "doc_id long, text string")
        bench = docs.filter("doc_id < 2")
        out = contamination_check(docs, bench, k=3)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_bloom_prefilter_prunes_but_never_drops_hits(spark):
    """The bloom prefilter must (a) keep every true benchmark hit — no
    false negatives, guaranteed by construction — and (b) actually
    prune most non-hits (~fpp survival), i.e. not be a constant-true
    predicate."""
    from pyspark.sql import functions as F

    from streamz_spark.operators.contamination import _bloom_prune

    posting = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shingle-"), F.col("id")).alias("shingle"),
    )
    bench = spark.range(0, 200).select(
        F.concat(F.lit("shingle-"), F.col("id")).alias("shingle")
    )
    pruned = _bloom_prune(posting, bench, "shingle", expected_items=1000, fpp=0.01)
    kept = {r["doc_id"] for r in pruned.collect()}
    assert set(range(200)) <= kept, "bloom dropped a true hit (false negative)"
    # 19800 non-hits at fpp=0.01 -> ~198 expected survivors; 5x slack
    assert len(kept) - 200 < 1000, f"bloom barely pruned: {len(kept)} rows survived"


def test_dsir_prefers_target_like_documents(spark):
    # DSIR sanity with a known answer: raw pool = target-domain docs
    # (labeled), target-LIKE unlabeled docs, and junk-vocab docs; the
    # importance weight must rank target-like above junk, and the
    # Gumbel-top-k selection must be dominated by target-like docs
    from pyspark.sql import functions as F

    from streamz_spark.operators.sampling import dsir_select

    rows = []
    for i in range(20):  # labeled target domain
        rows.append((i, "science research method experiment data result", True))
    for i in range(20, 40):  # unlabeled, target-like vocabulary
        rows.append((i, "data experiment science result research method", False))
    for i in range(40, 60):  # junk vocabulary
        rows.append((i, "zzz click buy cheap now offer deal win", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = dsir_select(df, "y", k=30, n_buckets=512, seed="7").toPandas()
    assert len(out) == 60 and out.selected.sum() == 30
    w = dict(zip(out.doc_id, out.logw_micro))
    assert min(w[i] for i in range(40)) > max(w[i] for i in range(40, 60))
    sel = set(out[out.selected].doc_id)
    assert len(sel & set(range(40))) >= 28  # junk essentially never sampled


def test_dsir_plan_has_no_global_window(spark):
    # the selection must be sort+limit (TakeOrderedAndProject heaps) +
    # broadcast flag join — never a global row_number window (the
    # single-task anti-pattern operators/order.py exists to avoid)
    from streamz_spark.plans import explain_string
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    from .conftest import SF_DIR

    df = EXTRA_REGISTRY["dsir_importance_resample"].fn(spark, SF_DIR)
    plan = explain_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan, "global window crept into DSIR selection"
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


class TestTemperatureMixture:
    def _docs(self, spark, n=400):
        # skewed domains: 'a' 4x over-represented
        rows = [(i, "a" if i % 8 < 5 else ("b" if i % 8 < 7 else "c")) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, domain string")

    @staticmethod
    def _py_expected(rows, repeat, seed="tmix"):
        import math
        from collections import Counter

        n = Counter(d for _, d in rows)
        total = sum(n.values())
        w = {d: math.floor(math.sqrt(c) * 1e6) for d, c in n.items()}
        wt = sum(w.values())
        rate = {d: math.floor((total * w[d]) / (wt * n[d]) * 1e6) for d in n}

        def draw(i):
            return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) % 1_000_000

        if not repeat:
            return {i for i, d in rows if draw(i) < min(rate[d], 1_000_000)}
        out = {}
        for i, d in rows:
            nc = rate[d] // 1_000_000 + (1 if draw(i) < rate[d] % 1_000_000 else 0)
            if nc:
                out[i] = nc
        return out

    def test_bernoulli_matches_python(self, spark):
        from streamz_spark.operators.sampling import temperature_mixture_sample

        df = self._docs(spark)
        rows = [(r.doc_id, r.domain) for r in df.collect()]
        got = {r.doc_id for r in temperature_mixture_sample(df, "domain").collect()}
        assert got == self._py_expected(rows, repeat=False)

    def test_repeat_matches_python_and_flattens_mix(self, spark):
        from streamz_spark.operators.sampling import temperature_mixture_sample

        df = self._docs(spark)
        rows = [(r.doc_id, r.domain) for r in df.collect()]
        out = temperature_mixture_sample(df, "domain", repeat=True)
        got = {r.doc_id: r["count"] for r in out.groupBy("doc_id").count().collect()}
        exp = self._py_expected(rows, repeat=True)
        assert got == exp
        # the temperature mix flattens: over-represented domain shrinks,
        # under-represented grows, total stays ~budget
        from collections import Counter

        dom = dict(rows)
        natural = Counter(d for _, d in rows)
        mixed = Counter()
        for i, c in exp.items():
            mixed[dom[i]] += c
        assert mixed["a"] < natural["a"]
        assert mixed["c"] > natural["c"]
        assert abs(sum(mixed.values()) - len(rows)) < 0.1 * len(rows)

    def test_copy_idx_dense_per_doc(self, spark):
        from streamz_spark.operators.sampling import temperature_mixture_sample

        df = self._docs(spark)
        out = temperature_mixture_sample(df, "domain", repeat=True)
        bad = (
            out.groupBy("doc_id")
            .agg(
                F.count("*").alias("n"),
                F.min("copy_idx").alias("lo"),
                F.max("copy_idx").alias("hi"),
            )
            .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
            .count()
        )
        assert bad == 0

    def test_corpus_never_shuffles(self, spark):
        # the only exchanges allowed are for the domain-cardinality rate
        # table (groupBy + its 1-row rollup); the corpus path itself is a
        # broadcast-joined narrow filter/explode
        from streamz_spark.operators.sampling import temperature_mixture_sample
        from streamz_spark.plans.inspect import (
            broadcast_join_count,
            exchange_count,
            sort_merge_join_count,
        )

        df = self._docs(spark)
        out = temperature_mixture_sample(df, "domain", repeat=True)
        assert sort_merge_join_count(out) == 0
        assert broadcast_join_count(out) >= 1
        assert exchange_count(out) <= 3

    def test_token_budget_rates(self, spark):
        # weight_col switches the budget unit to token mass: a domain
        # of few huge docs and one of many tiny docs with equal token
        # mass must get equal rates
        import math

        from streamz_spark.operators.sampling import temperature_mixture_rates

        rows = (
            [(i, "big", 1000) for i in range(10)]          # 10 docs x 1000 tok
            + [(100 + i, "small", 10) for i in range(1000)]  # 1000 docs x 10 tok
        )
        df = spark.createDataFrame(rows, "doc_id long, domain string, n_tok long")
        got = {
            r["__domain"]: r["rate_ppm"]
            for r in temperature_mixture_rates(df, "domain", weight_col="n_tok").collect()
        }
        # equal token mass -> equal weights -> equal rates (= budget/2
        # tokens per domain over 10_000 actual tokens each -> 1.0)
        assert got["big"] == got["small"] == 1_000_000
        # python reference for a skewed-mass case
        rows2 = [(1, "a", 900), (2, "b", 100)]
        df2 = spark.createDataFrame(rows2, "doc_id long, domain string, n_tok long")
        got2 = {
            r["__domain"]: r["rate_ppm"]
            for r in temperature_mixture_rates(df2, "domain", weight_col="n_tok").collect()
        }
        w = {d: math.floor(math.sqrt(m) * 1e6) for d, m in (("a", 900), ("b", 100))}
        W = sum(w.values())
        exp = {d: math.floor((1000 * w[d]) / (W * m) * 1e6) for d, m in (("a", 900), ("b", 100))}
        assert got2 == exp


class TestSelectTopQuality:
    def _scored(self, spark):
        from streamz_spark.io import load_table
        from streamz_spark.operators.text import quality_features

        from .conftest import SF_DIR

        docs = load_table(spark, SF_DIR, "documents")
        return quality_features(docs, "text").select(
            "doc_id", "source", "quality_score"
        )

    def test_rank_arm_exact_fraction(self, spark):
        import math

        from streamz_spark.operators.sampling import select_top_quality

        scored = self._scored(spark)
        n_by = {r["source"]: r["n"] for r in
                scored.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        kept = select_top_quality(scored, frac=0.3, method="rank")
        k_by = {r["source"]: r["n"] for r in
                kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert k_by == {s: math.ceil(0.3 * n) for s, n in n_by.items()}

    def test_threshold_arm_superset_of_rank_on_ties(self, spark):
        # the percentile cutoff keeps every row tied AT the cutoff, so
        # the threshold kept-set contains the rank kept-set whenever the
        # rank cut falls inside a tie run; counts are >= exact k and the
        # per-group overshoot is bounded by the cutoff tie count
        from streamz_spark.operators.sampling import select_top_quality

        scored = self._scored(spark)
        rank_ids = {r["doc_id"] for r in
                    select_top_quality(scored, frac=0.3, method="rank")
                    .select("doc_id").collect()}
        thr = select_top_quality(scored, frac=0.3, method="threshold")
        thr_ids = {r["doc_id"] for r in thr.select("doc_id").collect()}
        # rank breaks score-ties by id; threshold keeps all tied rows.
        # every rank-kept row's SCORE is >= the threshold cutoff, so the
        # only allowed difference is tie inflation: thr ⊇ rank
        assert rank_ids <= thr_ids
        # and the inflation is ties-only: every extra doc's score equals
        # some kept doc's score at the boundary (check via score sets)
        import pandas as pd

        sc = scored.toPandas().set_index("doc_id")
        extra = thr_ids - rank_ids
        if extra:
            min_kept_by_src = (
                sc.loc[sorted(rank_ids)].groupby("source")["quality_score"].min()
            )
            for d in extra:
                src, s = sc.loc[d, "source"], sc.loc[d, "quality_score"]
                assert s <= min_kept_by_src[src] + 1e-12

    def test_validation(self, spark):
        from streamz_spark.operators.sampling import select_top_quality

        scored = self._scored(spark)
        with pytest.raises(ValueError):
            select_top_quality(scored, frac=0.0)
        with pytest.raises(ValueError):
            select_top_quality(scored, frac=0.3, method="nope")

    def test_threshold_arm_no_window_sort(self, spark):
        # the scale arm's contract: no Window operator in the plan —
        # one doc-level aggregate + broadcast cutoff join + filter
        from streamz_spark.operators.sampling import select_top_quality
        from streamz_spark.plans import explain_string

        plan = explain_string(
            select_top_quality(self._scored(spark), frac=0.3, method="threshold")
        )
        assert "Window" not in plan, plan
        assert "BroadcastHashJoin" in plan


class TestTokenBudget:
    def _scored(self, spark):
        from streamz_spark.io import load_table
        from streamz_spark.operators.text import quality_features

        from .conftest import SF_DIR

        docs = load_table(spark, SF_DIR, "documents")
        return quality_features(docs, "text").select(
            "doc_id", "source", "n_tokens", "quality_score"
        )

    def test_prefix_semantics_python_reference(self, spark):
        from streamz_spark.operators.sampling import select_to_token_budget

        scored = self._scored(spark)
        pdf = scored.toPandas()
        got = {
            r["doc_id"]
            for r in select_to_token_budget(
                scored, budget_tokens=5000, tokens_col="n_tokens", by="source"
            ).collect()
        }
        want = set()
        for _, grp in pdf.groupby("source"):
            grp = grp.sort_values(
                ["quality_score", "doc_id"], ascending=[False, True]
            )
            total = 0
            for _, r in grp.iterrows():
                total += int(r["n_tokens"])
                if total > 5000:
                    break
                want.add(r["doc_id"])
        assert got == want

    def test_keyless_matches_window_form(self, spark):
        # the two-level distributed scan must equal a naive global
        # window cumsum with the same ordering
        from pyspark.sql import Window as W

        from streamz_spark.operators.sampling import select_to_token_budget

        scored = self._scored(spark)
        got = {
            r["doc_id"]
            for r in select_to_token_budget(
                scored, budget_tokens=20000, tokens_col="n_tokens"
            ).collect()
        }
        w = (
            W.orderBy(F.col("quality_score").desc(), F.col("doc_id").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        want = {
            r["doc_id"]
            for r in scored.withColumn(
                "__c", F.sum(F.col("n_tokens").cast("long")).over(w)
            )
            .where(F.col("__c") <= 20000)
            .collect()
        }
        assert got == want

    def test_keyless_no_single_partition_window(self, spark):
        # plan contract: the keyless arm never sorts the corpus in one
        # partition — no "Window" over an Exchange SinglePartition
        from streamz_spark.operators.sampling import select_to_token_budget
        from streamz_spark.plans import explain_string

        plan = explain_string(
            select_to_token_budget(
                self._scored(spark), budget_tokens=20000, tokens_col="n_tokens"
            )
        )
        import re

        # any SinglePartition exchange feeding a data-row Window is the
        # anti-pattern; the two-level scan's only single-partition step
        # is over <= num_partitions SUMMARY rows (counts), identifiable
        # by its tiny aggregate input — assert the corpus-row window
        # partitions on __pid instead
        assert "partitionBy=[__pid" in plan or "__pid" in plan, plan

    def test_budget_validation(self, spark):
        from streamz_spark.operators.sampling import select_to_token_budget

        with pytest.raises(ValueError):
            select_to_token_budget(
                self._scored(spark), budget_tokens=-1, tokens_col="n_tokens"
            )


def test_contamination_spans_planted_passage(spark):
    # a 10-token benchmark passage planted mid-document must come back
    # as EXACTLY one span covering its token range, and cut_spans must
    # remove exactly those tokens; a clean doc reports nothing
    from streamz_spark.operators.contamination import contamination_spans
    from streamz_spark.operators.dedup import cut_spans

    passage = " ".join(f"bench{i}" for i in range(10))
    prefix = " ".join(f"pre{i}" for i in range(5))
    suffix = " ".join(f"post{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            (1, f"{prefix} {passage} {suffix}"),
            (2, "entirely unrelated words " + " ".join(f"w{i}" for i in range(12))),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(99, passage)], ["doc_id", "text"])
    spans = contamination_spans(docs, bench, k=8).collect()
    assert len(spans) == 1
    s = spans[0]
    # tokens 5..14 are the passage (0-based); k=8 anchors at 5,6,7
    assert (s["doc_id"], s["span_start"], s["span_end"], s["span_len"]) == (1, 5, 14, 10)
    out = {r["doc_id"]: r for r in cut_spans(
        docs, contamination_spans(docs, bench, k=8)
    ).collect()}
    assert out[1]["text_deduped"] == f"{prefix} {suffix}"
    assert out[1]["n_tokens_removed"] == 10
    assert out[2]["text_deduped"] == out[2]["text"]
    assert out[2]["n_tokens_removed"] == 0
