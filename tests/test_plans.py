"""Physical-plan contracts: the scale properties the engine claims are
asserted against the formatted plan, per query family.

If one of these breaks, a 100 TB run regresses from "scan 2 columns,
broadcast the dims, one shuffle" to something that melts the cluster —
that's why they're tests and not documentation.
"""

from __future__ import annotations

import pytest

from streamz_spark.catalog import load_all
from streamz_spark.plans import (
    broadcast_join_count,
    exchange_count,
    pushed_filters,
    read_schema_columns,
    sort_merge_join_count,
)

from .conftest import SF_DIR

from streamz_spark.queries.extra import EXTRA_REGISTRY

REG = {**load_all(), **EXTRA_REGISTRY}


def q(name, spark):
    return REG[name].fn(spark, SF_DIR)


def test_q6_filters_pushed_to_scan(spark):
    df = q("tpch_q6_forecast_revenue", spark)
    pf = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, f"{col} not pushed: {pf}"


def test_q6_column_pruning(spark):
    df = q("tpch_q6_forecast_revenue", spark)
    cols = read_schema_columns(df)
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}, cols


def test_map_select_prunes_unused_columns(spark):
    df = q("map_assign", spark)
    cols = read_schema_columns(df)
    assert "l_comment" not in cols and "l_shipdate" not in cols
    assert {"l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"} <= cols
    assert len(cols) == 5


def test_star_joins_broadcast_no_sort_merge(spark):
    for name in ("tpch_q3_shipping_priority", "join_star_schema"):
        df = q(name, spark)
        assert broadcast_join_count(df) >= 2, name
        assert sort_merge_join_count(df) == 0, f"{name} fell back to sort-merge"


def test_q5_dimension_pruning_before_fact_joins(spark):
    """Round-8 q5 contract: the ASIA restriction reaches supplier AND
    customer through broadcast joins BEFORE the fact joins, and the
    fact-fact (lineitem ⋈ orders) join stays UNHINTED — statically a
    sort-merge join that AQE is free to convert at runtime (a hard
    broadcast hint on a fact-sized side is an OOM at the 100 TB
    target, see the catalog doc)."""
    df = q("tpch_q5_local_supplier_volume", spark)
    # nation⋈region, supplier⋈asia, customer semi-join asia
    assert broadcast_join_count(df) >= 3
    # exactly the one deliberate fact-fact sort-merge join, no more
    assert sort_merge_join_count(df) <= 1


def test_range_join_is_equi_not_nested_loop(spark):
    from streamz_spark.plans import explain_string

    df = q("range_join_bands", spark)
    plan = explain_string(df)
    assert "BroadcastNestedLoopJoin" not in plan, "range join fell back to nested loop"
    assert "CartesianProduct" not in plan


def test_range_join_bucketized_matches_theta(spark):
    from pyspark.sql import functions as F

    from streamz_spark.io import load_table
    from streamz_spark.operators import joins as ops

    ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
    bands = spark.range(0, 10).select(
        F.col("id").alias("band"),
        (F.col("id") * 100.0).alias("lo"),
        ((F.col("id") + 1) * 100.0).alias("hi"),
    )
    theta = ops.range_join(ev, bands, "value", "lo", "hi").select("event_id", "band")
    bucketed = ops.range_join(ev, bands, "value", "lo", "hi", bucket_width=100.0).select(
        "event_id", "band"
    )
    assert theta.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(theta).count() == 0


def test_no_broadcast_hint_on_sf_scaled_tables(spark):
    # Only nation (25 rows) and region (5 rows) are scale-invariant;
    # every other star-schema table grows with sf. A hard-coded broadcast
    # hint on an sf-scaled table (customer is 15B rows at the 100 TB
    # target) is a guaranteed OOM, so the star queries may hint ONLY
    # nation/region; AQE decides everything else at runtime.
    expected = {
        "tpch_q3_shipping_priority": 0,   # no scale-invariant dims in q3
        # round-8 shape: broadcast(region) onto nation builds `asia`
        # (<= 25 rows, scale-invariant), then broadcast(asia) onto
        # supplier AND customer; `asia`'s inner region hint re-appears
        # under each use in the analyzed plan, hence 4 hint nodes —
        # every hinted relation is still nation/region-derived
        "tpch_q5_local_supplier_volume": 4,
        "join_star_schema": 1,            # nation
        "tpch_q7_volume_shipping": 2,     # nation x2
        "tpch_q8_market_share": 3,        # nation x2 + region
        "tpch_q10_returned_items": 1,     # nation
        "tpch_q13_customer_distribution": 0,
        "tpch_q14_promo_effect": 0,       # part scales with sf
        "tpch_q17_small_quantity": 0,
        "tpch_q18_large_volume": 0,
        "tpch_q15_top_supplier": 1,   # 1-row MAX aggregate
        "tpch_q22_quiet_customers": 2,  # 1-row AVG aggregate + nation
    }
    # what may legitimately sit under a hint: fixed-size dims, or a
    # scalar/grouped aggregate collapsed to O(1) rows
    scale_invariant = ("nation", "region", "aggregate")
    for name, n_expected in expected.items():
        df = q(name, spark)
        logical = df._jdf.queryExecution().analyzed().toString()
        n_hints = logical.count("ResolvedHint")
        assert n_hints == n_expected, f"{name}: {n_hints} hints, expected {n_expected}"
        # each hint subtree must reference a scale-invariant table within
        # the next few plan lines (the hinted relation is a direct child)
        lines = logical.splitlines()
        for i, line in enumerate(lines):
            if "ResolvedHint" in line:
                subtree = " ".join(lines[i : i + 4]).lower()
                assert any(t in subtree for t in scale_invariant), (
                    f"{name}: broadcast hint on non-scale-invariant table: {subtree[:200]}"
                )


def test_extra_tpch_no_cartesian_or_nested_loop(spark):
    # the multi-join extras must never degrade to a cartesian product
    # or nested-loop join — at 100 TB either is a cluster-melter
    from streamz_spark.plans import explain_string

    for name in (
        "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
        "tpch_q7_volume_shipping", "tpch_q8_market_share",
        "tpch_q9_product_profit", "tpch_q10_returned_items",
        "tpch_q12_late_priority", "tpch_q13_customer_distribution",
        "tpch_q16_supplier_counts", "tpch_q17_small_quantity",
        "tpch_q18_large_volume", "tpch_q19_disjunctive_revenue",
        "tpch_q20_promotion_suppliers", "tpch_q21_waiting_suppliers",
    ):
        plan = explain_string(q(name, spark))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # q22 and q11 are exempt from the nested-loop check: their
    # condition-less joins against the broadcast 1-row scalar aggregate
    # (AVG acctbal / 0.1%-of-total threshold) plan as
    # BroadcastNestedLoopJoin — the standard physical form of a scalar
    # subquery, O(rows x 1), scale-safe. A cartesian would still be a bug.
    for name in ("tpch_q22_quiet_customers", "tpch_q11_important_parts"):
        plan = explain_string(q(name, spark))
        assert "CartesianProduct" not in plan, name


def test_groupby_has_partial_aggregation(spark):
    from streamz_spark.plans import explain_string

    df = q("groupby_multi_agg", spark)
    plan = explain_string(df)
    assert "partial_sum" in plan or "partial_" in plan, "no map-side combine before shuffle"


def test_single_shuffle_for_keyed_window(spark):
    # one Exchange (hash by user_id) should cover all the window aggs
    df = q("rolling_windows", spark)
    assert exchange_count(df) == 1


def test_filter_pushdown_events(spark):
    df = q("filter_query_pluck", spark)
    pf = " ".join(pushed_filters(df))
    assert "value" in pf and "event_type" in pf


def test_partition_pruning_on_partitioned_layout(spark, tmp_path_factory):
    """Hive-partitioned layout: a partition-key filter must prune at
    planning time (PartitionFilters), reading only matching directories —
    the layout knob that turns a 100 TB scan into a 1 TB scan."""
    import os

    from streamz_spark.io import load_table
    from streamz_spark.plans.inspect import explain_string

    out = str(tmp_path_factory.mktemp("part")) + "/events_by_type"
    ev = load_table(spark, SF_DIR, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter("event_type = 'purchase'").select("event_id", "value")
    plan = explain_string(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    # count matches the unpartitioned filter
    want = ev.filter("event_type = 'purchase'").count()
    assert df.count() == want


def test_ngram_pair_generation_plan_shape(spark):
    # the posting-array rewrite's contract: pair generation carries
    # exactly two hash-partition exchanges (shingle groupBy, pair
    # groupBy), the size joins broadcast, and nothing degrades to a
    # sort-merge or cartesian — the shape that keeps a hot shingle an
    # array-length problem instead of a join-key hotspot at scale
    from streamz_spark.plans import explain_string

    plan = explain_string(q("ngram_jaccard_pairs", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan.count(
        "Exchange hashpartitioning"
    )


def test_bm25_plan_shape(spark):
    # BM25's scale contract: the df-count and corpus-scalar sides join
    # by BROADCAST (never sort-merge — both are tiny by construction),
    # no cartesian blowup beyond the 1-row scalar cross-join, and the
    # only hash exchanges are the df-count aggregate and the per-term
    # ranking window — the corpus itself never shuffles on a token key
    from streamz_spark.plans import explain_string

    plan = explain_string(q("bm25_term_topk", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 3, n_ex


def test_domain_mixture_plan_shape(spark):
    # one partial+final aggregate pair on the tiny domain key, totals
    # via broadcast — a full corpus scan feeds a partial aggregate in
    # every task and only |domains| rows ever cross the wire
    from streamz_spark.plans import explain_string

    plan = explain_string(q("domain_mixture_weights", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan  # map-side combine engaged
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 2, n_ex


def test_unigram_nll_plan_shape_broadcast_arm(spark):
    # small-LM arm (vocab_limit bounds the LM ≤ broadcast_limit): the
    # LM joins back by BROADCAST, the per-doc total is a map-side-
    # combinable groupBy (no window sort), bounded exchanges, and the
    # corpus never sort-merges or goes cartesian
    from streamz_spark.plans import explain_string

    plan = explain_string(q("unigram_nll_quality", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial_" in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 3, n_ex


def test_unigram_nll_plan_shape_shuffle_arm(spark):
    # large-LM arm (a 100 TB whitespace vocab is 1e8-1e9 terms — past
    # any broadcast): the LM join degrades to a SHUFFLED HASH join on
    # term (never a sort of the exploded corpus, never cartesian), and
    # exchanges stay bounded — the plan the same query runs when the
    # size dispatch picks the big-vocab arm
    from streamz_spark.io import load_table
    from streamz_spark.operators.text import unigram_nll_quality
    from streamz_spark.plans import explain_string

    df = unigram_nll_quality(
        load_table(spark, SF_DIR, "documents"), lm_join="shuffle"
    )
    plan = explain_string(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 4, n_ex


def test_unigram_nll_shuffle_arm_matches_broadcast_arm(spark):
    # both dispatch arms are the same function — pin value-identity
    # (integer micro-nat determinism makes this an exact compare)
    from streamz_spark.io import load_table
    from streamz_spark.operators.text import unigram_nll_quality

    docs = load_table(spark, SF_DIR, "documents")
    a = unigram_nll_quality(docs, vocab_limit=20, lm_join="broadcast").toPandas()
    b = unigram_nll_quality(docs, vocab_limit=20, lm_join="shuffle").toPandas()
    cols = sorted(a.columns)
    a = a.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    b = b.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    assert a.equals(b)


def test_duplicated_spans_plan_shape(spark):
    # span dedup's scale contract: NO join of any kind (the occurrence
    # count is a whole-partition window over the gram-hash key, so the
    # corpus is scanned and k-grammed exactly ONCE — one parquet scan
    # node in the whole plan), no cartesian, and exchanges bounded at
    # three (scan fan-out, gram hash, doc key) — the shape that keeps
    # a 10^6-occurrence boilerplate gram a linear spilled sort key
    from streamz_spark.plans import exchange_count, explain_string

    import re

    df = q("exact_substring_spans", spark)
    plan = explain_string(df)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan  # matches every join operator name
    # one scan node — formatted explain lists each node in the tree AND
    # a detail section, so count the numbered detail headers
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans
    assert exchange_count(df) <= 3, exchange_count(df)


def test_pretrain_pipeline_plan_shape(spark):
    # the composed end-to-end pipeline (now 9 stages: quality+lang-id
    # -> filter -> exact dedup -> minhash-LSH fuzzy dedup + CC ->
    # decontamination -> span removal -> split -> BPE meter) keeps
    # every stage's individual contract. Two shapes are pinned:
    #
    # (a) the production entry truncates at two measured
    #     materialization barriers (post-filter corpus, post-decont
    #     corpus); its visible plan is the span/split/meter tail —
    #     broadcast-joins-only, <= 3 exchanges (gram hash, doc key,
    #     + the barrier's own coalesce if any);
    # (b) the uncheckpointed composition exposes all stages in ONE
    #     lazy plan: never a cartesian/nested-loop product, and every
    #     sort-merge join is one of exactly two sanctioned shapes —
    #     the cluster-size annotate on the component key (tiny
    #     per-cluster relation, AQE-broadcast at runtime) and the
    #     doc_id ANTI-join applying a dedup/decontamination drop-list
    #     (the one join a web-scale dedup legitimately shuffles: the
    #     drop-list can be 30-50% of the corpus, so it must be free
    #     to shuffle on the doc key, with AQE broadcasting whenever
    #     it is actually small).
    import re

    from streamz_spark.plans import exchange_count, explain_string
    from streamz_spark.queries.extra import _build_pretrain_pipeline

    df = q("pretrain_corpus_pipeline", spark)
    plan = explain_string(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert exchange_count(df) <= 3, exchange_count(df)

    full = _build_pretrain_pipeline(spark, SF_DIR, checkpoint=False)
    fplan = explain_string(full)
    assert "CartesianProduct" not in fplan
    assert "BroadcastNestedLoopJoin" not in fplan
    assert "partial_" in fplan  # map-side combine on the aggregates
    smjs = re.findall(
        r"\(\d+\) SortMergeJoin[^\n]*\n"
        r"Left keys \[\d+\]: \[([^\]#]*)[^\]]*\]\n"
        r"Right keys \[\d+\]: \[[^\]]*\]\n"
        r"Join type: (\w+)",
        fplan,
    )
    assert smjs, "expected the sanctioned sort-merge joins in the full plan"
    for key, jtype in smjs:
        assert (key.strip(), jtype) in {
            ("component", "Inner"),
            ("doc_id", "LeftAnti"),
        }, (key, jtype)


def test_unigram_nll_auto_dispatch_counts_vocab(spark):
    # the auto arm with NO vocab cap must measure the checkpointed
    # freq relation and degrade to the shuffle join when the vocab
    # exceeds broadcast_limit — pin both the dispatch decision (plan)
    # and value identity with the broadcast arm
    from streamz_spark.io import load_table
    from streamz_spark.operators.text import unigram_nll_quality
    from streamz_spark.plans import explain_string

    docs = load_table(spark, SF_DIR, "documents")
    # corpus vocab (~31 terms) > broadcast_limit=1 -> auto picks shuffle
    df = unigram_nll_quality(docs, lm_join="auto", broadcast_limit=1)
    plan = explain_string(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    a = df.toPandas().sort_values("doc_id", ignore_index=True)
    b = (
        unigram_nll_quality(docs, lm_join="broadcast")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a.equals(b)


def test_dedup_exact_single_scan_single_exchange(spark):
    # exact dedup must be one corpus scan + one md5-key exchange with
    # a rank-1 window — the min-table join-back alternative re-scans
    # the corpus and sort-merges it once distinct fingerprints outgrow
    # broadcast (which is always, at corpus scale)
    import re

    from streamz_spark.plans import exchange_count, explain_string

    df = q("dedup_exact", spark)
    plan = explain_string(df)
    assert "Join" not in plan, plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans
    assert exchange_count(df) == 1, exchange_count(df)


def test_semdedup_plan_shape(spark):
    # SemDeDup's contract: centroid assignment is ONE broadcast of the
    # single packed-centroid row (plans as a 1-row BroadcastNestedLoop
    # crossJoin — the sanctioned use: the inner side is exactly one
    # row, so "nested loop" degenerates to a map-side projection) plus
    # a narrow argmin; the corpus is scanned once (the assigned frame
    # is persisted for both self-join sides); the only data shuffles
    # are the cell-key self-join and the drop-list join-back. Never a
    # CartesianProduct over sf-scaled relations.
    import re

    from streamz_spark.queries.extra import EXTRA_REGISTRY
    from streamz_spark.plans import exchange_count, explain_string

    df = EXTRA_REGISTRY["semdedup_embedding"].fn(spark, SF_DIR)
    plan = explain_string(df)
    assert "CartesianProduct" not in plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans
    assert exchange_count(df) <= 5, exchange_count(df)


def test_nb_classifier_plan_and_dispatch(spark):
    # the NB classifier keeps unigram_nll's scale contract: bounded
    # exchanges, size-dispatched model join with value identity
    # between the broadcast and shuffle arms, no corpus sort-merge
    from pyspark.sql import functions as F

    from streamz_spark.io import load_table
    from streamz_spark.operators.text import nb_quality_classifier
    from streamz_spark.plans import explain_string

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "__y", F.col("lang") == "en"
    )
    bcast = nb_quality_classifier(docs, "__y", vocab_limit=20, lm_join="broadcast")
    plan = explain_string(bcast)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # vocab > broadcast_limit=1 -> auto degrades to the shuffle join
    shuf = nb_quality_classifier(
        docs, "__y", vocab_limit=20, lm_join="auto", broadcast_limit=1
    )
    splan = explain_string(shuf)
    assert "ShuffledHashJoin" in splan, splan
    assert "SortMergeJoin" not in splan
    a = bcast.toPandas().sort_values("doc_id", ignore_index=True)
    b = shuf.toPandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_dedup_paragraphs_single_scan_two_exchanges(spark):
    # paragraph dedup must keep dedup_exact's rank-1 shape at paragraph
    # granularity: one corpus scan, the md5(paragraph)-key window
    # exchange plus the doc-key reassembly exchange, and NO join — a
    # first-occurrence min-table joined back would re-scan and
    # re-shuffle the exploded paragraph relation
    import re

    from streamz_spark.plans import explain_string

    df = q("dedup_paragraphs", spark)
    plan = explain_string(df)
    assert "Join" not in plan, plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans
    assert exchange_count(df) == 2, exchange_count(df)


def test_pretrain_pipeline_barrier_shapes_agree(spark):
    # BENCH_NOTES round-6 follow-up A/B: the production entry keeps the
    # post-filter first barrier (wins at sf0.1); the 100 TB shape moves
    # it post-dedup so the rank-1 window's three consumers read a
    # materialization. Both one flag apart, and bit-identical.
    from streamz_spark.queries.extra import _build_pretrain_pipeline

    a = (
        _build_pretrain_pipeline(spark, SF_DIR, first_barrier="filter")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        _build_pretrain_pipeline(spark, SF_DIR, first_barrier="dedup")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a.equals(b)


def test_stupid_backoff_plan_shape_broadcast_arm(spark):
    # capped-LM arm: the bigram pair table and the derived unigram
    # table are localCheckpointed (the corpus aggregates once), the
    # three LM joins back by BROADCAST, the per-doc total is a
    # map-side-combinable groupBy — no sort-merge of the exploded
    # corpus, no cartesian, exchanges bounded
    from streamz_spark.plans import explain_string

    plan = explain_string(q("stupid_backoff_nll", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 3, n_ex


def test_stupid_backoff_plan_shape_shuffle_arm(spark):
    # uncappable-LM arm (a 100 TB bigram type table is ~1e10 rows —
    # past any broadcast): every LM join degrades to SHUFFLED HASH
    # (never a sort of the exploded corpus, never cartesian). This is
    # the documented safety arm; the production configuration caps
    # both LMs and broadcasts.
    from streamz_spark.io import load_table
    from streamz_spark.operators.text import stupid_backoff_nll_quality
    from streamz_spark.plans import explain_string

    df = stupid_backoff_nll_quality(
        load_table(spark, SF_DIR, "documents"), lm_join="shuffle"
    )
    plan = explain_string(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_stupid_backoff_shuffle_arm_matches_broadcast_arm(spark):
    # both dispatch arms are the same function — integer micro-nats
    # make this an exact compare
    from streamz_spark.io import load_table
    from streamz_spark.operators.text import stupid_backoff_nll_quality

    docs = load_table(spark, SF_DIR, "documents")
    kw = dict(vocab_limit=50, bigram_limit=500)
    a = stupid_backoff_nll_quality(docs, lm_join="broadcast", **kw).toPandas()
    b = stupid_backoff_nll_quality(docs, lm_join="shuffle", **kw).toPandas()
    cols = sorted(a.columns)
    a = a.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    b = b.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    assert a.equals(b)


def test_corpus_data_card_plan_shape(spark):
    # data card contract: the corpus feeds two map-side-combinable
    # aggregates ((source, lang) stats + the exact-percentile pass);
    # everything downstream is source-cardinality — broadcast joins
    # only, no sort-merge of the corpus, no cartesian
    from streamz_spark.plans import explain_string

    plan = explain_string(q("corpus_data_card", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 4, n_ex


def test_corpus_diff_plan_shape(spark):
    # the diff shuffles 32-byte digests, not bodies: both scans must
    # prune to (doc_id, text) — lang/source/n_chars never read — and
    # the only join is the id-key full-outer (no cartesian)
    from streamz_spark.plans import explain_string, read_schema_columns

    df = q("corpus_diff_versions", spark)
    plan = explain_string(df)
    assert "CartesianProduct" not in plan
    cols = set(read_schema_columns(df))
    assert "lang" not in cols and "n_chars" not in cols, cols


def test_skew_profile_plan_shape(spark):
    # one map-side-combinable key groupBy, bounded TakeOrdered top-N,
    # broadcast total — no sort-merge, no cartesian, <= 2 exchanges
    from streamz_spark.plans import explain_string

    plan = explain_string(q("skew_profile_events", spark))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan
    assert "TakeOrderedAndProject" in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 2, n_ex


def test_hybrid_rrf_plan_shape(spark):
    # hybrid RRF contract: both arms end in bounded TakeOrdered (no
    # corpus-wide global sort); the per-doc BM25 sum is map-side
    # combinable; corpus scalars / dfreq / query vector ride in as
    # broadcasts — no sort-merge join of the corpus anywhere. The
    # rank windows are legal ONLY because they run over the <= arm_n
    # TakeOrdered outputs.
    from streamz_spark.plans import explain_string

    plan = explain_string(q("hybrid_rrf_retrieval", spark))
    # the ONLY sort-merge join allowed is the FullOuter fusion of the
    # two TakeOrdered arm outputs (<= arm_n rows each, bounded by
    # construction) — the corpus itself must never sort-merge
    smj_tree_lines = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln and ("+-" in ln or ":-" in ln)
    ]
    assert all("FullOuter" in ln for ln in smj_tree_lines), smj_tree_lines
    assert "TakeOrderedAndProject" in plan
    assert "partial_" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_quality_funnel_plan_shape(spark):
    # funnel contract: one narrow boolean projection + one 1-row
    # global aggregate (map-side partial) + a 1-row unpivot — the
    # corpus never hash-shuffles, no join, no window, scan count 1
    from streamz_spark.plans import explain_string

    import re

    plan = explain_string(q("quality_funnel", spark))
    assert "partial_" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "Window" not in plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans


def test_contamination_spans_plan_shape(spark):
    # cross-corpus asymmetry contract: the benchmark side collapses to
    # a distinct gram set and BROADCASTS into a semi-join, so the doc
    # anchors never shuffle on the gram key — the only gh exchange in
    # the plan is the benchmark-sized distinct (under the broadcast),
    # and the only corpus exchange is the doc-key merge. No SMJ.
    from streamz_spark.plans import explain_string

    plan = explain_string(q("contamination_spans", spark))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert plan.count("hashpartitioning(gh") == 1, plan
    assert plan.count("hashpartitioning(id") == 1, plan


def test_source_overlap_cutoff_plan_shape(spark):
    # max_sources cut contract: the high-df cut-list is a map-side-
    # combinable hash aggregate broadcast-ANTI-joined away — never a
    # Window (exchange+SORT) over the corpus-sized (source, shingle)
    # relation, which is exactly the fan-out regime the cut exists for
    from streamz_spark.operators.quality import source_overlap
    from streamz_spark.plans import explain_string
    from streamz_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").selectExpr(
        "doc_id", "concat('s', doc_id % 7) AS source", "text"
    )
    plan = explain_string(source_overlap(docs, k=3, max_sources=3))
    assert "Window" not in plan, "df-cutoff regressed to a corpus-sized Window"
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "partial_count" in plan  # cut-list agg combines map-side


def test_source_overlap_cutoff_shuffle_arm_plan_shape(spark):
    # size-dispatch shuffle arm (round-7 VERDICT #4): a pathologically
    # large >max_sources cut-list must NOT become a driver-pressure
    # broadcast — hot_join="shuffle" (what auto picks past
    # hot_broadcast_limit) anti-joins via shuffle_hash: both sides
    # exchange on the shingle key, no sort, no broadcast of the hot set
    from streamz_spark.operators.quality import source_overlap
    from streamz_spark.plans import explain_string
    from streamz_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").selectExpr(
        "doc_id", "concat('s', doc_id % 7) AS source", "text"
    )
    plan = explain_string(
        source_overlap(docs, k=3, max_sources=3, hot_join="shuffle")
    )
    assert "Window" not in plan
    assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
    # the anti-join side must not be broadcast (totals broadcasts remain)
    assert not any(
        "BroadcastHashJoin" in ln and "LeftAnti" in ln
        for ln in plan.splitlines()
    )


def test_perplexity_buckets_single_scoring_pass(spark):
    # the scored+lang frame feeds BOTH the per-language tercile cut
    # aggregate and the final classify join; the round-8 barrier makes
    # both consumers read one materialization instead of evaluating
    # the whole NLL scoring chain twice (the pre-fix plan carried two
    # full copies of the subtree — 4 parquet scans for 2 logical
    # passes). Contract: the final plan reads the checkpointed frame
    # (ExistingRDD), never re-derives scores from parquet, and the
    # classify side stays a broadcast of the tiny cut table.
    import re

    from streamz_spark.plans import explain_string

    plan = explain_string(q("perplexity_buckets", spark))
    assert "ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert len(re.findall(r"Generate explode", plan)) == 0
    assert "SortMergeJoin" not in plan


def test_bm25_single_corpus_tokenize_pass(spark):
    # the query-term postings frame (tiny: only rows matching |terms|
    # query terms survive the array_intersect explode) feeds BOTH the
    # df aggregate and the scored join; the round-8 barrier makes both
    # read one materialization instead of each re-running the corpus
    # tokenize. Contract: the final plan reads the checkpointed frame
    # (ExistingRDD) and scans parquet exactly once (the documented
    # narrow scalars pass) — the pre-fix plan carried three scans, two
    # of them full tokenize+explode subtrees.
    import re

    from streamz_spark.plans import explain_string

    plan = explain_string(q("bm25_term_topk", spark))
    assert "ExistingRDD" in plan
    assert len(re.findall(r"Location:", plan)) == 1
    # the surviving scan is the scalars pass: no explode on it
    assert "Generate" not in plan


def test_hybrid_rrf_single_corpus_tokenize_pass(spark):
    # same contract for the bm25 arm embedded in hybrid RRF: one
    # documents scan (scalars) + the checkpointed postings; the vector
    # arm's two embeddings scans (corpus + 1-row query vector) remain.
    import re

    from streamz_spark.plans import explain_string

    plan = explain_string(q("hybrid_rrf_retrieval", spark))
    assert "ExistingRDD" in plan
    docs_scans = len(re.findall(r"Location:.*documents\.parquet", plan))
    assert docs_scans == 1, f"expected 1 documents scan, got {docs_scans}"
    assert "Generate" not in plan


def test_ngram_udf_never_reevaluated_in_filters(spark):
    # The compiled NGram gram-builder (add_word_kgrams) is the dominant
    # per-row cost of the shingle family. Catalyst duplicates it into
    # Filter conditions two ways: InferFiltersFromGenerate adds
    # size(expr)>0 AND isnotnull(expr) below non-outer explodes, and
    # caller filters like size(sh)>0 get pushed below the gram Project.
    # Both re-evaluate the UDF per row (guide §4.4 shape, measured up to
    # ~2x per-entry CPU at r08). The operators avoid this with outer
    # generators + output-null filters and cheap token-count pre-filters;
    # this contract keeps it that way.
    from streamz_spark.plans import explain_string

    for name in (
        "minhash_near_duplicates",
        "ngram_jaccard_pairs",
        "incremental_dedup_vs_index",
        "contamination_check",
        "contamination_bloom",
        "contamination_spans",
        "decontaminate_corpus",
        "exact_substring_spans",
        "dedup_spans_removed",
        "dsir_importance_resample",
        "boilerplate_common_shingles",
        "source_overlap_capped",
    ):
        plan = explain_string(q(name, spark))
        offenders = [
            line.strip()[:160]
            for line in plan.splitlines()
            if ("Condition" in line or "Filter" in line) and "UDF(" in line
        ]
        assert not offenders, f"{name}: NGram UDF inside Filter: {offenders}"
