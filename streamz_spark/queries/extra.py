"""Extra catalog: bench/test-verified queries BEYOND the driver's 50.

The driver evaluates at most 50 registry entries, so the main
catalog (streamz_spark.queries.__init__) is pinned to exactly 50 —
one per SURVEY.md §2 operator family. Everything here registers into
a SEPARATE registry consumed by bench.py and tests only: importing
this module never contaminates the driver's set.

Contents (74 entries): the complete adapted TPC-H tail
(q2/q4/q7-q22 — no partsupp, no commit/receipt dates, 1995-2001 date
range, synthetic NATION_N names), the distributed
connected-components variant, and the LLM-data operator families
(windows/skew/array extras, ExactSubstr spans + removal, paragraph
dedup, BM25/unigram-NLL/stupid-backoff LM scoring, DSIR, temperature
mixing, BPE tokenizer, SemDeDup, quality pruning + token-budget
selection, incremental dedup vs index, corpus data card, the composed
pretraining pipeline, hybrid BM25+vector RRF retrieval, the
cross-source overlap matrix, the quality-funnel attrition report, and
span-level targeted decontamination). Each carries a DuckDB oracle checked by
tests/test_extra_queries.py with the same rows+schema+hash comparison
the driver applies to the main 50 (declared-iterative entries are
rows-only + determinism-barred).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import QueryDef
from streamz_spark.io import load_table

EXTRA_REGISTRY: dict[str, QueryDef] = {}


def register_extra(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        EXTRA_REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# --------------------------------------------------------------------------
# distributed connected components (bench entry for the 100 TB code path)
# --------------------------------------------------------------------------

def _dedup_clusters_oracle() -> str:
    from streamz_spark.queries.dedup_queries import _DEDUP_CLUSTERS_ORACLE

    return _DEDUP_CLUSTERS_ORACLE


@register_extra(
    "dedup_clusters_distributed",
    oracle=None,  # filled lazily below (module-load order)
    doc="same fixpoint as dedup_clusters but forcing the distributed "
        "large-star/small-star path — the code path that runs when the "
        "edge list exceeds the driver union-find cutoff (the 100 TB "
        "path), kept benchmarked and oracle-checked at every sf",
)
def dedup_clusters_distributed(spark, sf_dir):
    from streamz_spark.operators import dedup as dd
    from streamz_spark.operators.components import dedup_clusters as dc

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=50)
    return dc(docs, pairs, mode="distributed")


EXTRA_REGISTRY["dedup_clusters_distributed"] = QueryDef(
    name="dedup_clusters_distributed",
    fn=EXTRA_REGISTRY["dedup_clusters_distributed"].fn,
    oracle=_dedup_clusters_oracle(),
    doc=EXTRA_REGISTRY["dedup_clusters_distributed"].doc,
)


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination — identical results, 100 TB join diet
# --------------------------------------------------------------------------

def _contamination_oracle() -> str:
    from streamz_spark.catalog import load_all

    return load_all()["contamination_check"].oracle


@register_extra(
    "contamination_bloom",
    oracle=None,  # filled below — identical to the exact path's oracle
    doc="contamination_check with bloom_prefilter=True: a broadcast "
        "bloom_filter_agg sketch of the benchmark shingles prunes the "
        "corpus posting list before the hit join (no false negatives; "
        "false positives die in the verify join) — identical output to "
        "the exact path with ~99% less join input at corpus scale",
)
def contamination_bloom(spark, sf_dir):
    from pyspark.sql import functions as FF

    from streamz_spark.operators.contamination import contamination_check as cc

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(FF.col("doc_id") % 97 == 0)
    out = cc(docs, bench, k=7, threshold=0.5, bloom_prefilter=True,
             bloom_expected_items=500_000)
    return out.select(
        "doc_id",
        FF.col("n_shingles").cast("long").alias("n_shingles"),
        "n_hits", "overlap", "contaminated",
    )


EXTRA_REGISTRY["contamination_bloom"] = QueryDef(
    name="contamination_bloom",
    fn=EXTRA_REGISTRY["contamination_bloom"].fn,
    oracle=_contamination_oracle(),
    doc=EXTRA_REGISTRY["contamination_bloom"].doc,
)


# --------------------------------------------------------------------------
# TPC-H q7 — volume shipping between two nations by ship year
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                   AND TIMESTAMP '1997-12-31 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (adapted dates/nations): bidirectional nation-pair "
        "revenue flow by year. Broadcast hints only on the two nation "
        "branches (25 rows, scale-invariant); fact joins left to AQE. "
        "Round-8: the two-nation restriction is applied to supplier AND "
        "customer BEFORE the fact joins (2/25 selectivity — Catalyst "
        "won't pull the pair predicate back through four joins), so the "
        "lineitem x supplier output shrinks ~12x before the orders "
        "shuffle; the bidirectional (s,c) pair filter still applies "
        "after the customer join",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(pair))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(pair))
    sup2 = supplier.join(
        F.broadcast(n1), supplier.s_nationkey == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust2 = customer.join(
        F.broadcast(n2), customer.c_nationkey == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    return (
        li.join(sup2, li.l_suppkey == sup2.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust2, orders.o_custkey == cust2.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# TPC-H q8 — market share of one supplier nation in a region's market
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q8_market_share",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
            JOIN region r   ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
              AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                    AND TIMESTAMP '1997-12-31 00:00:00'
        ) all_nations
        GROUP BY o_year
    """,
    doc="TPC-H Q8 (adapted): NATION_3's share of ASIA's ECONOMY-part "
        "market by order year — 8-table join, conditional-sum ratio. "
        "Hints only on nation/region; part/customer/supplier scale "
        "with sf and are left to AQE",
)
def tpch_q8_market_share(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# TPC-H q10 — returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    doc="TPC-H Q10 (adapted quarter): revenue lost to returns per "
        "customer, top-20. Hint only on nation; top-k via "
        "TakeOrderedAndProject (no global sort)",
)
def tpch_q10_returned_items(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H q13 — customer order-count distribution
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    doc="TPC-H Q13: orders-per-customer histogram — orders PRE-AGGREGATE "
        "to (custkey, count) before the left join (round-8 rewrite: the "
        "join-then-count shape shuffled every raw orders row on custkey; "
        "the pre-agg is map-side-combinable and cuts the join's big side "
        "by the orders-per-customer factor, ~10x — measured at 100x: "
        "6.24 s -> 2.09 s, exponent 0.53 -> 0.24), order-less "
        "customers coalesce to 0; "
        "the c_count regroup is histogram-sized",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust_orders = (
        orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    )
    per_cust = (
        customer.join(
            per_cust_orders, customer.c_custkey == per_cust_orders.o_custkey, "left"
        )
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H q14 — promotion revenue share for one ship month
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q14_promo_effect",
    oracle="""
        SELECT ROUND(
                 100.00 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14: PROMO-part revenue percentage for one month — "
        "conditional-sum ratio over a selective month scan; part join "
        "left to AQE (part scales with sf)",
)
def tpch_q14_promo_effect(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# TPC-H q17 — small-quantity-order revenue (correlated avg as a join)
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q17_small_quantity",
    oracle="""
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
        JOIN (
            SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_lim
            FROM lineitem GROUP BY l_partkey
        ) a ON a.l_partkey = l.l_partkey
        WHERE l.l_quantity < a.qty_lim
    """,
    doc="TPC-H Q17 (brand-only — no p_container in testdata): the "
        "correlated per-part AVG subquery decorrelates to a groupBy + "
        "self-join co-partitioned on l_partkey — one shuffle key for "
        "both sides, no per-row subquery execution",
)
def tpch_q17_small_quantity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    ).withColumnRenamed("l_partkey", "a_partkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(lim, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Ranking window functions — rank/dense_rank/ntile/lag/percent_rank
# --------------------------------------------------------------------------

@register_extra(
    "window_ranking_functions",
    oracle="""
        SELECT o_custkey, o_orderkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               ROUND(COALESCE(LAG(o_totalprice) OVER w, 0), 4) AS prev_price,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="the ranking-function family over one shared per-customer "
        "window spec — one shuffle on o_custkey covers all five "
        "functions (shared WindowExec), deterministic via the "
        "(price, orderkey) tiebreak",
)
def window_ranking_functions(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 4).alias("prev_price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# --------------------------------------------------------------------------
# Value window functions — first/last/nth over an explicit full frame
# --------------------------------------------------------------------------

@register_extra(
    "window_value_functions",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(FIRST_VALUE(o_totalprice) OVER w, 4) AS biggest,
               ROUND(LAST_VALUE(o_totalprice) OVER w, 4) AS smallest,
               ROUND(COALESCE(NTH_VALUE(o_totalprice, 2) OVER w, 0), 4)
                   AS second_biggest
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value/last_value/nth_value over an EXPLICIT unbounded "
        "frame — the default running frame makes last_value the current "
        "row, the classic silent-wrong-answer; the explicit frame is "
        "both correct and engine-portable",
)
def window_value_functions(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey", "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 4).alias("biggest"),
        F.round(F.last("o_totalprice").over(w), 4).alias("smallest"),
        F.round(
            F.coalesce(F.nth_value("o_totalprice", 2).over(w), F.lit(0.0)), 4
        ).alias("second_biggest"),
    )


# --------------------------------------------------------------------------
# Ordered string aggregation (listagg) — deterministic via array_sort
# --------------------------------------------------------------------------

@register_extra(
    "string_agg_by_group",
    oracle="""
        SELECT n.n_name,
               string_agg(c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="ordered listagg: collect_list is partition-order-dependent in "
        "Spark, so array_sort before array_join makes the result "
        "deterministic and engine-portable (= string_agg ... ORDER BY)",
)
def string_agg_by_group(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    ).distinct()
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_mktsegment")), ",").alias(
                "segments"
            )
        )
    )


# --------------------------------------------------------------------------
# melt / unpivot — the inverse of the catalog's pivot_wide
# --------------------------------------------------------------------------

@register_extra(
    "melt_unpivot",
    oracle="""
        SELECT p_partkey, metric, ROUND(value, 4) AS value
        FROM (
            SELECT p_partkey, p_retailprice,
                   CAST(p_size AS DOUBLE) AS p_size
            FROM part
        )
        UNPIVOT (value FOR metric IN (p_retailprice, p_size))
    """,
    doc="wide->long unpivot (df.unpivot / melt): narrow row-expansion, "
        "no shuffle — output rows = input x n_value_columns",
)
def melt_unpivot(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value_raw",
    ).select("p_partkey", "metric", F.round("value_raw", 4).alias("value"))


# --------------------------------------------------------------------------
# Skew handling — salted two-phase agg and salt-replicate join produce
# results identical to the plain forms (the salt never escapes)
# --------------------------------------------------------------------------

@register_extra(
    "salted_agg_skew",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS total,
               ROUND(MAX(value), 4) AS max_value
        FROM events
        GROUP BY event_type
    """,
    doc="two-phase skew-safe aggregation (operators/skew.salted_agg): "
        "phase 1 aggregates on (key, salt) spreading each hot key over "
        "16 reducers, phase 2 re-aggregates the 16 partials per key — "
        "result identical to the plain groupBy, which is the oracle",
)
def salted_agg_skew(spark, sf_dir):
    from streamz_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, "event_type",
        {"n": ("value", "count"), "total_raw": ("value", "sum"),
         "max_raw": ("value", "max")},
    )
    return out.select(
        "event_type", "n",
        F.round("total_raw", 4).alias("total"),
        F.round("max_raw", 4).alias("max_value"),
    )


@register_extra(
    "salted_join_skew",
    oracle="""
        SELECT p.p_brand,
               COUNT(*) AS n_items,
               ROUND(SUM(l.l_extendedprice), 4) AS total_price
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
    doc="skew-safe equi-join (operators/skew.salted_join): the big side "
        "salts, the small side replicates once per bucket, the join "
        "key becomes (key, salt) so one hot key spreads over 16 tasks "
        "— result identical to the plain join, which is the oracle",
)
def salted_join_skew(spark, sf_dir):
    from streamz_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "partkey"
    )
    part = load_table(spark, sf_dir, "part").withColumnRenamed(
        "p_partkey", "partkey"
    )
    return (
        salted_join(li, part, "partkey", salt_buckets=16)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Hopping (sliding) time windows — capability the reference's
# timed_window lacks (no slide); F.window(width, slide)
# --------------------------------------------------------------------------

@register_extra(
    "hopping_window",
    # each event lands in width/slide = 2 windows; the oracle expands
    # the assignment explicitly: start ∈ {bucket30(ts), bucket30(ts)-30m}
    oracle="""
        WITH hop AS (
            SELECT event_type, value,
                   time_bucket(INTERVAL 30 MINUTE, ts)
                       - INTERVAL (o.off) MINUTE AS win_start
            FROM events, (VALUES (0), (30)) o(off)
        )
        SELECT event_type, win_start, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM hop
        GROUP BY event_type, win_start
    """,
    doc="hopping windows: 1-hour width sliding every 30 minutes via "
        "F.window(ts, width, slide) — Spark expands each row into its "
        "width/slide window assignments before the one aggregation "
        "shuffle (shuffle volume = rows x overlap, the inherent cost)",
)
def hopping_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "event_type", F.col("win.start").alias("win_start"),
            "n_events", "total_value",
        )
    )


# --------------------------------------------------------------------------
# Native session windows (F.session_window) with a lag-gap-cumsum oracle
# --------------------------------------------------------------------------

@register_extra(
    "session_windows",
    # the oracle derives the same sessions by the cumsum construction
    # (proven equivalent in tests/test_streaming.py differential):
    # start = min(ts), end = max(ts) + gap (session_window's close rule)
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id))
                             > 1800 * 1000000
                          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sess AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM gaps
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value
        FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization on the built-in F.session_window — "
        "one shuffle with session-merge in the agg, no per-key ordered "
        "window scan; oracle reconstructs identical sessions via "
        "lag-gap-cumsum",
)
def session_windows(spark, sf_dir):
    from streamz_spark.operators.windows import session_window_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return session_window_agg(
        ev, "ts", "30 minutes",
        aggs={
            "n_events": F.count(F.lit(1)),
            "session_value": F.round(F.sum("value"), 4),
        },
        keys=["user_id"],
    )


# --------------------------------------------------------------------------
# TPC-H q15 — top supplier by quarterly revenue
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15: the revenue view computes once and feeds both the "
        "MAX scalar and the equality filter (persisted subtree — no "
        "double scan); supplier join left to AQE",
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
        # localCheckpoint, not persist: cache entries leak across
        # repeated calls in a long session; checkpoint blocks are
        # GC-released with the result
        .localCheckpoint(eager=True)
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("m"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# TPC-H q22 (adapted) — high-balance customers gone quiet, by nation
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q22_quiet_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
        )
        SELECT n.n_name, COUNT(*) AS n_custs,
               ROUND(SUM(c.c_acctbal), 4) AS total_bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT a FROM avg_bal)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY n.n_name
    """,
    doc="TPC-H Q22 adapted (no c_phone in testdata — nation stands in "
        "for country code): above-average-balance customers with no "
        "recent orders. The AVG scalar broadcasts; NOT EXISTS compiles "
        "to a left-anti join against the filtered orders scan",
)
def tpch_q22_quiet_customers(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q18 — large-volume customers
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q18_large_volume",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o.o_totalprice,
               ROUND(SUM(l.l_quantity), 4) AS sum_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 100
    """,
    doc="TPC-H Q18: orders whose total quantity exceeds 200 — the IN "
        "subquery becomes a semi-join against the HAVING aggregate, "
        "co-partitioned with the main l_orderkey join; top-k by price",
)
def tpch_q18_large_volume(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
                li.l_orderkey == F.col("b_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register_extra(
    "ewm_mean_vectorized",
    # same recursive-CTE recurrence as the main ewm_mean_per_user oracle,
    # but rounded to 4 dp on both sides: the blocked-numpy fast path
    # (bit_exact=False) matches the scalar loop to ~1e-13 relative, which
    # is bit-identical after ROUND(, 4) at this value scale
    oracle="""
        WITH RECURSIVE t AS (
            SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
            FROM events
        ), r AS (
            SELECT user_id, event_id, rn,
                   value + 0.7::DOUBLE * 0.0::DOUBLE AS num,
                   1.0::DOUBLE + 0.7::DOUBLE * 0.0::DOUBLE AS den
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.user_id, t.event_id, t.rn,
                   t.value + 0.7::DOUBLE * r.num,
                   1.0::DOUBLE + 0.7::DOUBLE * r.den
            FROM t JOIN r ON t.user_id = r.user_id AND t.rn = r.rn + 1
        )
        SELECT event_id, user_id, ROUND(num / den, 4) AS ewm FROM r
    """,
    doc="ewm_mean fast path (bit_exact=False): blocked numpy num/den "
        "recurrence with per-block rescaling — no per-row Python in the "
        "hot loop; differential-tested against the scalar path in "
        "tests/test_windows.py",
)
def ewm_mean_vectorized(spark, sf_dir):
    from streamz_spark.operators.windows import ewm_mean

    ev = load_table(spark, sf_dir, "events")
    out = ewm_mean(
        ev.select("event_id", "user_id", "value"),
        "event_id", "value", "ewm",
        alpha=0.3, partition_by=["user_id"], bit_exact=False,
    )
    return out.select("event_id", "user_id", F.round("ewm", 4).alias("ewm"))


@register_extra(
    "media_decode_stats",
    # the Spark side builds REAL container bytes (P6 ppm via
    # operators.codecs.encode_ppm, RIFF/WAVE via stdlib wave) from
    # doc_id arithmetic, ships them through Arrow binary columns, and
    # decodes them back with the built-in pure-stdlib codecs — the
    # oracle predicts every decoded stat analytically, so any header,
    # stride, padding, or sample-width bug breaks the hash
    oracle="""
        SELECT doc_id,
               (1 + doc_id % 5)::INT AS height,
               (1 + doc_id % 7)::INT AS width,
               3 AS n_channels,
               ((doc_id * 37) % 256)::DOUBLE AS mean_pixel,
               (100 + doc_id % 50)::BIGINT AS n_frames,
               (100 + doc_id % 50) / 8000.0 AS duration_s,
               (doc_id % 100)::DOUBLE AS mean_abs_amplitude
        FROM documents
    """,
    doc="real multimodal decode: per-doc P6 PPM (w=1+id%7, h=1+id%5, "
        "constant pixel (id*37)%256) and PCM16 WAV (100+id%50 frames at "
        "8 kHz, constant amplitude id%100) are encoded executor-side, "
        "then decoded by decode_image/decode_audio's built-in stdlib "
        "codecs; dims, mean pixel, frame count, duration and amplitude "
        "must all match the closed-form oracle",
)
def media_decode_stats(spark, sf_dir):
    from streamz_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_media(batches):
        import pandas as pd

        from streamz_spark.operators.codecs import encode_ppm, encode_wav

        for pdf in batches:
            imgs, wavs = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h, p = 1 + i % 7, 1 + i % 5, (i * 37) % 256
                imgs.append(encode_ppm(w, h, bytes([p]) * (w * h * 3)))
                wavs.append(encode_wav([i % 100] * (100 + i % 50), sample_rate=8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "img": imgs, "wav": wavs})

    media = docs.mapInPandas(
        make_media, schema="doc_id long, img binary, wav binary"
    )
    img_stats = mm.decode_image(media.withColumnRenamed("img", "media"))
    wav_stats = mm.decode_audio(
        media.withColumnRenamed("wav", "media")
    ).select("doc_id", "n_frames", "duration_s", "mean_abs_amplitude")
    return img_stats.join(wav_stats, "doc_id")


@register_extra(
    "join_full_outer",
    # full-outer completes the join-type matrix (inner/left/semi/anti/
    # as-of/range are driver entries): customers with orders in H1-1997
    # FULL JOIN customers with high balance — unmatched sides surface
    # with NULLs on both shapes
    oracle="""
        WITH active AS (
            SELECT o_custkey AS custkey, COUNT(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY o_custkey
        ), rich AS (
            SELECT c_custkey AS custkey, ROUND(c_acctbal, 4) AS acctbal
            FROM customer WHERE c_acctbal > 7000
        )
        SELECT COALESCE(a.custkey, r.custkey) AS custkey,
               a.n_orders, r.acctbal,
               (a.custkey IS NOT NULL AND r.custkey IS NOT NULL) AS both_sides
        FROM active a FULL OUTER JOIN rich r ON a.custkey = r.custkey
    """,
    doc="full-outer equi-join: both unmatched sides surface with NULLs; "
        "single shuffle on the join key (AQE decides SMJ vs SHJ), "
        "null-safe COALESCE key projection",
)
def join_full_outer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    active = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("o_custkey").alias("a_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    rich = customer.filter(F.col("c_acctbal") > 7000).select(
        F.col("c_custkey").alias("r_custkey"),
        F.round("c_acctbal", 4).alias("acctbal"),
    )
    return (
        active.join(rich, active.a_custkey == rich.r_custkey, "full_outer")
        .select(
            F.coalesce("a_custkey", "r_custkey").alias("custkey"),
            "n_orders",
            "acctbal",
            (F.col("a_custkey").isNotNull() & F.col("r_custkey").isNotNull()).alias("both_sides"),
        )
    )


@register_extra(
    "boilerplate_common_shingles",
    # mirrors operators/quality.common_shingle_stats: per-doc distinct
    # 5-gram shingles, document frequency per shingle, fraction in
    # >= 3 docs; the same tokenize/shingle grammar as the dedup oracles
    oracle="""
        WITH sh AS (
            SELECT doc_id AS id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 0)),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
                   )) AS sh
            FROM (
                SELECT doc_id,
                       CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                       END AS w
                FROM documents
            )
        ),
        posting AS (SELECT id, unnest(sh) AS shingle FROM sh),
        common AS (
            SELECT shingle FROM posting GROUP BY shingle
            HAVING COUNT(DISTINCT id) >= 3
        ),
        per AS (
            SELECT p.id,
                   COUNT(*) AS n_shingles,
                   CAST(SUM(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common
            FROM posting p LEFT JOIN common c ON p.shingle = c.shingle
            GROUP BY p.id
        )
        SELECT s.id AS doc_id,
               CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
               COALESCE(p.n_common, 0) AS n_common,
               CASE WHEN COALESCE(p.n_shingles, 0) > 0
                    THEN p.n_common / CAST(p.n_shingles AS DOUBLE)
                    ELSE 0.0 END AS common_frac
        FROM sh s LEFT JOIN per p ON s.id = p.id
    """,
    doc="cross-doc boilerplate: fraction of a doc's distinct 5-gram "
        "shingles occurring in >= 3 documents (CCNet/RefinedWeb "
        "boilerplate removal generalized to n-grams); one shingling "
        "pass, df-aggregate on the shingle key, broadcast join against "
        "only the high-df shingle set",
)
def boilerplate_common_shingles(spark, sf_dir):
    from streamz_spark.operators.quality import common_shingle_stats

    docs = load_table(spark, sf_dir, "documents")
    return common_shingle_stats(docs, k=5, min_docs=3)


# --------------------------------------------------------------------------
# approx_keys arms: the exact shingle-string shuffle is the catalog's
# largest remaining at-scale cost (1.3 GB at 100×, OPTIMIZATION_r08
# Not-yet #4); the opt-in xxhash64 posting key cuts it to 8-byte keys
# with birthday-bounded collision odds (D²/2⁶⁵). At bench SFs the
# corpus is collision-free, so BOTH arms are held to the SAME exact
# oracle — the approx arm's test failing would mean a real collision
# (or a broken rewrite), exactly what should fail loudly.
# --------------------------------------------------------------------------

def _ngram_jaccard_oracle() -> str:
    from streamz_spark.catalog import load_all

    return load_all()["ngram_jaccard_pairs"].oracle


@register_extra(
    "ngram_jaccard_pairs_approx",
    oracle=None,  # filled below — identical to the exact path's oracle
    doc="ngram_jaccard_pairs with approx_keys=True: the posting-list "
        "exchange shuffles xxhash64(shingle) int64 keys instead of "
        "gram strings — same SPJA shape, collision-free (hence "
        "oracle-exact) below ~10⁹ distinct corpus shingles; measured "
        "A/B in OPTIMIZATION_r09.md",
)
def ngram_jaccard_pairs_approx(spark, sf_dir):
    from streamz_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, max_df=50, approx_keys=True
    )


EXTRA_REGISTRY["ngram_jaccard_pairs_approx"] = QueryDef(
    name="ngram_jaccard_pairs_approx",
    fn=EXTRA_REGISTRY["ngram_jaccard_pairs_approx"].fn,
    oracle=_ngram_jaccard_oracle(),
    doc=EXTRA_REGISTRY["ngram_jaccard_pairs_approx"].doc,
)


@register_extra(
    "boilerplate_common_shingles_approx",
    oracle=None,  # filled below — identical to the exact path's oracle
    doc="boilerplate_common_shingles with approx_keys=True: the "
        "document-frequency exchange runs on xxhash64(shingle) int64 "
        "keys instead of 5-gram strings — same shape, held to the "
        "exact oracle (collision-free at bench SFs)",
)
def boilerplate_common_shingles_approx(spark, sf_dir):
    from streamz_spark.operators.quality import common_shingle_stats

    docs = load_table(spark, sf_dir, "documents")
    return common_shingle_stats(docs, k=5, min_docs=3, approx_keys=True)


EXTRA_REGISTRY["boilerplate_common_shingles_approx"] = QueryDef(
    name="boilerplate_common_shingles_approx",
    fn=EXTRA_REGISTRY["boilerplate_common_shingles_approx"].fn,
    oracle=EXTRA_REGISTRY["boilerplate_common_shingles"].oracle,
    doc=EXTRA_REGISTRY["boilerplate_common_shingles_approx"].doc,
)


# --------------------------------------------------------------------------
# TPC-H completion: q2/q4/q9/q11/q12/q16/q19/q20/q21 adapted to the
# testdata subset (no partsupp, no commit/receipt dates, no shipmode/
# container). Each preserves the reference query's PLAN SHAPE — the
# part Catalyst has to get right at 100 TB — with predicates rewritten
# onto available columns. Derived supply relation: the distinct
# (l_partkey, l_suppkey) pairs in lineitem stand in for partsupp, with
# MIN(l_extendedprice / l_quantity) as the supply cost (MIN of
# identical IEEE quotients is bit-deterministic across engines, unlike
# a SUM/AVG of doubles, so the min-cost equality join in q2 cannot
# flake).
# --------------------------------------------------------------------------

@register_extra(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS cost
            FROM lineitem GROUP BY 1, 2
        ),
        eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        ),
        cand AS (
            SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name,
                   sp.cost
            FROM part p
            JOIN supply sp ON sp.l_partkey = p.p_partkey
            JOIN eur e ON e.s_suppkey = sp.l_suppkey
            WHERE p.p_size = 38 AND p.p_type = 'STANDARD'
        ),
        mn AS (SELECT p_partkey, MIN(cost) AS min_cost FROM cand GROUP BY 1)
        SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_name,
               -- FLOOR-scaling, not ROUND: both engines hold the
               -- bit-identical quotient double, but Spark's ROUND
               -- (BigDecimal of the shortest decimal repr, HALF_UP)
               -- and DuckDB's (exact binary) disagree on half-cases
               -- like ...17125 — floor of the same double is exact
               FLOOR(c.cost * 10000) / 10000 AS supply_cost
        FROM cand c
        JOIN mn ON c.p_partkey = mn.p_partkey AND c.cost = mn.min_cost
    """,
    doc="TPC-H Q2 (partsupp derived from lineitem): the correlated "
        "min-cost subquery decorrelates to a per-part MIN + equality "
        "self-join on the already-partitioned candidate set; the "
        "supplier/nation/region side is O(100) rows and broadcast, so "
        "the only shuffle is the supply groupBy on (partkey, suppkey)",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 38) & (F.col("p_type") == "STANDARD")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    # Round-8 pushdown: the size/type part filter is a pure partkey
    # predicate and the supply aggregate is keyed on (partkey, suppkey),
    # so the filtered-part semi-join commutes below the groupBy —
    # lineitem shrinks by the part-filter selectivity BEFORE the fact
    # exchange (the old shape shuffled the full per-pair aggregate and
    # joined part after). Per-pair MIN over a partkey-restricted set is
    # identical for the surviving keys.
    li_f = li.join(
        F.broadcast(part.select("p_partkey").withColumnRenamed("p_partkey", "__pk")),
        li.l_partkey == F.col("__pk"),
        "leftsemi",
    )
    supply = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eur = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # localCheckpoint: cand feeds both the per-part MIN and the final
    # equality join; without the barrier each consumer re-runs the full
    # supply groupBy over lineitem (no ReusedExchange — the rename
    # breaks exchange identity; 20 scans in the physical plan). Local
    # timing is flat (in-memory re-scans are cheap on local[32]); the
    # barrier is for the fact-scan count at scale, and cand is tiny
    # (filtered parts x suppliers) so the materialization is free
    cand = (
        supply.join(F.broadcast(part), supply.l_partkey == part.p_partkey)
        .join(F.broadcast(eur), supply.l_suppkey == eur.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "cost")
        .localCheckpoint()
    )
    mn = cand.groupBy("p_partkey").agg(F.min("cost").alias("min_cost")).withColumnRenamed(
        "p_partkey", "m_partkey"
    )
    return (
        cand.join(
            mn,
            (cand.p_partkey == F.col("m_partkey")) & (cand.cost == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.floor(F.col("cost") * 10000) / 10000).alias("supply_cost"),
        )
    )


@register_extra(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1996-07-01'
          AND o_orderdate < DATE '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 (late-shipment EXISTS: shipdate > orderdate+30 stands "
        "in for the missing commit/receipt dates): the EXISTS compiles "
        "to a LEFT SEMI hash join on l_orderkey with the non-equi date "
        "predicate evaluated join-side — one shuffle, no duplicate "
        "inflation before the count",
)
def tpch_q4_order_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 30)),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register_extra(
    "tpch_q9_product_profit",
    oracle="""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         - 0.4 * p_retailprice * l_quantity), 4) AS profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (cost proxy 0.4*p_retailprice*l_quantity replaces the "
        "missing ps_supplycost; p_name LIKE 'red%' keeps the part-name "
        "filter): both dimension sides (filtered part ~12%, supplier "
        "O(100)) broadcast, so the fact table is scanned once with no "
        "shuffle before the (nation, year) aggregate",
)
def tpch_q9_product_profit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                4,
            ).alias("profit")
        )
    )


@register_extra(
    "tpch_q11_important_parts",
    oracle="""
        WITH val AS (
            SELECT l_partkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS part_value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
            GROUP BY 1
        )
        SELECT l_partkey, ROUND(part_value, 4) AS part_value
        FROM val
        WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM val)
    """,
    doc="TPC-H Q11 (part value from lineitem revenue replaces the "
        "missing partsupp stock value): the HAVING-with-scalar-subquery "
        "shape — per-part aggregate filtered against 0.1% of the global "
        "total, which Spark evaluates as a broadcast nested-loop join "
        "against the O(1)-row scalar aggregate, not a re-scan",
)
def tpch_q11_important_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_sup = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value")
        )
    )
    threshold = val.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 4).alias("part_value"))
    )


@register_extra(
    "tpch_q12_late_priority",
    oracle="""
        SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY 1
    """,
    doc="TPC-H Q12 (ship-year buckets replace the missing l_shipmode; "
        "late = shipped >60 days after order): the conditional-count "
        "CASE aggregate pattern — one equi-join shuffle on the order "
        "key with the non-equi lateness predicate as a join residual, "
        "then integer counts (bit-deterministic across engines)",
)
def tpch_q12_late_priority(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register_extra(
    "tpch_q16_supplier_counts",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
          AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 (supply pairs derived from lineitem; the NOT IN "
        "complaint-supplier exclusion keyed on negative acctbal instead "
        "of the missing s_comment): NOT IN compiles to a broadcast LEFT "
        "ANTI join against the O(10)-row excluded set; the distinct and "
        "the count-distinct share the (partkey, suppkey) shuffle key",
)
def tpch_q16_supplier_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 7, 14, 21, 28, 35, 42, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    # Round-8 pushdown: both predicates are pure key predicates
    # (partkey via the part filter, suppkey via the bad-supplier anti),
    # so they commute below the (partkey, suppkey) distinct — lineitem
    # shrinks by the part-filter selectivity (~1/7) BEFORE the wide
    # distinct exchange instead of after it.
    li_f = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "leftanti")
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("__pk"))),
            F.col("l_partkey") == F.col("__pk"),
            "leftsemi",
        )
    )
    ps = li_f.distinct()
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register_extra(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (container/shipmode legs dropped — brand × size × "
        "quantity disjunction kept): the OR-of-conjunctions predicate; "
        "Catalyst extracts the common p_brand IN (...) / p_size <= 15 "
        "implications onto the broadcast part side so the scan prunes "
        "before the join instead of evaluating the full disjunction "
        "against every row pair",
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


@register_extra(
    "tpch_q20_promotion_suppliers",
    oracle="""
        WITH supply AS (
            SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
            FROM lineitem GROUP BY 1, 2
        ),
        lim AS (
            SELECT l_partkey AS lp, 0.5 * AVG(qty) AS qlim
            FROM supply GROUP BY 1
        )
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM supply
            JOIN part ON p_partkey = l_partkey AND p_name LIKE 'blue%'
            JOIN lim ON lp = l_partkey
            WHERE qty > qlim
        )
    """,
    doc="TPC-H Q20 (shipped quantity per (supplier, part) stands in for "
        "ps_availqty; threshold = half the per-part mean instead of "
        "half the yearly demand): the nested-IN-with-correlated-AVG "
        "shape decorrelates to supply groupBy + per-part limit groupBy "
        "sharing one partkey shuffle, then a LEFT SEMI back to "
        "supplier; integral quantities make the AVG threshold "
        "bit-deterministic across engines",
)
def tpch_q20_promotion_suppliers(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    supplier = load_table(spark, sf_dir, "supplier")
    # Round-8 pushdown: the blue-part restriction is a pure partkey
    # predicate, and every downstream aggregate (supply per (suppkey,
    # partkey), qlim per partkey) is keyed on partkey — so the part
    # semi-join commutes below BOTH aggregates. Filtering lineitem
    # FIRST cuts the fact groupBy exchange by the part-name selectivity
    # (~1% of parts → ~1% of the shuffle), where the old shape
    # aggregated the full fact table and only then joined part.
    li_blue = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "leftsemi",
    )
    supply = li_blue.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # per-part limit as a window over the SAME relation: one partkey
    # exchange replaces the old groupBy-then-join pair (two supply-wide
    # exchanges + a join), and supply now has a single consumer so the
    # localCheckpoint barrier is gone. AVG of exact long sums — the
    # window and the aggregate produce the identical double.
    w = Window.partitionBy("l_partkey")
    qualifying = (
        supply.withColumn("qlim", 0.5 * F.avg("qty").over(w))
        .filter(F.col("qty") > F.col("qlim"))
        .select("l_suppkey")
    )
    return supplier.join(
        qualifying, supplier.s_suppkey == F.col("l_suppkey"), "leftsemi"
    ).select("s_name", "s_acctbal")


@register_extra(
    "tpch_q21_waiting_suppliers",
    oracle="""
        WITH late AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
          )
        GROUP BY s_name
    """,
    doc="TPC-H Q21 (late = shipped >90 days after order date, replacing "
        "receipt>commit; region EUROPE replaces the single-nation "
        "filter): the EXISTS / NOT-EXISTS pair — sole-late-supplier on "
        "a multi-supplier order — compiles to two semi-join-shaped "
        "per-order aggregates (distinct-supplier count >= 2, late-"
        "supplier count = 1) sharing the l_orderkey shuffle key, "
        "avoiding the O(lineitem x lineitem) correlated re-scan",
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    # Round-8 single-pass rewrite: the previous shape paid TWO
    # lineitem-wide exchanges (the late-pair distinct and the
    # countDistinct multi-supplier aggregate) plus two semi-joins to
    # recombine them. One orderkey groupBy with conditional
    # collect_sets carries both facts — all_sup (distinct suppliers on
    # the order) and late_sup (distinct suppliers that shipped >90 days
    # after the order date; collect_set drops the non-late NULLs and
    # dedupes) — so the waiting-supplier predicate (>=2 suppliers,
    # exactly 1 late) becomes two array-size filters on ONE shuffle.
    # Sets are bounded by suppliers-per-order (single digits), never
    # corpus-sized. Measured at 100x: 44.6 s -> 19.5 s (2.3x), exponent
    # 0.54 -> 0.48; identical results (oracle-exact).
    late_cond = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("all_sup"),
            F.collect_set(F.when(late_cond, F.col("l_suppkey"))).alias("late_sup"),
        )
        .filter((F.size("all_sup") >= 2) & (F.size("late_sup") == 1))
        .select(F.element_at("late_sup", 1).alias("l_suppkey"))
    )
    eur_sup = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    return (
        per_order.join(F.broadcast(eur_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Higher-order array functions — transform/filter/aggregate/exists/
# forall/slice as one family over the embedding column
# --------------------------------------------------------------------------

@register_extra(
    "array_higher_order_functions",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS n_dims,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
               ROUND(sqrt(list_sum(list_transform(
                   embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
               ))), 4) AS l2_norm,
               list_bool_or(list_transform(embedding, x -> abs(x) > 0.2))
                   AS has_big,
               list_aggregate(list_transform(embedding, x -> abs(x) < 100),
                              'bool_and') AS all_small,
               ROUND(list_sum(list_transform(
                   embedding[1:3], x -> CAST(x AS DOUBLE)
               )), 4) AS first3_sum
        FROM embeddings
    """,
    doc="the higher-order array-function family (reference: streamz "
        "map/filter over element streams, here expressed on array "
        "columns): transform / filter / aggregate / exists / forall / "
        "slice all evaluate JVM-side inside whole-stage codegen — no "
        "Python UDF, no explode-regroup shuffle; elements are cast to "
        "double INSIDE the lambda so both engines fold with identical "
        "IEEE arithmetic",
)
def array_higher_order_functions(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    x2d = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x2d(x) * x2d(x),
                )
            ),
            4,
        ).alias("l2_norm"),
        F.exists("embedding", lambda x: F.abs(x) > 0.2).alias("has_big"),
        F.forall("embedding", lambda x: F.abs(x) < 100).alias("all_small"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 3), F.lit(0.0), lambda acc, x: acc + x2d(x)
            ),
            4,
        ).alias("first3_sum"),
    )


# --------------------------------------------------------------------------
# Statistical aggregate family — corr/covar/stddev/skewness/kurtosis/
# median per group
# --------------------------------------------------------------------------

@register_extra(
    "stats_aggregate_family",
    oracle="""
        WITH base AS (
            SELECT event_type, value, epoch(ts) AS tsec FROM events
        ),
        mu AS (SELECT event_type, AVG(value) AS m FROM base GROUP BY 1)
        SELECT b.event_type,
               ROUND(CORR(b.value, b.tsec), 6) AS corr_vt,
               ROUND(COVAR_SAMP(b.value, b.tsec), 2) AS covar_vt,
               ROUND(STDDEV_SAMP(b.value), 6) AS sd_value,
               ROUND(AVG(POWER(b.value - mu.m, 3))
                     / POWER(AVG(POWER(b.value - mu.m, 2)), 1.5), 6)
                   AS skew_value,
               ROUND(AVG(POWER(b.value - mu.m, 4))
                     / POWER(AVG(POWER(b.value - mu.m, 2)), 2) - 3, 6)
                   AS kurt_value,
               ROUND(MEDIAN(b.value), 6) AS median_value
        FROM base b JOIN mu ON b.event_type = mu.event_type
        GROUP BY 1
    """,
    doc="per-group statistical aggregates: corr / covar_samp / "
        "stddev_samp / skewness / kurtosis / exact median in ONE "
        "groupBy pass (shared shuffle on event_type, partial aggregation "
        "map-side); the oracle derives skew/kurtosis from explicit "
        "central moments because Spark's definitions are the population "
        "g1 / excess-g2 forms while DuckDB's built-ins are "
        "sample-corrected",
)
def stats_aggregate_family(spark, sf_dir):
    # ts loads as TIMESTAMP_NTZ; the session timezone is pinned to UTC
    # (session.py) so the NTZ->LTZ hop is value-preserving and the
    # double cast yields the same epoch seconds as DuckDB's epoch(ts)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "tsec", F.col("ts").cast("timestamp_ltz").cast("double")
    )
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", "tsec"), 6).alias("corr_vt"),
        F.round(F.covar_samp("value", "tsec"), 2).alias("covar_vt"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.skewness("value"), 6).alias("skew_value"),
        F.round(F.kurtosis("value"), 6).alias("kurt_value"),
        F.round(F.median("value"), 6).alias("median_value"),
    )


# --------------------------------------------------------------------------
# Blocked edit-distance fuzzy matching — levenshtein near-dup pairs
# --------------------------------------------------------------------------

@register_extra(
    "fuzzy_levenshtein_pairs",
    oracle="""
        WITH p AS (
            SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS noun
            FROM part
        )
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM p a
        JOIN p b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="blocked edit-distance near-dup (fuzzy record matching): "
        "candidate pairs come from an equi-join on a cheap blocking key "
        "(the head noun), levenshtein verifies only within blocks — the "
        "standard O(sum of block^2) shape instead of the O(n^2) "
        "all-pairs edit-distance. Implementation detail that matters "
        "at every scale: edit distance is computed once per DISTINCT "
        "name pair (the name domain is tiny next to the row count), "
        "then expanded to id pairs through broadcast joins — the naive "
        "row-level blocked join repeats levenshtein per row pair AND "
        "serializes on ~10 block keys (measured 47 s at sf0.1 vs ~1 s "
        "this way). At a corpus where the id side outgrows broadcast, "
        "the expansion joins shuffle on the name key with salting.",
)
def fuzzy_levenshtein_pairs(spark, sf_dir):
    from streamz_spark.operators.dedup import fuzzy_levenshtein_pairs as op

    return op(
        load_table(spark, sf_dir, "part"),
        id_col="p_partkey",
        name_col="p_name",
        block=F.split("p_name", " ").getItem(1),
        max_dist=2,
    )


# --------------------------------------------------------------------------
# ranked retrieval + domain mixing (round 4 additions)
# --------------------------------------------------------------------------

# BM25 constants, embedded via repr() so the oracle's literals are the
# EXACT doubles the Spark expression tree produces (1.2 + 1.0 != 2.2 in
# binary; repr round-trips the true value)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ["stream", "vector", "hash", "window"]
_BM25_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"

_BM25_ORACLE = f"""
    WITH d2 AS (
        SELECT doc_id AS id,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS toks
        FROM documents
    ),
    docs AS (SELECT id, toks, CAST(len(toks) AS BIGINT) AS doc_len FROM d2),
    scalars AS (
        SELECT COUNT(*) AS n_docs, SUM(doc_len) AS total_tokens FROM docs
    ),
    postings AS (
        SELECT id, doc_len, t.term,
               CAST(len(list_filter(toks, x -> x = t.term)) AS BIGINT) AS tf
        FROM docs, (SELECT unnest({_BM25_TERMS_SQL}) AS term) t
        WHERE list_contains(toks, t.term)
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_count FROM postings GROUP BY 1)
    SELECT term, id AS doc_id, tf, doc_len, df_count,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT p.id, p.term, p.tf, p.doc_len, f.df_count,
               ROW_NUMBER() OVER (
                   PARTITION BY p.term
                   ORDER BY
                       ln(1.0 + (n_docs - df_count + 0.5) / (df_count + 0.5))
                       * (tf * {_BM25_K1 + 1.0!r})
                       / (tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                          + ({_BM25_B!r} * doc_len)
                            / (total_tokens / n_docs))) DESC,
                       p.id ASC) AS rank
        FROM postings p JOIN dfreq f USING (term) CROSS JOIN scalars
    ) WHERE rank <= 10
"""


@register_extra(
    "bm25_term_topk",
    oracle=_BM25_ORACLE,
    doc="per-query-term top-10 documents by BM25 (tf saturation k1=1.2, "
        "length normalization b=0.75) — the ranked-retrieval primitive "
        "TF-IDF lacks. Scale shape: the query-term filter lands before "
        "any shuffle (array_intersect against a literal array), so only "
        "postings for the |terms| query terms ever shuffle; doc length "
        "is a narrow size(split()) with no explode; corpus scalars ride "
        "in as a broadcast 1-row aggregate. Ranking is per term, so the "
        "idf factor is a positive per-partition constant — engine libm "
        "ln differences cannot reorder results; ties break on doc_id.",
)
def bm25_term_topk(spark, sf_dir):
    from streamz_spark.operators.text import bm25_term_topk as op

    docs = load_table(spark, sf_dir, "documents")
    return op(docs, _BM25_TERMS, top_n=10, k1=_BM25_K1, b=_BM25_B)


@register_extra(
    "domain_mixture_weights",
    oracle="""
        WITH per AS (
            SELECT source AS domain,
                   COUNT(*) AS n_docs,
                   SUM(CAST(CASE WHEN length(trim(lower(text))) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                       END AS BIGINT)) AS n_tokens
            FROM documents GROUP BY 1
        ),
        tot AS (
            SELECT COUNT(*) AS n_domains, SUM(n_tokens) AS total_tokens FROM per
        )
        SELECT domain, n_docs, n_tokens,
               CASE WHEN total_tokens > 0
                    THEN CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
               END AS token_share,
               CASE WHEN n_tokens > 0
                    THEN CAST(total_tokens AS DOUBLE)
                         / CAST(n_domains * n_tokens AS DOUBLE)
               END AS resample_weight
        FROM per CROSS JOIN tot
    """,
    doc="per-domain token accounting + uniform-target resampling "
        "weights (DoReMi-style static mix with the uniform reference): "
        "one map-side-combinable groupBy on the tiny domain key, corpus "
        "totals via a broadcast 1-row aggregate, token counts from a "
        "narrow size(split()) — no explode anywhere. token_share and "
        "resample_weight are single IEEE divisions of exact integer "
        "counts, bit-reproducible across engines.",
)
def domain_mixture_weights(spark, sf_dir):
    from streamz_spark.operators.text import domain_mixture_weights as op

    return op(load_table(spark, sf_dir, "documents"))


def _bpe_oracle() -> str:
    from streamz_spark.operators.text import BPE_PRETOKEN_PATTERN

    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return f"""
        SELECT doc_id, n_chars,
               CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
                   AS n_bpe_tokens,
               CAST(CASE WHEN length(trim(lower(text))) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
               END AS BIGINT) AS n_ws_tokens,
               CASE WHEN len(regexp_extract_all(text, '{pat}')) > 0
                    THEN CAST(length(text) AS DOUBLE)
                         / CAST(len(regexp_extract_all(text, '{pat}')) AS DOUBLE)
                    ELSE 0.0 END AS chars_per_token
        FROM documents
    """


@register_extra(
    "bpe_token_stats",
    oracle=_bpe_oracle(),
    doc="per-doc token budget metering with a GPT-2-style pre-tokenizer "
        "regex (contractions / letter runs / digit runs / punct runs / "
        "whitespace) alongside the whitespace word count — the unit "
        "training pipelines actually meter. Lookahead-free pattern so "
        "Java regex and RE2 produce identical leftmost-first matches; "
        "narrow per-row regex, no explode, no UDF, embarrassingly "
        "parallel at any scale.",
)
def bpe_token_stats(spark, sf_dir):
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.text import bpe_token_count, token_count

    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            "doc_id",
            "n_chars",
            "text",
            bpe_token_count("text"),
            token_count("text").alias("n_ws_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.when(
                F.col("n_bpe_tokens") > 0,
                F.length("text").cast("double")
                / F.col("n_bpe_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("text")
    )


# span-level exact dedup: k-gram anchor length for the catalog entry
_SPAN_K = 8

_SPAN_ORACLE = f"""
    WITH d AS (
        SELECT doc_id AS id,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS w
        FROM documents
    ),
    kg AS (
        SELECT id, t.p - 1 AS pos,
               array_to_string(w[t.p:t.p+{_SPAN_K}-1], ' ') AS gram
        FROM d, UNNEST(generate_series(1, len(w) - {_SPAN_K} + 1)) AS t(p)
    ),
    freq AS (SELECT gram, COUNT(*) AS cnt FROM kg GROUP BY 1),
    anch AS (SELECT id, pos FROM kg JOIN freq USING (gram) WHERE cnt >= 2),
    flagged AS (
        SELECT id, pos,
               CASE WHEN LAG(pos) OVER w IS NULL
                      OR pos > LAG(pos) OVER w + {_SPAN_K}
                    THEN 1 ELSE 0 END AS new_span
        FROM anch
        WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    isl AS (
        SELECT id, pos,
               SUM(new_span) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM flagged
    )
    SELECT id AS doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_SPAN_K} - 1 AS BIGINT) AS span_end,
           CAST(MAX(pos) - MIN(pos) + {_SPAN_K} AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_anchors
    FROM isl GROUP BY id, span_id
"""


@register_extra(
    "exact_substring_spans",
    oracle=_SPAN_ORACLE,
    doc="substring-level exact dedup (Lee et al. 2022 ExactSubstr, "
        "k-gram-anchored): maximal token spans whose every k-gram "
        "occurs >=2 times corpus-wide — the duplicated-span report "
        "doc-level exact/minhash dedup misses (boilerplate, license "
        "blocks, quoted passages). One corpus pass, NO join: anchors "
        "shuffle ONCE on an 8-byte xxhash64 gram key and the "
        "occurrence count is a whole-partition window over that key "
        "(radix sort on int64, spills gracefully on hot grams); the "
        "interval merge is one doc-key window — no pair expansion "
        "anywhere, so a million-occurrence boilerplate gram stays a "
        "linear spilled key, not a fan-out. The oracle groups by the "
        "gram STRING; outputs agree unless xxhash64 collides "
        "(birthday odds n^2/2^65).",
)
def exact_substring_spans(spark, sf_dir):
    from streamz_spark.operators.dedup import duplicated_spans

    return duplicated_spans(
        load_table(spark, sf_dir, "documents"), k=_SPAN_K
    )


_SPAN_REMOVE_ORACLE = f"""
    WITH d AS (
        SELECT doc_id AS id, text,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS w
        FROM documents
    ),
    kg AS (
        SELECT id, t.p - 1 AS pos,
               array_to_string(w[t.p:t.p+{_SPAN_K}-1], ' ') AS gram
        FROM d, UNNEST(generate_series(1, len(w) - {_SPAN_K} + 1)) AS t(p)
    ),
    freq AS (SELECT gram, COUNT(*) AS cnt FROM kg GROUP BY 1),
    anch AS (SELECT id, pos FROM kg JOIN freq USING (gram) WHERE cnt >= 2),
    flagged AS (
        SELECT id, pos,
               CASE WHEN LAG(pos) OVER win IS NULL
                      OR pos > LAG(pos) OVER win + {_SPAN_K}
                    THEN 1 ELSE 0 END AS new_span
        FROM anch WINDOW win AS (PARTITION BY id ORDER BY pos)
    ),
    isl AS (
        SELECT id, pos,
               SUM(new_span) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM flagged
    ),
    spans AS (
        SELECT id, MIN(pos) AS s, MAX(pos) + {_SPAN_K} - 1 AS e
        FROM isl GROUP BY id, span_id
    ),
    toks AS (SELECT id, t.p - 1 AS pos, w[t.p] AS term
             FROM d, UNNEST(generate_series(1, len(w))) AS t(p)),
    kept AS (
        SELECT t.id, t.pos, t.term FROM toks t
        WHERE NOT EXISTS (SELECT 1 FROM spans s
                          WHERE s.id = t.id AND t.pos BETWEEN s.s AND s.e)
    ),
    rebuilt AS (
        SELECT id, string_agg(term, ' ' ORDER BY pos) AS text_deduped,
               COUNT(*) AS n_kept
        FROM kept GROUP BY id
    )
    SELECT d.id AS doc_id,
           CASE WHEN d.id IN (SELECT id FROM spans)
                THEN COALESCE(r.text_deduped, '') ELSE d.text
           END AS text_deduped,
           CAST(CASE WHEN d.id IN (SELECT id FROM spans)
                THEN len(d.w) - COALESCE(r.n_kept, 0) ELSE 0
           END AS BIGINT) AS n_tokens_removed
    FROM d LEFT JOIN rebuilt r ON d.id = r.id
"""


@register_extra(
    "dedup_spans_removed",
    oracle=_SPAN_REMOVE_ORACLE,
    doc="the TRANSFORM behind exact_substring_spans: every "
        "corpus-duplicated token span cut from every document (Lee et "
        "al. remove all copies — ownership bookkeeping buys nothing "
        "for training data). Span ranges aggregate to one row per "
        "affected doc and join back on the doc key; the cut is a "
        "narrow JVM filter over the token array (pos not in any "
        "span), unaffected docs pass through verbatim on the left "
        "join's null arm. Output: original text preserved, "
        "text_deduped + n_tokens_removed added.",
)
def dedup_spans_removed(spark, sf_dir):
    from streamz_spark.operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(
        load_table(spark, sf_dir, "documents"), k=_SPAN_K
    ).select("doc_id", "text_deduped", "n_tokens_removed")


def _pretrain_pipeline_oracle() -> str:
    from streamz_spark.operators.text import BPE_PRETOKEN_PATTERN

    bpe = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return f"""
    WITH RECURSIVE base AS (
        SELECT doc_id, text,
               length(text)::DOUBLE AS n,
               length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))::DOUBLE AS punct,
               length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
               length(regexp_replace(text, '[^ \t\n]', '', 'g'))::DOUBLE AS spaces,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS w
        FROM documents
    ),
    scored AS (
        SELECT doc_id, text, w,
               GREATEST(1.0
                 - LEAST(1.0, (CASE WHEN n > 0 THEN punct / n ELSE 0.0 END) * 4) * 0.25
                 - LEAST(1.0, (CASE WHEN n > 0 THEN digits / n ELSE 0.0 END) * 4) * 0.25
                 - (CASE WHEN (CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END) < 2
                          OR (CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END) > 12
                     THEN 0.25 ELSE 0.0 END)
                 - (CASE WHEN len(w) < 5 THEN 0.25 ELSE 0.0 END),
                 0.0) AS quality_score,
               len(list_filter(['der','die','und','das','ist','nicht','mit','ein','von','zu'], s -> list_contains(w, s))) AS h_de,
               len(list_filter(['the','and','of','to','in','is','that','for','with','was'], s -> list_contains(w, s))) AS h_en,
               len(list_filter(['el','la','de','que','los','es','en','por','con','para'], s -> list_contains(w, s))) AS h_es,
               len(list_filter(['le','la','et','les','des','est','dans','que','pour','une'], s -> list_contains(w, s))) AS h_fr
        FROM base
    ),
    langd AS (
        SELECT *,
               CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                    WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    ),
    kept AS (
        SELECT doc_id, text, w, lang_pred FROM langd
        WHERE quality_score >= 0.5 AND lang_pred <> 'und'
    ),
    dedup AS (
        SELECT doc_id AS id, text, w, lang_pred FROM kept
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
            ORDER BY doc_id) = 1
    ),
    sh3 AS (
        SELECT id, list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM dedup
    ),
    sized AS (SELECT id, len(sh) AS n_sh FROM sh3 WHERE len(sh) > 0),
    posting3 AS (SELECT id, unnest(sh) AS shingle FROM sh3),
    finter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
        FROM posting3 a JOIN posting3 b
          ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    ),
    fpairs AS (
        SELECT id_a, id_b FROM finter
        JOIN sized na ON na.id = id_a
        JOIN sized nb ON nb.id = id_b
        WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
    ),
    fedges AS (
        SELECT id_a AS u, id_b AS v FROM fpairs
        UNION SELECT id_b, id_a FROM fpairs
    ),
    freach AS (
        SELECT DISTINCT u AS id, u AS r FROM fedges
        UNION
        SELECT e.v AS id, freach.r FROM freach JOIN fedges e ON e.u = freach.id
    ),
    fcomp AS (SELECT id, MIN(r) AS cluster_id FROM freach GROUP BY id),
    fuzzy AS (
        SELECT d.* FROM dedup d
        WHERE NOT EXISTS (SELECT 1 FROM fcomp c
                          WHERE c.id = d.id AND c.id <> c.cluster_id)
    ),
    benchsh AS (
        SELECT DISTINCT unnest(list_transform(
                   generate_series(1, greatest(len(w) - 6, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
               )) AS shingle
        FROM base WHERE doc_id % 97 = 0
    ),
    sh7 AS (
        SELECT id, list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 6, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
               )) AS sh
        FROM fuzzy
    ),
    chits AS (
        SELECT p.id, COUNT(*) AS n_hits
        FROM (SELECT id, unnest(sh) AS shingle FROM sh7) p
        JOIN benchsh USING (shingle)
        GROUP BY p.id
    ),
    contam AS (
        SELECT s.id FROM sh7 s JOIN chits h USING (id)
        WHERE len(s.sh) > 0 AND h.n_hits / len(s.sh) >= 0.5
    ),
    decont AS (
        SELECT f.* FROM fuzzy f WHERE f.id NOT IN (SELECT id FROM contam)
    ),
    kg AS (
        SELECT id, t.p - 1 AS pos,
               array_to_string(w[t.p:t.p+{_SPAN_K}-1], ' ') AS gram
        FROM decont, UNNEST(generate_series(1, len(w) - {_SPAN_K} + 1)) AS t(p)
    ),
    freq AS (SELECT gram, COUNT(*) AS cnt FROM kg GROUP BY 1),
    anch AS (SELECT id, pos FROM kg JOIN freq USING (gram) WHERE cnt >= 2),
    flagged AS (
        SELECT id, pos,
               CASE WHEN LAG(pos) OVER win IS NULL
                      OR pos > LAG(pos) OVER win + {_SPAN_K}
                    THEN 1 ELSE 0 END AS new_span
        FROM anch WINDOW win AS (PARTITION BY id ORDER BY pos)
    ),
    isl AS (
        SELECT id, pos,
               SUM(new_span) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM flagged
    ),
    spans AS (
        SELECT id, MIN(pos) AS s, MAX(pos) + {_SPAN_K} - 1 AS e
        FROM isl GROUP BY id, span_id
    ),
    toks AS (SELECT id, t.p - 1 AS pos, w[t.p] AS term
             FROM decont, UNNEST(generate_series(1, len(w))) AS t(p)),
    keptt AS (
        SELECT t.id, t.pos, t.term FROM toks t
        WHERE NOT EXISTS (SELECT 1 FROM spans s
                          WHERE s.id = t.id AND t.pos BETWEEN s.s AND s.e)
    ),
    rebuilt AS (
        SELECT id, string_agg(term, ' ' ORDER BY pos) AS text_deduped,
               COUNT(*) AS n_kept
        FROM keptt GROUP BY id
    ),
    cleaned AS (
        SELECT d.id AS doc_id, d.lang_pred,
               CASE WHEN d.id IN (SELECT id FROM spans)
                    THEN COALESCE(r.text_deduped, '') ELSE d.text
               END AS text_deduped,
               CAST(CASE WHEN d.id IN (SELECT id FROM spans)
                    THEN len(d.w) - COALESCE(r.n_kept, 0) ELSE 0
               END AS BIGINT) AS n_tokens_removed
        FROM decont d LEFT JOIN rebuilt r ON d.id = r.id
    )
    SELECT doc_id, lang_pred,
           CASE WHEN ('0x' || substr(md5('42:' || doc_id), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                WHEN ('0x' || substr(md5('42:' || doc_id), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                ELSE 'test' END AS split,
           text_deduped, n_tokens_removed,
           CAST(len(regexp_extract_all(text_deduped, '{bpe}')) AS BIGINT)
               AS n_bpe_tokens
    FROM cleaned
    """


@register_extra(
    "pretrain_corpus_pipeline",
    oracle=_pretrain_pipeline_oracle(),
    doc="END-TO-END pretraining-corpus pipeline as ONE composed lazy "
        "plan, oracle-checked stage-for-stage: quality scoring + "
        "language id (narrow, zero shuffle) -> filter -> exact dedup "
        "(one fingerprint groupBy) -> FUZZY dedup (MinHash LSH "
        "candidates + exact-Jaccard verify + connected-component "
        "clusters, min-id representative kept via an anti-join "
        "drop-list) -> benchmark decontamination (7-gram overlap vs "
        "the deterministic doc_id%97 stand-in, contaminated docs "
        "dropped via a second anti-join drop-list) -> substring-level "
        "span removal (one gram-hash exchange + doc-key window, no "
        "join) -> deterministic md5 hash split (map-side) -> BPE "
        "token metering of the cleaned text (narrow regex). This is "
        "the full published recipe (RefinedWeb/CCNet/Lee et al.): "
        "exact AND near-dup AND decontamination in one lazy plan. "
        "The oracle replicates every stage independently in SQL — the "
        "fuzzy stage as the exact Jaccard pair set + recursive-CTE "
        "reachability (LSH recall failures surface as extra kept "
        "docs). Both drop-lists are tiny relative to the corpus "
        "(duplicates + contaminated docs), so the corpus-side "
        "anti-joins broadcast; the only corpus-wide exchanges are the "
        "shingle/gram key shuffles each dedup mode already pays "
        "standalone.",
)
def pretrain_corpus_pipeline(spark, sf_dir):
    return _build_pretrain_pipeline(spark, sf_dir, checkpoint=True)


def _build_pretrain_pipeline(
    spark, sf_dir, checkpoint: bool = True, first_barrier: str = "filter"
):
    """Pipeline builder; ``checkpoint=False`` keeps the whole 9-stage
    composition in ONE lazy plan so the plan contract can inspect
    every stage (the checkpointed production shape truncates the plan
    at each materialization barrier).

    ``first_barrier`` places the first materialization: ``"filter"``
    (post-quality-filter — wins at sf0.1 where the exact-dedup window
    is cheaper than a localCheckpoint round-trip, see BENCH_NOTES) or
    ``"dedup"`` (post-exact-dedup — the 100 TB shape: the rank-1
    window is a full-corpus exchange+sort there, and its three
    consumers should read a materialization, not recompute it).
    """
    from streamz_spark.operators import text as t
    from streamz_spark.operators.components import dedup_clusters as dc
    from streamz_spark.operators.contamination import contamination_check
    from streamz_spark.operators.dedup import (
        dedup_exact,
        minhash_near_duplicates,
        remove_duplicated_spans,
    )
    from streamz_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q = t.language_id(t.quality_features(docs, "text"), "text")
    kept = q.filter(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") != "und")
    ).select("doc_id", "text", "lang_pred")
    # the filtered corpus feeds every downstream consumer (dedup's
    # fingerprint aggregate + join-back, the minhash shingle pass, the
    # contamination shingling, the span k-gram pass and join-back):
    # one localCheckpoint replaces repeated evaluations of the
    # scan+regex subtree. At 100 TB this is the standard
    # persist-vs-rescan call: the materialized frame is the
    # post-filter corpus on executor-local disk, ~the same bytes one
    # extra scan would read, bought once instead of N times.
    if checkpoint and first_barrier == "filter":
        kept = kept.localCheckpoint(eager=True)
    deduped = dedup_exact(kept)
    if checkpoint and first_barrier == "dedup":
        deduped = deduped.localCheckpoint(eager=True)
    # fuzzy near-dup stage: LSH proposes, exact Jaccard verifies, CC
    # resolves clusters; only the drop-list (non-representative
    # cluster members) flows into the corpus anti-join. No broadcast
    # hint on the drop-lists: at web scale near-dup drop-lists are a
    # double-digit percentage of the corpus, so the anti-join must be
    # free to shuffle on the doc key — AQE converts to broadcast at
    # runtime whenever the drop-list is actually small.
    pairs = minhash_near_duplicates(
        deduped, num_perm=64, k=3, bands=16, threshold=0.5
    )
    fuzzy_drop = dc(deduped, pairs).filter(~F.col("keep")).select("doc_id")
    fuzzy = deduped.join(fuzzy_drop, "doc_id", "left_anti")
    # decontamination stage: same deterministic benchmark stand-in as
    # the standalone contamination_check entry (doc_id % 97 over the
    # ORIGINAL corpus — decontamination screens against the benchmark
    # regardless of whether quality filtering kept those docs)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    cont = contamination_check(fuzzy, bench, k=7, threshold=0.5)
    cont_drop = cont.filter(F.col("contaminated")).select("doc_id")
    decont = fuzzy.join(cont_drop, "doc_id", "left_anti")
    # second barrier, A/B-measured (BENCH_NOTES.md): the decontaminated
    # corpus feeds the span pass AND the span join-back AND the final
    # projection — without it the fuzzy anti-join + contamination
    # shingling subtree re-evaluates once per consumer
    if checkpoint:
        decont = decont.localCheckpoint(eager=True)
    cleaned = remove_duplicated_spans(decont, k=_SPAN_K)
    out = hash_split(cleaned, "doc_id")
    return out.select(
        "doc_id",
        "lang_pred",
        "split",
        "text_deduped",
        "n_tokens_removed",
        t.bpe_token_count("text_deduped"),
    )


# top-V LM cap for the catalog entry: the synthetic corpus has ~31
# distinct whitespace terms, so V=20 genuinely exercises the OOV arm
# (11 terms score through the lumped residual mass) at every SF
_UNLL_VOCAB = 20


def _unigram_nll_oracle(vocab_limit: int | None) -> str:
    lm_cte = (
        f"(SELECT term, cnt FROM freq "
        f"ORDER BY cnt DESC, term ASC LIMIT {vocab_limit})"
        if vocab_limit is not None
        else "(SELECT term, cnt FROM freq)"
    )
    return f"""
        WITH d AS (
            SELECT doc_id AS id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        toks AS (SELECT id, unnest(w) AS term FROM d),
        freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
        tot AS (SELECT SUM(cnt) AS n_total FROM freq),
        lm AS {lm_cte},
        scalars AS (
            SELECT n_total,
                   n_total - (SELECT SUM(cnt) FROM lm) AS oov_cnt
            FROM tot
        ),
        scored AS (
            SELECT t.id,
                   CAST(FLOOR(-ln(
                       CAST(COALESCE(lm.cnt, s.oov_cnt) AS DOUBLE)
                       / CAST(s.n_total AS DOUBLE)) * 1000000.0)
                   AS BIGINT) AS nll_micro
            FROM toks t LEFT JOIN lm USING (term) CROSS JOIN scalars s
        )
        SELECT id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               (CAST(SUM(nll_micro) AS DOUBLE) / 1000000.0)
                   / CAST(COUNT(*) AS DOUBLE) AS nll_mean,
               CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS nll_mean_micro
        FROM scored GROUP BY id
    """


_UNLL_DOC = (
    "CCNet-style LM quality signal, order-0: per-doc mean NLL under a "
    "unigram LM trained on the corpus itself, capped to the top-V "
    "terms with OOV tokens scored through the lumped residual mass "
    "(CCNet's own LM has a fixed external vocabulary — and at 100 TB "
    "an uncapped whitespace vocab is 1e8-1e9 terms, past any "
    "broadcast). Per-token NLL is floored to integer micro-nats "
    "BEFORE summation, so the per-doc total is an associative integer "
    "SUM — order-independent and bit-identical across engines — and "
    "nll_mean divides two exactly-represented integers. Scale: one "
    "map-side-combinable vocab groupBy (localCheckpointed, corpus "
    "aggregated once), bounded top-V cut, size-dispatched "
    "broadcast/shuffle-hash LM join, one doc-key groupBy; no window "
    "sort, no corpus sort-merge."
)


@register_extra(
    "unigram_nll_quality",
    oracle=_unigram_nll_oracle(_UNLL_VOCAB),
    doc=_UNLL_DOC,
)
def unigram_nll_quality(spark, sf_dir):
    from streamz_spark.operators.text import unigram_nll_quality as op

    return op(load_table(spark, sf_dir, "documents"), vocab_limit=_UNLL_VOCAB)


def _stupid_backoff_oracle(
    vocab_limit: int | None, bigram_limit: int | None, alpha: float = 0.4
) -> str:
    lm1_cte = (
        f"(SELECT term, cnt FROM cnt1 "
        f"ORDER BY cnt DESC, term ASC LIMIT {vocab_limit})"
        if vocab_limit is not None
        else "(SELECT term, cnt FROM cnt1)"
    )
    lm2_cte = (
        f"(SELECT prev, cur, cnt2 FROM pc WHERE prev IS NOT NULL "
        f"ORDER BY cnt2 DESC, prev ASC, cur ASC LIMIT {bigram_limit})"
        if bigram_limit is not None
        else "(SELECT prev, cur, cnt2 FROM pc WHERE prev IS NOT NULL)"
    )
    return f"""
        WITH d AS (
            SELECT doc_id AS id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        idx AS (
            SELECT id, w, unnest(generate_series(1, len(w))) AS pos FROM d
        ),
        toks AS (
            SELECT id,
                   CASE WHEN pos = 1 THEN NULL ELSE w[pos - 1] END AS prev,
                   w[pos] AS cur
            FROM idx
        ),
        pc AS (SELECT prev, cur, COUNT(*) AS cnt2 FROM toks GROUP BY 1, 2),
        cnt1 AS (SELECT cur AS term, SUM(cnt2) AS cnt FROM pc GROUP BY 1),
        tot AS (SELECT SUM(cnt) AS n_total FROM cnt1),
        lm1 AS {lm1_cte},
        lm2 AS {lm2_cte},
        scalars AS (
            SELECT n_total,
                   n_total - (SELECT SUM(cnt) FROM lm1) AS oov_cnt
            FROM tot
        ),
        scored AS (
            SELECT t.id,
                   CAST(FLOOR((CASE
                       WHEN t.prev IS NOT NULL AND l2.cnt2 IS NOT NULL
                            AND p1.cnt IS NOT NULL AND c1.cnt IS NOT NULL
                       THEN -ln(CAST(l2.cnt2 AS DOUBLE)
                                / CAST(p1.cnt AS DOUBLE))
                       ELSE -ln(
                           (CASE WHEN t.prev IS NULL THEN CAST(1.0 AS DOUBLE)
                                 ELSE CAST({alpha!r} AS DOUBLE) END)
                           * CAST(COALESCE(c1.cnt, s.oov_cnt) AS DOUBLE)
                           / CAST(s.n_total AS DOUBLE))
                       END) * 1000000.0)
                   AS BIGINT) AS nll_micro
            FROM toks t
            LEFT JOIN lm1 c1 ON c1.term = t.cur
            LEFT JOIN lm1 p1 ON p1.term = t.prev
            LEFT JOIN lm2 l2 ON l2.prev = t.prev AND l2.cur = t.cur
            CROSS JOIN scalars s
        )
        SELECT id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               (CAST(SUM(nll_micro) AS DOUBLE) / 1000000.0)
                   / CAST(COUNT(*) AS DOUBLE) AS nll_mean,
               CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS nll_mean_micro
        FROM scored GROUP BY id
    """


_SB_VOCAB, _SB_BIGRAMS = 50, 500


@register_extra(
    "stupid_backoff_nll",
    oracle=_stupid_backoff_oracle(_SB_VOCAB, _SB_BIGRAMS),
    doc="Bigram stupid-backoff LM quality score (Brants et al. 2007 — "
        "the backoff designed for distributed MapReduce-scale LM "
        "estimation: relative frequencies + fixed 0.4 factor, no "
        "discounting or normalization pass). Order-1 upgrade of "
        "unigram_nll_quality for CCNet-style perplexity filtering. "
        "ONE corpus-sized aggregate: every token emits (prev, cur) "
        "with NULL prev at position 0, groupBy(prev, cur) gives the "
        "bigram type table and the unigram counts fall out as a "
        "bigram-TYPE-sized re-aggregation (each token occurs exactly "
        "once as cur). Top-V unigram cap with lumped-OOV residual "
        "mass + top-B bigram cap (a missing bigram just backs off — "
        "the cap degrades smoothly by construction). Size-dispatched "
        "broadcast/shuffle-hash LM joins; integer micro-nat floors "
        "before summation keep both engines bit-identical.",
)
def stupid_backoff_nll(spark, sf_dir):
    from streamz_spark.operators.text import stupid_backoff_nll_quality as op

    return op(
        load_table(spark, sf_dir, "documents"),
        vocab_limit=_SB_VOCAB,
        bigram_limit=_SB_BIGRAMS,
    )


@register_extra(
    "stupid_backoff_nll_full",
    oracle=_stupid_backoff_oracle(None, None),
    doc="uncapped arm of stupid_backoff_nll (full corpus LM, every "
        "observed bigram eligible): pins that the capped operator "
        "degenerates to the exact stupid-backoff score when both caps "
        "are off. Same integer-micro-nat determinism contract.",
)
def stupid_backoff_nll_full(spark, sf_dir):
    from streamz_spark.operators.text import stupid_backoff_nll_quality as op

    return op(load_table(spark, sf_dir, "documents"))


@register_extra(
    "unigram_nll_full_vocab",
    oracle=_unigram_nll_oracle(None),
    doc="exact-LM arm of unigram_nll_quality (vocab_limit=None): every "
        "token is in-vocab, the OOV mass is zero and never consulted — "
        "pins that the capped operator degenerates to the exact "
        "corpus LM when the cap is off. Same integer-micro-nat "
        "determinism contract.",
)
def unigram_nll_full_vocab(spark, sf_dir):
    from streamz_spark.operators.text import unigram_nll_quality as op

    return op(load_table(spark, sf_dir, "documents"), vocab_limit=None)


@register_extra(
    "semdedup_embedding",
    # seed centroids (64 lowest-id vectors) make the whole pipeline —
    # cell assignment, within-cell cosine, min-id keep rule — exactly
    # reproducible in SQL; KMeans centroids are the production default
    # (recall-tested path shares ivf_ann's machinery)
    oracle="""
        WITH v AS (
            SELECT vec_id AS id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
        ), cent AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cell, v AS cvec
            FROM (SELECT * FROM n ORDER BY id LIMIT 64)
        ), scored AS (
            SELECT n.id, n.v, n.norm, c.cell,
                   list_sum(list_transform(range(1, len(n.v) + 1),
                       i -> (n.v[i] - c.cvec[i]) * (n.v[i] - c.cvec[i]))) AS d2
            FROM n CROSS JOIN cent c
        ), assigned AS (
            SELECT id, v, norm, cell FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                             ORDER BY d2 ASC, cell ASC) AS rnk
                FROM scored
            ) WHERE rnk = 1
        ), dropped AS (
            SELECT DISTINCT b.id FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.id < b.id
            WHERE CASE WHEN a.norm * b.norm > 0
                       THEN list_dot_product(a.v, b.v) / (a.norm * b.norm)
                       ELSE 0.0 END >= 0.9
        )
        SELECT id AS vec_id, CAST(cell AS BIGINT) AS cell,
               id NOT IN (SELECT id FROM dropped) AS keep
        FROM assigned
    """,
    doc="SemDeDup (Abbas et al. 2023): semantic dedup by clustering "
        "the embedding space and comparing cosines only WITHIN a "
        "cluster — the published recipe for pruning corpora where "
        "near-duplicates share no exact tokens. Centroid assignment "
        "is one broadcast + narrow argmin (no shuffle); the only "
        "corpus shuffle is the self-join on the cell key, O(cell "
        "size^2) per cluster with sqrt-sized cells, never all-pairs. "
        "keep=false for vectors with cosine >= 0.9 to a lower-id "
        "vector in their cluster (min-id keep, same rule as every "
        "other dedup mode).",
)
def semdedup_embedding(spark, sf_dir):
    from streamz_spark.operators.dedup import semdedup

    out = semdedup(
        load_table(spark, sf_dir, "embeddings"),
        n_clusters=64, threshold=0.9, centroids="seed",
    )
    return out.select("vec_id", F.col("cell").cast("long").alias("cell"), "keep")


_NBQ_VOCAB = 20  # past the OOV boundary at every SF (corpus vocab ~31)


@register_extra(
    "nb_quality_classifier",
    oracle=f"""
        WITH d AS (
            SELECT doc_id AS id, (lang = 'en') AS y,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        toks AS (SELECT id, y, unnest(w) AS term FROM d),
        freq AS (
            SELECT term,
                   SUM(CASE WHEN y THEN 1 ELSE 0 END) AS cnt_pos,
                   SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cnt_neg
            FROM toks GROUP BY 1
        ),
        lm AS (SELECT * FROM freq
               ORDER BY (cnt_pos + cnt_neg) DESC, term ASC LIMIT {_NBQ_VOCAB}),
        scal AS (
            SELECT (SELECT SUM(cnt_pos) FROM freq) - (SELECT SUM(cnt_pos) FROM lm) AS oov_pos,
                   (SELECT SUM(cnt_neg) FROM freq) - (SELECT SUM(cnt_neg) FROM lm) AS oov_neg,
                   CAST((SELECT SUM(cnt_pos) FROM freq) AS DOUBLE)
                       + 1.0 * ((SELECT COUNT(*) FROM lm) + 1) AS denom_pos,
                   CAST((SELECT SUM(cnt_neg) FROM freq) AS DOUBLE)
                       + 1.0 * ((SELECT COUNT(*) FROM lm) + 1) AS denom_neg,
                   CAST(FLOOR((ln(CAST((SELECT COUNT(*) FROM d WHERE y) AS DOUBLE))
                             - ln(CAST((SELECT COUNT(*) FROM d WHERE NOT y) AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS prior_micro
        ),
        scored AS (
            SELECT t.id,
                   CAST(FLOOR((
                       ln((CAST(COALESCE(lm.cnt_pos, s.oov_pos) AS DOUBLE) + 1.0)
                          / s.denom_pos)
                     - ln((CAST(COALESCE(lm.cnt_neg, s.oov_neg) AS DOUBLE) + 1.0)
                          / s.denom_neg)
                   ) * 1000000.0) AS BIGINT) AS llr_micro,
                   s.prior_micro
            FROM toks t LEFT JOIN lm USING (term) CROSS JOIN scal s
        )
        SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(llr_micro) + MAX(prior_micro) AS BIGINT) AS score_micro,
               CAST(SUM(llr_micro) + MAX(prior_micro) AS DOUBLE) / 1000000.0 AS score,
               (SUM(llr_micro) + MAX(prior_micro)) > 0 AS pred
        FROM scored GROUP BY id
    """,
    doc="model-based quality filtering (DCLM / FineWeb-Edu /GPT-3 "
        "recipe: train a linear text classifier on weak labels, score "
        "the corpus): multinomial Naive Bayes — the closed-form member "
        "of the fastText family, so 'training' is two token-count "
        "aggregates and the whole pipeline is one deterministic plan. "
        "Weak label here: the documents table's lang == 'en'. Top-V "
        "vocab cut with per-class OOV residual mass, Laplace alpha=1, "
        "per-token log-likelihood-ratio floored to integer micro-nats "
        "before the associative SUM, class-prior log-odds added per "
        "doc. Same size-dispatched model join and exchange budget as "
        "unigram_nll_quality.",
)
def nb_quality_classifier(spark, sf_dir):
    from streamz_spark.operators.text import nb_quality_classifier as op

    docs = load_table(spark, sf_dir, "documents")
    return op(
        docs.withColumn("__y", F.col("lang") == "en"),
        label_col="__y",
        vocab_limit=_NBQ_VOCAB,
    )


_DSIR_K = 100
_DSIR_B = 4096


@register_extra(
    "dsir_importance_resample",
    oracle=f"""
        WITH d AS (
            SELECT doc_id AS id, (lang = 'en') AS y,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        grams AS (
            SELECT id, y, g FROM d,
            UNNEST(list_concat(
                w,
                list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                               i -> w[i] || ' ' || w[i+1])
            )) AS t(g)
        ),
        occ AS (
            SELECT id, y,
                   ('0x' || substr(md5('42:' || g), 1, 15))::BIGINT % {_DSIR_B} AS b
            FROM grams
        ),
        counts AS (
            SELECT b, COUNT(*) AS cnt_raw,
                   SUM(CASE WHEN y THEN 1 ELSE 0 END) AS cnt_t
            FROM occ GROUP BY 1
        ),
        tot AS (SELECT SUM(cnt_raw) AS n_raw, SUM(cnt_t) AS n_t FROM counts),
        llr AS (
            SELECT b,
                   CAST(FLOOR((
                       ln((CAST(cnt_t AS DOUBLE) + 1.0)
                          / (CAST(t.n_t AS DOUBLE) + 1.0 * {_DSIR_B}))
                     - ln((CAST(cnt_raw AS DOUBLE) + 1.0)
                          / (CAST(t.n_raw AS DOUBLE) + 1.0 * {_DSIR_B}))
                   ) * 1000000.0) AS BIGINT) AS llr_micro
            FROM counts CROSS JOIN tot t
        ),
        logw AS (
            SELECT o.id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(l.llr_micro) AS BIGINT) AS logw_micro
            FROM occ o JOIN llr l USING (b) GROUP BY o.id
        ),
        keyed AS (
            SELECT *,
                   logw_micro + CAST(FLOOR(-ln(-ln(
                       (('0x' || substr(md5('42:g:' || id), 1, 8))::BIGINT + 0.5)
                       / 4294967296.0
                   )) * 1000000.0) AS BIGINT) AS gumbel_key_micro
            FROM logw
        )
        SELECT id AS doc_id, n_grams, logw_micro, gumbel_key_micro,
               ROW_NUMBER() OVER (ORDER BY gumbel_key_micro DESC, id ASC)
                   <= {_DSIR_K} AS selected
        FROM keyed
    """,
    doc="DSIR — Data Selection via Importance Resampling (Xie et al. "
        "2023): hashed unigram+bigram features, target-vs-raw "
        "bag-of-ngrams importance weights, Gumbel-top-k sampling "
        "without replacement proportional to the weights. Target "
        "domain: lang == 'en'. Everything md5-derived and "
        "integer-micro-nat floored, so the sampled set is "
        "bit-reproducible in SQL. Scale: one corpus explode into one "
        "n_buckets-row conditional-count aggregate, broadcast weight "
        "join-back, sort+limit top-k (per-partition heaps), broadcast "
        "selected-flag join — no corpus self-join, no global window.",
)
def dsir_importance_resample(spark, sf_dir):
    from streamz_spark.operators.sampling import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("lang") == "en", k=_DSIR_K, n_buckets=_DSIR_B, seed="42"
    )


_CHUNK_MAX = 32
_CHUNK_OVERLAP = 8


@register_extra(
    "chunk_documents",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        ch AS (
            SELECT doc_id,
                   CAST((s - 1) / {_CHUNK_MAX - _CHUNK_OVERLAP} AS BIGINT) AS chunk_idx,
                   w[s : s + {_CHUNK_MAX} - 1] AS c
            FROM d, UNNEST(generate_series(1, greatest(len(w) - {_CHUNK_OVERLAP}, 1), {_CHUNK_MAX - _CHUNK_OVERLAP})) AS t(s)
            WHERE len(w) > 0
        )
        SELECT doc_id, chunk_idx,
               CAST(len(c) AS BIGINT) AS n_chunk_tokens,
               array_to_string(c, ' ') AS chunk_text
        FROM ch
    """,
    doc="long-document chunking into training windows: at most "
        "max_tokens per chunk with overlap tokens of carried context "
        "(stride = max - overlap) — the upstream step pack_sequences "
        "defers for over-budget docs. Pure narrow transform: stride "
        "positions + slices computed in ONE projection, posexplode "
        "emits chunks; no shuffle, no UDF, output bounded by "
        "total_tokens/stride.",
)
def chunk_documents(spark, sf_dir):
    from streamz_spark.operators.export import chunk_documents as op

    return op(
        load_table(spark, sf_dir, "documents"),
        max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP,
    )


_PARA_WINDOW = 20


@register_extra(
    "dedup_paragraphs",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        ex AS (
            SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS t
            FROM d WHERE len(w) > 0
        ),
        paras AS (
            SELECT doc_id, CAST(FLOOR((i - 1) / {_PARA_WINDOW}) AS BIGINT) AS pidx,
                   string_agg(t, ' ' ORDER BY i) AS ptext
            FROM ex GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY ptext ORDER BY doc_id, pidx) = 1 AS keep
            FROM paras
        )
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN keep THEN ptext END,
                                   ' ' ORDER BY pidx), '') AS text_deduped,
               CAST(COUNT(*) AS BIGINT) AS n_paras,
               CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_paras_dropped
        FROM ranked GROUP BY doc_id
    """,
    doc="paragraph-level exact dedup (CCNet shard-hash dedup / "
        "MassiveText repeated-paragraph removal): keep each "
        "paragraph's corpus-wide first occurrence by (doc_id, "
        "position), cut every later copy from its document; fixed "
        "20-token segments stand in for paragraph breaks on this "
        "corpus. ONE scan, TWO exchanges (window rank on the md5 "
        "paragraph key — dedup_exact's rank-1 shape — then the "
        "per-doc reassembly groupBy), ZERO joins.",
)
def dedup_paragraphs(spark, sf_dir):
    from streamz_spark.operators.dedup import dedup_paragraphs as op

    return op(load_table(spark, sf_dir, "documents"), window=_PARA_WINDOW)


@register_extra(
    "temperature_mixture_resample",
    oracle="""
        WITH per AS (
            SELECT lang AS domain, COUNT(*) AS n_d FROM documents GROUP BY 1
        ),
        w AS (
            SELECT domain, n_d,
                   CAST(FLOOR(sqrt(CAST(n_d AS DOUBLE)) * 1000000.0) AS BIGINT)
                       AS w_d
            FROM per
        ),
        tot AS (SELECT SUM(n_d) AS n_total, SUM(w_d) AS w_total FROM w),
        rates AS (
            SELECT domain,
                   CAST(FLOOR(
                       (CAST(n_total AS DOUBLE) * CAST(w_d AS DOUBLE))
                       / (CAST(w_total AS DOUBLE) * CAST(n_d AS DOUBLE))
                       * 1000000.0) AS BIGINT) AS rate_ppm
            FROM w CROSS JOIN tot
        ),
        drawn AS (
            SELECT d.doc_id, r.domain, r.rate_ppm,
                   r.rate_ppm // 1000000
                   + CASE WHEN ('0x' || substr(md5('tmix:' || d.doc_id), 1, 8))::BIGINT
                               % 1000000 < r.rate_ppm % 1000000
                          THEN 1 ELSE 0 END AS n_copies
            FROM documents d JOIN rates r ON d.lang = r.domain
        )
        SELECT doc_id, domain, rate_ppm,
               CAST(unnest(generate_series(0, CAST(n_copies AS BIGINT) - 1))
                    AS BIGINT) AS copy_idx
        FROM drawn WHERE n_copies >= 1
    """,
    doc="temperature-scaled domain resampling (mBERT/XLM-R/mT5 mixing "
        "rule, p_d ∝ n_d^alpha at alpha=0.5) WITH repetition: "
        "over-represented languages Bernoulli-downsample, low-resource "
        "languages upsample by epoch repetition (full copies + one "
        "fractional Bernoulli copy, each tagged copy_idx), holding the "
        "total document budget at corpus size. alpha=0.5 keeps the "
        "per-domain weights bit-portable (IEEE sqrt, floored to "
        "micro-units); rates are one multiply-divide chain over "
        "exactly-represented integer doubles with identical "
        "parenthesization in both engines; the per-row draw is the "
        "module's md5 ppm hash. Scale: one domain-cardinality groupBy, "
        "rates broadcast back, map-side filter/explode — the corpus "
        "never shuffles.",
)
def temperature_mixture_resample(spark, sf_dir):
    from streamz_spark.operators.sampling import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mixture_sample(
        docs, "lang", id_col="doc_id", alpha=0.5, repeat=True
    )
    return out.select(
        "doc_id", F.col("lang").alias("domain"), "rate_ppm", "copy_idx"
    )


@register_extra(
    "bpe_learned_tokenizer",
    oracle=None,
    doc="ITERATIVE (rows-only + determinism bar): learn a 24-merge BPE "
        "vocabulary from the corpus (Sennrich et al. 2016 on word-TYPE "
        "frequencies — the one corpus-sized stage is a "
        "map-side-combinable pre-token groupBy; merge learning runs on "
        "the compact type table, driver arm under 2M types with an "
        "identical distributed merge-round arm above, "
        "differential-tested), then meter the corpus under the learned "
        "tokenizer: explode + per-doc word pre-aggregate + "
        "size-dispatched segmentation join + doc-key sum. Global-argmax-"
        "per-iteration learning is not expressible in one SQL query, so "
        "this entry carries no DuckDB oracle; correctness is pinned by "
        "tests/test_tokenizer.py (textbook vectors, hypothesis "
        "reconstruction property, arm differential, python meter "
        "differential) and the harness requires two runs to be "
        "bit-identical.",
)
def bpe_learned_tokenizer(spark, sf_dir):
    from streamz_spark.operators.tokenizer import (
        bpe_learned_token_meter,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=24)
    return bpe_learned_token_meter(docs, merges)


# --------------------------------------------------------------------------
# corpus data card — the per-source profile a pretraining team publishes
# --------------------------------------------------------------------------

_DATA_CARD_ORACLE = r"""
    WITH perdoc AS (
        SELECT source, lang,
               CASE WHEN length(trim(lower(text))) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+'))
               END AS n_tok,
               CAST(length(text) AS BIGINT) AS n_ch,
               CAST(length(text) AS DOUBLE)
                   - CAST(length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS DOUBLE)
                   AS spaces
        FROM documents
    ),
    pd2 AS (
        SELECT source, lang, n_tok, n_ch,
               CAST(FLOOR(
                   (CASE WHEN n_tok > 0
                         THEN (CAST(n_ch AS DOUBLE) - spaces)
                              / CAST(n_tok AS DOUBLE)
                         ELSE 0.0 END) * 1000000.0)
               AS BIGINT) AS mwl_micro
        FROM perdoc
    ),
    slc AS (
        SELECT source, lang,
               COUNT(*) AS n,
               SUM(n_tok) AS tok,
               SUM(n_ch) AS ch,
               SUM(mwl_micro) AS mwl
        FROM pd2 GROUP BY 1, 2
    ),
    src AS (
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS n_tokens,
               CAST(SUM(ch) AS BIGINT) AS n_chars,
               CAST(SUM(mwl) AS BIGINT) AS mwl_sum,
               CAST(COUNT(*) AS BIGINT) AS n_langs
        FROM slc GROUP BY 1
    ),
    top AS (
        SELECT source, lang AS top_lang, CAST(n AS BIGINT) AS top_lang_docs
        FROM (SELECT source, lang, n,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY n DESC, lang ASC) AS rk
              FROM slc)
        WHERE rk = 1
    ),
    pctl AS (
        SELECT source, quantile_cont(n_tok, 0.5) AS tokens_per_doc_p50
        FROM pd2 GROUP BY 1
    )
    SELECT s.source, s.n_docs, s.n_tokens, s.n_chars,
           CAST(s.n_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE)
               AS tokens_per_doc_mean,
           p.tokens_per_doc_p50,
           CAST(s.mwl_sum // s.n_docs AS BIGINT) AS mean_word_len_micro,
           s.n_langs, t.top_lang, t.top_lang_docs
    FROM src s
    JOIN top t ON s.source = t.source
    JOIN pctl p ON s.source = p.source
"""


@register_extra(
    "corpus_data_card",
    oracle=_DATA_CARD_ORACLE,
    doc="per-source corpus profile (the 'data card' a pretraining team "
        "publishes): doc/token/char totals, exact median tokens-per-doc, "
        "mean word length (integer micro units — associative sums, no "
        "float-order exposure), language count and the dominant language "
        "with a DETERMINISTIC tie-break (docs desc, lang asc). Shape: one "
        "narrow per-doc projection feeds a (source, lang) map-side-"
        "combinable aggregate; every source-level stat except the median "
        "derives from that tiny table, so the corpus shuffles only the "
        "doc-level token counts for the exact percentile (kept exact for "
        "oracle reproducibility — the 100 TB call is the operator's "
        "p50='sketch' arm: percentile_approx, whose map-side partial is "
        "a bounded mergeable sketch instead of the full value list; "
        "tolerance differential + plan contract in tests/test_quality.py). "
        "All joins are source-cardinality.",
)
def corpus_data_card(spark, sf_dir):
    from streamz_spark.operators.export import corpus_data_card as data_card

    docs = load_table(spark, sf_dir, "documents")
    return data_card(docs, p50="exact")


# --------------------------------------------------------------------------
# incremental dedup: today's ingest screened against the historical index
# --------------------------------------------------------------------------

_INCR_DEDUP_ORACLE = r"""
    WITH inc AS (SELECT * FROM documents WHERE doc_id % 10 < 2),
    idx AS (SELECT * FROM documents WHERE doc_id % 10 >= 2),
    exact_drop AS (
        SELECT DISTINCT i.doc_id
        FROM inc i JOIN idx x
          ON md5(regexp_replace(lower(trim(i.text)), '\s+', ' ', 'g'))
           = md5(regexp_replace(lower(trim(x.text)), '\s+', ' ', 'g'))
    ),
    shi AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM (
            SELECT doc_id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\s+')
                   END AS w
            FROM inc
        )
    ),
    shx AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM (
            SELECT doc_id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\s+')
                   END AS w
            FROM idx
        )
    ),
    sized_i AS (SELECT id, len(sh) AS n_sh FROM shi WHERE len(sh) > 0),
    sized_x AS (SELECT id, len(sh) AS n_sh FROM shx WHERE len(sh) > 0),
    posting_i AS (SELECT id, unnest(sh) AS shingle FROM shi WHERE len(sh) > 0),
    posting_x AS (SELECT id, unnest(sh) AS shingle FROM shx WHERE len(sh) > 0),
    inter AS (
        SELECT i.id AS inc_id, x.id AS idx_id, COUNT(*) AS n_common
        FROM posting_i i JOIN posting_x x ON i.shingle = x.shingle
        GROUP BY 1, 2
    ),
    fuzzy_drop AS (
        SELECT DISTINCT inc_id AS doc_id
        FROM inter
        JOIN sized_i ni ON ni.id = inter.inc_id
        JOIN sized_x nx ON nx.id = inter.idx_id
        WHERE n_common / (ni.n_sh + nx.n_sh - n_common) >= 0.5
    )
    SELECT * FROM inc
    WHERE doc_id NOT IN (SELECT doc_id FROM exact_drop)
      AND doc_id NOT IN (SELECT doc_id FROM fuzzy_drop)
"""


@register_extra(
    "incremental_dedup_vs_index",
    oracle=_INCR_DEDUP_ORACLE,
    doc="the daily-crawl production mode: a 20% incoming slice screened "
        "against the 80% historical index — exact (normalized-md5 "
        "anti-join) plus MinHash-LSH near-dup (band-bucket equi-join "
        "incoming x index, NEVER an index self-join, exact-Jaccard "
        "verify). Duplicates within incoming are kept by contract "
        "(self-dedup composes separately). Like minhash_near_duplicates, "
        "the oracle computes the exact incoming-vs-index pair set "
        "independently, so a banding recall drop shows up as extra "
        "kept rows.",
)
def incremental_dedup_vs_index(spark, sf_dir):
    from streamz_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    inc = docs.where(F.col("doc_id") % 10 < 2)
    idx = docs.where(F.col("doc_id") % 10 >= 2)
    return incremental_dedup(inc, idx, num_perm=64, k=3, bands=16, threshold=0.5)


# --------------------------------------------------------------------------
# per-source quality pruning (FineWeb-style top-slice selection)
# --------------------------------------------------------------------------

_TOP_QUALITY_ORACLE = r"""
    WITH base AS (
        SELECT doc_id, source,
               length(text)::DOUBLE AS n,
               length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))::DOUBLE AS punct,
               length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
               length(regexp_replace(text, '[^ ' || chr(9) || chr(10) || ']', '', 'g'))::DOUBLE AS spaces,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\s+')
               END AS w
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source,
               GREATEST(1.0
                 - LEAST(1.0, (CASE WHEN n > 0 THEN punct / n ELSE 0.0 END) * 4) * 0.25
                 - LEAST(1.0, (CASE WHEN n > 0 THEN digits / n ELSE 0.0 END) * 4) * 0.25
                 - (CASE WHEN (CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END) < 2
                          OR (CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END) > 12
                     THEN 0.25 ELSE 0.0 END)
                 - (CASE WHEN len(w) < 5 THEN 0.25 ELSE 0.0 END),
                 0.0) AS quality_score
        FROM base
    ),
    counted AS (SELECT source, COUNT(*) AS n_src FROM scored GROUP BY 1)
    SELECT doc_id, source, quality_score
    FROM scored JOIN counted USING (source)
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY quality_score DESC, doc_id ASC
    ) <= CEIL(0.3 * n_src)
"""


@register_extra(
    "select_top_quality_per_source",
    oracle=_TOP_QUALITY_ORACLE,
    doc="FineWeb-style per-source quality pruning: keep the top 30% of "
        "each source by the composite quality score, exact "
        "ceil(frac*n_g) per group with a deterministic tie-break "
        "(score desc, doc_id asc). Rank arm — per-group window sort is "
        "the honest exact-k cost; the no-sort threshold arm (percentile "
        "cutoff broadcast join) is property-tested in "
        "tests/test_sampling_contamination.py.",
)
def select_top_quality_per_source(spark, sf_dir):
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.sampling import select_top_quality
    from streamz_spark.operators.text import quality_features

    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
    scored = quality_features(docs, "text").select(
        "doc_id", "source", "quality_score"
    )
    return select_top_quality(scored, frac=0.3, method="rank")


_TOKEN_BUDGET_ORACLE = r"""
    WITH base AS (
        SELECT doc_id, source,
               length(text)::DOUBLE AS n,
               length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))::DOUBLE AS punct,
               length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
               length(regexp_replace(text, '[^ ' || chr(9) || chr(10) || ']', '', 'g'))::DOUBLE AS spaces,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\s+')
               END AS w
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source,
               CAST(len(w) AS BIGINT) AS n_tokens,
               GREATEST(1.0
                 - LEAST(1.0, (CASE WHEN n > 0 THEN punct / n ELSE 0.0 END) * 4) * 0.25
                 - LEAST(1.0, (CASE WHEN n > 0 THEN digits / n ELSE 0.0 END) * 4) * 0.25
                 - (CASE WHEN (CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END) < 2
                          OR (CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END) > 12
                     THEN 0.25 ELSE 0.0 END)
                 - (CASE WHEN len(w) < 5 THEN 0.25 ELSE 0.0 END),
                 0.0) AS quality_score
        FROM base
    )
    SELECT doc_id, source, n_tokens, quality_score
    FROM scored
    QUALIFY SUM(n_tokens) OVER (
        PARTITION BY source
        ORDER BY quality_score DESC, doc_id ASC
        ROWS UNBOUNDED PRECEDING
    ) <= 5000
"""


@register_extra(
    "select_to_token_budget_per_source",
    oracle=_TOKEN_BUDGET_ORACLE,
    doc="greedy best-first selection under a 5000-token budget per "
        "source: rank each source by quality (deterministic tie-break), "
        "keep the maximal prefix whose integer token sum fits. Prefix "
        "semantics keep the selection a pure window predicate — the "
        "running total is an associative integer cumsum, bit-"
        "reproducible in SQL. The keyless form routes through "
        "order.global_cumulative's two-level scan (no single-partition "
        "window), differential-tested in "
        "tests/test_sampling_contamination.py.",
)
def select_to_token_budget_per_source(spark, sf_dir):
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.sampling import select_to_token_budget
    from streamz_spark.operators.text import quality_features

    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
    scored = quality_features(docs, "text").select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    return select_to_token_budget(
        scored, budget_tokens=5000, tokens_col="n_tokens", by="source"
    )


@register_extra(
    "skew_profile_events",
    oracle="""
        WITH counts AS (
            SELECT user_id AS key, COUNT(*) AS n_rows
            FROM events GROUP BY 1
        ),
        tot AS (SELECT SUM(n_rows) AS total FROM counts),
        hot AS (
            SELECT key, n_rows FROM counts
            ORDER BY n_rows DESC, key ASC LIMIT 20
        )
        SELECT key,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST((n_rows * 1000000) // t.total AS BIGINT) AS share_ppm,
               CAST((SUM(n_rows) OVER (ORDER BY n_rows DESC, key ASC
                     ROWS UNBOUNDED PRECEDING) * 1000000) // t.total
                    AS BIGINT) AS cum_share_ppm,
               CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC)
                    AS INT) AS rank
        FROM hot CROSS JOIN tot t
    """,
    doc="key-skew diagnostic on the shuffle key you are about to "
        "groupBy/join on: the 20 hottest keys with absolute count, "
        "integer-ppm share and cumulative share (deterministic "
        "tie-break). One map-side-combinable key groupBy + bounded "
        "TakeOrdered + broadcast total; the ranking windows touch "
        "<= top rows, never corpus rows. The decision input for "
        "salted_agg/salted_join vs AQE-only.",
)
def skew_profile_events(spark, sf_dir):
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.skew import skew_profile

    events = ensure_scan_parallelism(load_table(spark, sf_dir, "events"))
    return skew_profile(events, "user_id", top=20)


@register_extra(
    "corpus_diff_versions",
    # v_old = docs with doc_id % 7 != 0, and docs with doc_id % 11 == 0
    # get '[OLD] ' prepended (simulated prior revision); v_new = the
    # table as-is. Diff: %7==0 -> added, %11==0 -> changed (unless also
    # %7==0), rest unchanged; nothing removed in this construction.
    oracle="""
        WITH v_old AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 0 THEN '[OLD] ' || text
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 <> 0
        ),
        o AS (
            SELECT doc_id AS id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_old
            FROM v_old
        ),
        n AS (
            SELECT doc_id AS id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_new
            FROM documents
        )
        SELECT COALESCE(o.id, n.id) AS doc_id,
               CASE WHEN fp_old IS NULL THEN 'added'
                    WHEN fp_new IS NULL THEN 'removed'
                    WHEN fp_old = fp_new THEN 'unchanged'
                    ELSE 'changed' END AS status,
               fp_old, fp_new
        FROM o FULL OUTER JOIN n ON o.id = n.id
    """,
    doc="dataset-release audit: full-outer join of two snapshot "
        "fingerprint projections (32-byte digests shuffle, never "
        "document bodies) classifying every doc_id as added/removed/"
        "changed/unchanged; md5 fingerprints keep the whole diff "
        "SQL-reproducible",
)
def corpus_diff_versions(spark, sf_dir):
    from streamz_spark.io import ensure_scan_parallelism
    from streamz_spark.operators.export import corpus_diff

    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
    v_old = docs.where(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.lit("[OLD] "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(v_old, docs)


# --------------------------------------------------------------------------
# product-quantization ANN (Jégou et al. 2011) — the memory arm of the
# ANN family: IVF bounds candidate COUNT, PQ bounds BYTES PER CANDIDATE
# --------------------------------------------------------------------------

_PQ_ORACLE = """
    WITH v AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), n AS (
        SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
    ), sv AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS j, v
        FROM (SELECT * FROM n ORDER BY id LIMIT 16)
    ), cb AS (
        SELECT s.s, sv.j,
               list_transform(range(1, 17), i -> sv.v[s.s*16 + i]) AS cw
        FROM sv CROSS JOIN (SELECT unnest(range(0, 4)) AS s) s
    ), enc AS (
        SELECT id, s, j AS code FROM (
            SELECT n.id, cb.s, cb.j,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.id, cb.s
                       ORDER BY list_sum(list_transform(range(1, 17),
                           i -> (n.v[cb.s*16 + i] - cb.cw[i])
                              * (n.v[cb.s*16 + i] - cb.cw[i]))) ASC,
                                cb.j ASC) AS rnk
            FROM n CROSS JOIN cb
        ) WHERE rnk = 1
    ), qd AS (
        SELECT n.id AS qid, cb.s, cb.j,
               list_sum(list_transform(range(1, 17),
                   i -> (n.v[cb.s*16 + i] - cb.cw[i])
                      * (n.v[cb.s*16 + i] - cb.cw[i]))) AS d2
        FROM n CROSS JOIN cb WHERE n.id < 20
    ), adc AS (
        SELECT q.qid, e.id AS cid,
               MAX(CASE WHEN e.s = 0 THEN q.d2 END)
             + MAX(CASE WHEN e.s = 1 THEN q.d2 END)
             + MAX(CASE WHEN e.s = 2 THEN q.d2 END)
             + MAX(CASE WHEN e.s = 3 THEN q.d2 END) AS adc_d2
        FROM enc e JOIN qd q ON e.s = q.s AND e.code = q.j
        WHERE e.id != q.qid
        GROUP BY q.qid, e.id
    ), short AS (
        SELECT qid, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY adc_d2 ASC, cid ASC) AS arnk
            FROM adc
        ) WHERE arnk <= 30
    ), scored AS (
        SELECT s.qid, s.cid,
               CASE WHEN q.norm * c.norm > 0
                    THEN list_dot_product(q.v, c.v) / (q.norm * c.norm)
                    ELSE 0.0 END AS cosine
        FROM short s JOIN n q ON q.id = s.qid JOIN n c ON c.id = s.cid
    )
    SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, cid ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 5
"""


@register_extra(
    "ann_pq_topk",
    oracle=_PQ_ORACLE,
    doc="product-quantization ANN top-k (Jégou et al. 2011): m=4 "
        "subspaces x 16 codewords, asymmetric-distance (ADC) scan of "
        "4-byte codes, exact-cosine re-rank of the top-30 shortlist. "
        "The memory arm of the ANN family — the ADC pass moves "
        "(m + id) bytes per corpus row instead of 8*dim (128x smaller "
        "at 64d float64), and full vectors are touched again only for "
        "queries x rerank winners. Encoding is a NARROW projection "
        "(argmin over the packed broadcast codebook — no shuffle, no "
        "UDF); the only corpus exchange is the shortlist window over "
        "(qid, cid, adc) triples. Seed codebooks (16 lowest-id "
        "vectors' sub-vectors) make every stage SQL-reproducible — "
        "same bar as ann_ivf_topk's seed centroids; the "
        "KMeans-per-subspace production arm is recall-tested in "
        "tests/test_dedup.py.",
)
def ann_pq_topk(spark, sf_dir):
    from streamz_spark.operators.similarity import pq_ann

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_ann(emb, k=5, m=4, ks=16, rerank=30, query_limit=20, codebooks="seed")
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing — the selection stage that
# sits between LM scoring and training-set assembly
# --------------------------------------------------------------------------

def _perplexity_buckets_oracle() -> str:
    # the NLL CTE is the unigram_nll_quality oracle verbatim (nested
    # WITH — single source of truth for the LM semantics), wrapped with
    # the per-language floored tercile cuts and the comparison classify
    return f"""
        WITH nll AS ({_unigram_nll_oracle(_UNLL_VOCAB)}),
        wl AS (
            SELECT n.*, d.lang
            FROM nll n JOIN documents d USING (doc_id)
        ),
        cuts AS (
            SELECT lang,
                   CAST(FLOOR(quantile_cont(nll_mean_micro, 1.0/3.0)) AS BIGINT) AS p33,
                   CAST(FLOOR(quantile_cont(nll_mean_micro, 2.0/3.0)) AS BIGINT) AS p66
            FROM wl GROUP BY lang
        )
        SELECT w.doc_id, w.lang, w.n_tokens, w.nll_mean_micro,
               CASE WHEN w.nll_mean_micro <= c.p33 THEN 'head'
                    WHEN w.nll_mean_micro <= c.p66 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               (w.nll_mean_micro <= c.p66) AS kept
        FROM wl w JOIN cuts c USING (lang)
    """


@register_extra(
    "perplexity_buckets",
    oracle=_perplexity_buckets_oracle(),
    doc="CCNet head/middle/tail split (§4.3): per-language tercile "
        "VALUE cuts on the unigram-NLL quality score (same V=20 "
        "capped LM as unigram_nll_quality), docs classified by "
        "comparison against the broadcast cut table, kept = "
        "head+middle. No per-language global sort and no ntile window "
        "— the cuts are one tiny aggregate (floored to integer "
        "micro-nats so both engines classify identically) and the "
        "corpus-wide exchanges are only the NLL operator's own plus "
        "one doc-key join for the language column. At 100 TB the "
        "exact percentile swaps for percentile_approx (mergeable KLL) "
        "— kept exact here for oracle reproducibility.",
)
def perplexity_buckets(spark, sf_dir):
    from streamz_spark.operators.text import perplexity_buckets as op

    docs = load_table(spark, sf_dir, "documents")
    return op(docs, vocab_limit=_UNLL_VOCAB)


# --------------------------------------------------------------------------
# link-graph centrality: PageRank for crawl curation
# --------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolls the exact integer recurrence of operators.graph.pagerank
    for _PR_ITERS iterations — same fixed-point arithmetic, so the
    match is bit-exact (no float summation order anywhere)."""
    head = f"""
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    ids AS (SELECT doc_id AS id FROM documents),
    e0 AS (
        SELECT d.doc_id AS src, (d.doc_id * 31 + 1) % nn.n AS dst
        FROM documents d, nn
        UNION
        SELECT d.doc_id, (d.doc_id * 17 + 7) % nn.n FROM documents d, nn
        UNION
        SELECT d.doc_id, (d.doc_id // 100) * 100 FROM documents d, nn
    ),
    e AS (SELECT src, dst FROM e0 WHERE src <> dst),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
    ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
    c AS (SELECT ((20 - 17) * {_PR_SCALE}) // (20 * n) AS tele,
                 {_PR_SCALE} // n AS r0
          FROM nn),
    p0 AS (SELECT id, (SELECT r0 FROM c) AS r FROM ids)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(f""",
    p{i} AS (
        SELECT i.id,
               (SELECT tele FROM c)
               + COALESCE(SUM((17 * p.r) // (20 * ed.outdeg)), 0) AS r
        FROM ids i
        LEFT JOIN ed ON ed.dst = i.id
        LEFT JOIN p{i - 1} p ON p.id = ed.src
        GROUP BY i.id
    )""")
    tail = f"""
    SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_scaled FROM p{_PR_ITERS}
    """
    return head + "".join(steps) + tail


def _build_pagerank(spark, sf_dir, checkpoint: bool = True):
    """Synthetic citation graph over the documents table (deterministic,
    replicated verbatim in the oracle): every doc links to two
    arithmetic neighbors plus its century leader (doc_id DIV 100 * 100)
    — the leaders are ~1% of nodes with ~100x in-degree, a real hub
    skew for the aggregation to absorb."""
    from streamz_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    edges = (
        base.select("src", ((F.col("src") * 31 + 1) % n).alias("dst"))
        .union(base.select("src", ((F.col("src") * 17 + 7) % n).alias("dst")))
        .union(base.select("src", F.expr("(src DIV 100) * 100").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pr = pagerank(
        docs.withColumnRenamed("doc_id", "id"),
        edges,
        iterations=_PR_ITERS,
        scale=_PR_SCALE,
        checkpoint=checkpoint,
    )
    return pr.select(F.col("id").alias("doc_id"), "rank_scaled")


@register_extra(
    "pagerank_centrality",
    oracle=_pagerank_oracle(),
    doc="Link-graph centrality for crawl curation: 3 power-iteration "
        "rounds of PageRank (Page et al. 1999) over a deterministic "
        "citation graph with 1%-of-nodes hubs at ~100x in-degree "
        "(Common Crawl ranks hosts this way to pick crawl seeds; "
        "centrality is a standard document quality prior). Fixed-point "
        "BIGINT ranks with an exact 17/20 damping rational make every "
        "contribution an integer floor-div, so the DuckDB oracle — the "
        "same recurrence unrolled — matches bit-exact. Scale shape: "
        "the degree-annotated edge list is hash-laid-out on src and "
        "localCheckpoint'ed ONCE; each iteration shuffles only the "
        "one-row-per-node rank vector plus one map-side-combined "
        "integer SUM on dst (hub skew absorbed by partial agg); "
        "per-iteration checkpoint truncates the iterative lineage.",
)
def pagerank_centrality(spark, sf_dir):
    return _build_pagerank(spark, sf_dir, checkpoint=True)


# --------------------------------------------------------------------------
# exact heavy hitters without a full-cardinality exchange (Misra-Gries)
# --------------------------------------------------------------------------

_HH_K = 30
# floor(sqrt(user_id)) maps the uniform user ids onto a deterministic
# 2j+1 frequency law — real skew (the top key holds ~2·sqrt(U)/U of
# the rows), replicated verbatim in the oracle; IEEE sqrt is correctly
# rounded so both engines bucket identically
_HH_KEY = "CAST(FLOOR(SQRT(CAST(user_id AS DOUBLE))) AS BIGINT)"


@register_extra(
    "heavy_hitter_keys",
    oracle=f"""
    WITH t AS (SELECT {_HH_KEY} AS key FROM events),
    f AS (SELECT key, COUNT(*) AS cnt FROM t GROUP BY 1 HAVING key IS NOT NULL)
    SELECT key, cnt FROM f WHERE cnt * {_HH_K} > (SELECT COUNT(key) FROM t)
    """,
    doc="EXACT heavy hitters (every key holding > 1/30 of the rows, "
        "with exact counts) via the two-pass Misra-Gries shape "
        "(Cormode & Hadjieleftheriou VLDB'08): a shuffle-free "
        "mapInPandas sketch pass whose per-partition k-counter "
        "summaries are a guaranteed candidate superset, then exact "
        "verification of only those <= k*P candidates (broadcast "
        "semi-join + map-side-combined hash agg). The hot-key "
        "pre-flight for a 100 TB join: the naive full groupBy ships "
        "one row per distinct key per map partition — at 1e9+ "
        "distinct keys THAT exchange is the problem the sketch "
        "avoids; the answer is still exact because the sketch only "
        "prunes candidates, never decides. Keys follow a "
        "deterministic floor(sqrt(user_id)) 2j+1 skew law.",
)
def heavy_hitter_keys(spark, sf_dir):
    from streamz_spark.operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_HH_KEY).alias("key")
    )
    return heavy_hitters(ev, "key", k=_HH_K)


# --------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 §2.2)
# --------------------------------------------------------------------------

_C4_ORACLE = """
    WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ),
    lined AS (
        SELECT doc_id,
               list_transform(
                   generate_series(0, greatest(CAST(ceil(len(w) / 10.0) AS INT) - 1, 0)),
                   i -> array_to_string(w[i*10+1 : i*10+10], ' ')
                        || CASE WHEN (doc_id * 3 + i) % 11 = 0 THEN ' javascript' ELSE '' END
                        || CASE WHEN (doc_id + i) % 7 <> 0 THEN '.' ELSE '' END
               ) AS lines
        FROM d
    ),
    txt AS (
        SELECT doc_id,
               array_to_string(lines, chr(10))
               || CASE WHEN doc_id % 97 = 0 THEN chr(10) || 'lorem ipsum.' ELSE '' END
               || CASE WHEN doc_id % 89 = 0 THEN chr(10) || 'see { code }.' ELSE '' END
               AS text
        FROM lined
    ),
    parsed AS (
        SELECT doc_id, text,
               list_filter(
                   list_transform(string_split(text, chr(10)), x -> trim(x)),
                   x -> length(x) > 0) AS ls
        FROM txt
    ),
    scored AS (
        SELECT doc_id, text, len(ls) AS lines_total,
               list_filter(ls, x ->
                   regexp_matches(x, '[.!?"’”]$')
                   AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3
                   AND NOT contains(lower(x), 'javascript')) AS kls
        FROM parsed
    )
    SELECT doc_id,
           CAST(lines_total AS BIGINT) AS lines_total,
           CAST(len(kls) AS BIGINT) AS lines_kept,
           COALESCE(array_to_string(kls, chr(10)), '') AS text_clean,
           (len(kls) >= 5
            AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(lower(text), '{')) AS kept
    FROM scored
"""


def _c4_lined_corpus(spark, sf_dir):
    """Deterministic lined corpus: the synthetic documents carry no
    newlines/punctuation, so the entry constructs 10-word lines with
    terminal punctuation, junk lines, and boilerplate pages injected
    by doc_id arithmetic — replicated verbatim in the oracle."""
    return _c4_line_docs(load_table(spark, sf_dir, "documents"))


def _c4_line_docs(docs):
    """The lining transform alone (stateless — works on a stream too:
    the ingest-time matrix cell applies it to replayed chunks)."""
    docs = docs.select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.expr(
            "array_join(transform("
            "  sequence(0, greatest(CAST(ceil(size(split(trim(text), '\\\\s+')) / 10.0) AS INT) - 1, 0)),"
            "  i -> array_join(slice(split(trim(text), '\\\\s+'), i*10+1, 10), ' ')"
            "       || CASE WHEN (doc_id * 3 + i) % 11 = 0 THEN ' javascript' ELSE '' END"
            "       || CASE WHEN (doc_id + i) % 7 <> 0 THEN '.' ELSE '' END"
            "), '\\n')"
            " || CASE WHEN doc_id % 97 = 0 THEN '\\nlorem ipsum.' ELSE '' END"
            " || CASE WHEN doc_id % 89 = 0 THEN '\\nsee { code }.' ELSE '' END"
        ).alias("text"),
    )


@register_extra(
    "c4_line_cleaning",
    oracle=_C4_ORACLE,
    doc="C4's cleaning heuristics (Raffel et al. 2020 §2.2, the "
        "public Common Crawl -> C4 recipe): keep lines ending in "
        "terminal punctuation with >= 3 words and no 'javascript'; "
        "drop pages with < 5 kept lines or containing 'lorem ipsum' "
        "or '{'. Pure narrow string expressions, zero shuffle, zero "
        "UDF — scan-bound inside whole-stage codegen, like the "
        "recipe's map-only cleaning phase. The synthetic corpus has "
        "no lines, so the entry deterministically constructs them "
        "(10-word lines; punctuation, junk words and boilerplate "
        "pages injected by doc_id arithmetic) identically in both "
        "engines.",
)
def c4_line_cleaning(spark, sf_dir):
    from streamz_spark.operators.quality import c4_clean

    lined = _c4_lined_corpus(spark, sf_dir)
    return c4_clean(lined).select(
        "doc_id", "lines_total", "lines_kept", "text_clean", "kept"
    )


# --------------------------------------------------------------------------
# hybrid retrieval: BM25 + vector arms fused by Reciprocal Rank Fusion
# --------------------------------------------------------------------------

_RRF_K0 = 60
_RRF_ARM_N = 50
_RRF_TOPK = 20
_RRF_QUERY_VEC_ID = 7

_HYBRID_RRF_ORACLE = f"""
    WITH d2 AS (
        SELECT doc_id AS id,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS toks
        FROM documents
    ),
    docs AS (SELECT id, toks, CAST(len(toks) AS BIGINT) AS doc_len FROM d2),
    scalars AS (
        SELECT COUNT(*) AS n_docs, SUM(doc_len) AS total_tokens FROM docs
    ),
    postings AS (
        SELECT id, doc_len, t.term,
               CAST(len(list_filter(toks, x -> x = t.term)) AS BIGINT) AS tf
        FROM docs, (SELECT unnest({_BM25_TERMS_SQL}) AS term) t
        WHERE list_contains(toks, t.term)
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_count FROM postings GROUP BY 1),
    contrib AS (
        SELECT p.id,
               CAST(floor(
                   ln(1.0 + (n_docs - df_count + 0.5) / (df_count + 0.5))
                   * (tf * {_BM25_K1 + 1.0!r})
                   / (tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                      + ({_BM25_B!r} * doc_len)
                        / (total_tokens / n_docs)))
                   * 1000000.0) AS BIGINT) AS bm25_micros
        FROM postings p JOIN dfreq f USING (term) CROSS JOIN scalars
    ),
    tscore AS (SELECT id, SUM(bm25_micros) AS bm25_micros FROM contrib GROUP BY 1),
    ttop AS (SELECT id, bm25_micros FROM tscore
             ORDER BY bm25_micros DESC, id ASC LIMIT {_RRF_ARM_N}),
    tranked AS (
        SELECT id, CAST(ROW_NUMBER() OVER (
            ORDER BY bm25_micros DESC, id ASC) AS BIGINT) AS text_rank
        FROM ttop
    ),
    v AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v),
    q AS (SELECT v AS qv, norm AS qnorm FROM n WHERE id = {_RRF_QUERY_VEC_ID}),
    vs AS (
        SELECT n.id,
               CASE WHEN n.norm * q.qnorm > 0
                    THEN list_dot_product(n.v, q.qv) / (n.norm * q.qnorm)
                    ELSE 0.0 END AS cosine
        FROM n CROSS JOIN q
    ),
    vtop AS (SELECT id, cosine FROM vs
             ORDER BY cosine DESC, id ASC LIMIT {_RRF_ARM_N}),
    vranked AS (
        SELECT id, CAST(ROW_NUMBER() OVER (
            ORDER BY cosine DESC, id ASC) AS BIGINT) AS vec_rank
        FROM vtop
    ),
    fused AS (
        SELECT COALESCE(t.id, vr.id) AS id, t.text_rank, vr.vec_rank,
               CAST(COALESCE(1000000000 // ({_RRF_K0} + t.text_rank), 0)
                    + COALESCE(1000000000 // ({_RRF_K0} + vr.vec_rank), 0)
                 AS BIGINT) AS rrf_nanos
        FROM tranked t FULL OUTER JOIN vranked vr ON t.id = vr.id
    )
    SELECT id AS doc_id, text_rank, vec_rank, rrf_nanos,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY rrf_nanos DESC, id ASC) AS rnk
        FROM fused
    ) WHERE rnk <= {_RRF_TOPK}
"""


@register_extra(
    "hybrid_rrf_retrieval",
    oracle=_HYBRID_RRF_ORACLE,
    doc="hybrid ranked retrieval: BM25 keyword arm + cosine vector arm "
        "fused by Reciprocal Rank Fusion (Cormack et al. 2009), the "
        "standard lexical+embedding production recipe. The fused score "
        "is exact integer nano-units (1e9 div (k0+rank)), per-term BM25 "
        "contributions floor to integer micro-units before the per-doc "
        "sum (associative — engine-identical), and the vector arm uses "
        "the same cosine fold the ANN oracles reproduce bit-exactly. "
        "Scale shape: query-term filter before any shuffle, broadcast "
        "1-row query vector, each arm ends in a TakeOrdered, fusion "
        "windows touch <= 2*arm_n rows — no corpus-sized window.",
)
def hybrid_rrf_retrieval(spark, sf_dir):
    from streamz_spark.operators.similarity import hybrid_rrf_topk

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(
        docs,
        embs,
        _BM25_TERMS,
        _RRF_QUERY_VEC_ID,
        arm_n=_RRF_ARM_N,
        k=_RRF_TOPK,
        k0=_RRF_K0,
        k1=_BM25_K1,
        b=_BM25_B,
    )


# --------------------------------------------------------------------------
# cross-source content-overlap audit
# --------------------------------------------------------------------------

_SOURCE_OVERLAP_ORACLE = """
    WITH toks AS (
        SELECT source,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT source AS src,
               unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks
    ),
    totals AS (SELECT src, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (
        SELECT a.src AS source_a, b.src AS source_b,
               COUNT(*) AS shared_shingles
        FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
        GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           CAST(shared_shingles AS BIGINT) AS shared_shingles,
           CAST(ta.n_sh AS BIGINT) AS shingles_a,
           CAST(tb.n_sh AS BIGINT) AS shingles_b,
           CAST((shared_shingles * 1000000) // least(ta.n_sh, tb.n_sh)
                AS BIGINT) AS overlap_ppm
    FROM pairs p
    JOIN totals ta ON ta.src = p.source_a
    JOIN totals tb ON tb.src = p.source_b
"""


@register_extra(
    "source_overlap_matrix",
    oracle=_SOURCE_OVERLAP_ORACLE,
    doc="cross-source content-overlap audit: distinct 3-word shingles "
        "shared per source pair + the overlap coefficient in integer "
        "ppm — the curation diagnostic for overlapping crawl dumps / "
        "mirrors / syndication (consecutive Common Crawl snapshots "
        "overlap heavily; mixing plans that treat them as independent "
        "double-count that mass). Scale shape: one corpus shingling "
        "pass into a distinct (source, shingle) relation, a shingle-key "
        "self-join whose fan-out is bounded by SOURCE cardinality "
        "squared per shingle (never corpus size), map-side-combinable "
        "pair groupBy, broadcast per-source totals.",
)
def source_overlap_matrix(spark, sf_dir):
    from streamz_spark.operators.quality import source_overlap

    docs = load_table(spark, sf_dir, "documents")
    return source_overlap(docs, k=3)


_SOURCE_OVERLAP_CAPPED_ORACLE = """
    WITH toks AS (
        SELECT source,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT source AS src,
               unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks
    ),
    totals AS (SELECT src, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    hot AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > 5),
    shc AS (SELECT * FROM sh ANTI JOIN hot USING (s)),
    pairs AS (
        SELECT a.src AS source_a, b.src AS source_b,
               COUNT(*) AS shared_shingles
        FROM shc a JOIN shc b ON a.s = b.s AND a.src < b.src
        GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           CAST(shared_shingles AS BIGINT) AS shared_shingles,
           CAST(ta.n_sh AS BIGINT) AS shingles_a,
           CAST(tb.n_sh AS BIGINT) AS shingles_b,
           CAST((shared_shingles * 1000000) // least(ta.n_sh, tb.n_sh)
                AS BIGINT) AS overlap_ppm
    FROM pairs p
    JOIN totals ta ON ta.src = p.source_a
    JOIN totals tb ON tb.src = p.source_b
"""


@register_extra(
    "source_overlap_capped",
    oracle=_SOURCE_OVERLAP_CAPPED_ORACLE,
    doc="source_overlap with the max_sources df-cutoff: shingles "
        "present in > 5 sources are cross-source boilerplate — they "
        "saturate every pair equally while contributing C(sources, 2) "
        "join rows PER SHINGLE, the fan-out that melts the self-join "
        "at 10^4 sources. The cut-list is a map-side-combinable hash "
        "aggregate over the small high-df set, broadcast-ANTI-joined "
        "away (never a Window exchange+sort over the corpus-sized "
        "relation — plan-pinned in test_plans). Totals (ppm "
        "denominators) stay PRE-cut, so the coefficient remains a "
        "fraction of each source's true shingle count.",
)
def source_overlap_capped(spark, sf_dir):
    from streamz_spark.operators.quality import source_overlap

    docs = load_table(spark, sf_dir, "documents")
    return source_overlap(docs, k=3, max_sources=5)


# --------------------------------------------------------------------------
# quality-funnel attrition report
# --------------------------------------------------------------------------

_QUALITY_FUNNEL_ORACLE = """
    WITH q AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
               END AS n_tok,
               length(text) AS n,
               length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS spaces,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
               list_filter(list_transform(regexp_split_to_array(text, '\n'),
                                          x -> trim(x)),
                           x -> length(x) > 0) AS lines
        FROM documents
    ), f AS (
        SELECT doc_id,
               (n_tok > 0) AS s0,
               (n_tok > 0 AND n_tok >= 20) AS s1,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok) AS s2,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok
                AND digits * 5 <= n) AS s3,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok
                AND digits * 5 <= n
                AND (len(lines) - len(list_distinct(lines))) * 10
                    <= len(lines) * 3) AS s4,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok
                AND digits * 5 <= n
                AND (len(lines) - len(list_distinct(lines))) * 10
                    <= len(lines) * 3
                AND lang = 'en') AS s5
        FROM q
    ), t AS (
        SELECT COUNT(*) AS n,
               SUM(s0::BIGINT) AS k0, SUM(s1::BIGINT) AS k1,
               SUM(s2::BIGINT) AS k2, SUM(s3::BIGINT) AS k3,
               SUM(s4::BIGINT) AS k4, SUM(s5::BIGINT) AS k5
        FROM f
    ), rows_ AS (
        SELECT * FROM (VALUES
            (0, 'nonempty'), (1, 'min_tokens_20'),
            (2, 'mean_word_len_3_10'), (3, 'digit_ratio_le_20pct'),
            (4, 'dup_line_frac_le_30pct'), (5, 'lang_en')
        ) AS v(stage_idx, stage)
    )
    SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_kept AS BIGINT) AS docs_kept,
           CAST(docs_in - docs_kept AS BIGINT) AS dropped,
           CAST(CASE WHEN docs_in > 0
                     THEN ((docs_in - docs_kept) * 1000000) // docs_in
                     ELSE 0 END AS BIGINT) AS drop_ppm
    FROM (
        SELECT stage_idx, stage,
               CASE stage_idx WHEN 0 THEN t.n WHEN 1 THEN t.k0
                    WHEN 2 THEN t.k1 WHEN 3 THEN t.k2
                    WHEN 4 THEN t.k3 ELSE t.k4 END AS docs_in,
               CASE stage_idx WHEN 0 THEN t.k0 WHEN 1 THEN t.k1
                    WHEN 2 THEN t.k2 WHEN 3 THEN t.k3
                    WHEN 4 THEN t.k4 ELSE t.k5 END AS docs_kept
        FROM rows_ CROSS JOIN t
    )
"""


@register_extra(
    "quality_funnel",
    oracle=_QUALITY_FUNNEL_ORACLE,
    doc="per-stage attrition report for the heuristic filter chain "
        "(the funnel table C4/Gopher/RefinedWeb all publish): stage i "
        "counts survivors of stages 1..i, so each loss is attributed "
        "to the FIRST rule that fires. Every ratio predicate is "
        "cross-multiplied to integers (engine-exact). Scale shape: one "
        "narrow boolean projection + one map-side-combinable 1-row "
        "aggregate + a 1-row unpivot — no corpus shuffle, cost of one "
        "scan regardless of stage count.",
)
def quality_funnel(spark, sf_dir):
    from streamz_spark.operators.quality import (
        default_quality_stages,
        quality_funnel as funnel,
    )

    docs = load_table(spark, sf_dir, "documents")
    return funnel(docs, default_quality_stages())


# --------------------------------------------------------------------------
# targeted decontamination: benchmark-overlap spans (cut, don't drop)
# --------------------------------------------------------------------------

_CSPAN_K = 7  # matches contamination_check's shingle size at this corpus

_CONTAM_SPAN_ORACLE = f"""
    WITH d AS (
        SELECT doc_id AS id,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS w
        FROM documents
    ),
    kg AS (
        SELECT id, t.p - 1 AS pos,
               array_to_string(w[t.p:t.p+{_CSPAN_K}-1], ' ') AS gram
        FROM d, UNNEST(generate_series(1, len(w) - {_CSPAN_K} + 1)) AS t(p)
    ),
    bg AS (SELECT DISTINCT gram FROM kg WHERE id % 97 = 0),
    anch AS (SELECT id, pos FROM kg JOIN bg USING (gram)),
    flagged AS (
        SELECT id, pos,
               CASE WHEN LAG(pos) OVER w IS NULL
                      OR pos > LAG(pos) OVER w + {_CSPAN_K}
                    THEN 1 ELSE 0 END AS new_span
        FROM anch
        WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    isl AS (
        SELECT id, pos,
               SUM(new_span) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM flagged
    )
    SELECT id AS doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_CSPAN_K} - 1 AS BIGINT) AS span_end,
           CAST(MAX(pos) - MIN(pos) + {_CSPAN_K} AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_anchors
    FROM isl GROUP BY id, span_id
"""


@register_extra(
    "contamination_spans",
    oracle=_CONTAM_SPAN_ORACLE,
    doc="TARGETED decontamination (Lee et al. span machinery applied "
        "cross-corpus): maximal token spans of training docs whose "
        "every k-gram occurs in the evaluation benchmark — cut the "
        "benchmark text, keep the document (contamination_check drops "
        "or flags whole docs; frontier recipes remove the passage). "
        "Benchmark stand-in: the deterministic doc_id%97 sample. Scale "
        "shape: the benchmark side collapses to its distinct gram-hash "
        "set and AQE broadcasts the semi-join, so doc anchors never "
        "shuffle on the gram key — the only corpus exchange is the "
        "doc-key merge (the self-dedup ExactSubstr necessarily pays "
        "the gram exchange; the cross-corpus asymmetry removes it). "
        "The oracle joins on the gram STRING; agreement modulo "
        "xxhash64 birthday odds as for exact_substring_spans.",
)
def contamination_spans(spark, sf_dir):
    from streamz_spark.operators.contamination import (
        contamination_spans as op,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return op(docs, bench, k=_CSPAN_K)


_QUALITY_FUNNEL_BY_SOURCE_ORACLE = """
    WITH q AS (
        SELECT doc_id, lang, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
               END AS n_tok,
               length(text) AS n,
               length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS spaces,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
               list_filter(list_transform(regexp_split_to_array(text, '\n'),
                                          x -> trim(x)),
                           x -> length(x) > 0) AS lines
        FROM documents
    ), f AS (
        SELECT source,
               (n_tok > 0) AS s0,
               (n_tok > 0 AND n_tok >= 20) AS s1,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok) AS s2,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok
                AND digits * 5 <= n) AS s3,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok
                AND digits * 5 <= n
                AND (len(lines) - len(list_distinct(lines))) * 10
                    <= len(lines) * 3) AS s4,
               (n_tok > 0 AND n_tok >= 20
                AND (n - spaces) >= 3 * n_tok
                AND (n - spaces) <= 10 * n_tok
                AND digits * 5 <= n
                AND (len(lines) - len(list_distinct(lines))) * 10
                    <= len(lines) * 3
                AND lang = 'en') AS s5
        FROM q
    ), t AS (
        SELECT source, COUNT(*) AS n,
               SUM(s0::BIGINT) AS k0, SUM(s1::BIGINT) AS k1,
               SUM(s2::BIGINT) AS k2, SUM(s3::BIGINT) AS k3,
               SUM(s4::BIGINT) AS k4, SUM(s5::BIGINT) AS k5
        FROM f GROUP BY source
    ), rows_ AS (
        SELECT * FROM (VALUES
            (0, 'nonempty'), (1, 'min_tokens_20'),
            (2, 'mean_word_len_3_10'), (3, 'digit_ratio_le_20pct'),
            (4, 'dup_line_frac_le_30pct'), (5, 'lang_en')
        ) AS v(stage_idx, stage)
    )
    SELECT source, CAST(stage_idx AS BIGINT) AS stage_idx, stage,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_kept AS BIGINT) AS docs_kept,
           CAST(docs_in - docs_kept AS BIGINT) AS dropped,
           CAST(CASE WHEN docs_in > 0
                     THEN ((docs_in - docs_kept) * 1000000) // docs_in
                     ELSE 0 END AS BIGINT) AS drop_ppm
    FROM (
        SELECT t.source, stage_idx, stage,
               CASE stage_idx WHEN 0 THEN t.n WHEN 1 THEN t.k0
                    WHEN 2 THEN t.k1 WHEN 3 THEN t.k2
                    WHEN 4 THEN t.k3 ELSE t.k4 END AS docs_in,
               CASE stage_idx WHEN 0 THEN t.k0 WHEN 1 THEN t.k1
                    WHEN 2 THEN t.k2 WHEN 3 THEN t.k3
                    WHEN 4 THEN t.k4 ELSE t.k5 END AS docs_kept
        FROM rows_ CROSS JOIN t
    )
"""


@register_extra(
    "quality_funnel_by_source",
    oracle=_QUALITY_FUNNEL_BY_SOURCE_ORACLE,
    doc="per-SOURCE attrition funnel (the grouped form of "
        "quality_funnel): the per-domain removal-rate matrix a mixture "
        "plan consumes — a source whose survivors crater changes the "
        "mixing weights. Same single scan; the aggregate becomes one "
        "map-side-combinable groupBy on the low-cardinality source "
        "key, the unpivot runs on |sources| rows.",
)
def quality_funnel_by_source(spark, sf_dir):
    from streamz_spark.operators.quality import (
        default_quality_stages,
        quality_funnel as funnel,
    )

    docs = load_table(spark, sf_dir, "documents")
    return funnel(docs, default_quality_stages(), group_col="source")


_DECONTAM_CUT_ORACLE = f"""
    WITH d AS (
        SELECT doc_id AS id, text,
               CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS w
        FROM documents
    ),
    kg AS (
        SELECT id, t.p - 1 AS pos,
               array_to_string(w[t.p:t.p+{_CSPAN_K}-1], ' ') AS gram
        FROM d, UNNEST(generate_series(1, len(w) - {_CSPAN_K} + 1)) AS t(p)
    ),
    bg AS (SELECT DISTINCT gram FROM kg WHERE id % 97 = 0),
    anch AS (SELECT id, pos FROM kg JOIN bg USING (gram)),
    flagged AS (
        SELECT id, pos,
               CASE WHEN LAG(pos) OVER w IS NULL
                      OR pos > LAG(pos) OVER w + {_CSPAN_K}
                    THEN 1 ELSE 0 END AS new_span
        FROM anch
        WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    isl AS (
        SELECT id, pos,
               SUM(new_span) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM flagged
    ),
    spans AS (
        SELECT id, MIN(pos) AS s, MAX(pos) + {_CSPAN_K} - 1 AS e
        FROM isl GROUP BY id, span_id
    ),
    sp_agg AS (
        SELECT id, list(struct_pack(s := s, e := e)) AS sps
        FROM spans GROUP BY id
    ),
    cut AS (
        SELECT d.id, d.text, sp_agg.sps,
               list_filter(
                   list_transform(w, (x, i) -> CASE WHEN len(list_filter(
                       sp_agg.sps,
                       sp -> i - 1 >= sp.s AND i - 1 <= sp.e)) = 0
                       THEN x ELSE NULL END),
                   x -> x IS NOT NULL) AS kept,
               len(w) AS n_tok
        FROM d LEFT JOIN sp_agg ON sp_agg.id = d.id
    )
    SELECT id AS doc_id,
           CASE WHEN sps IS NULL THEN text
                ELSE COALESCE(array_to_string(kept, ' '), '') END
               AS text_deduped,
           CAST(CASE WHEN sps IS NULL THEN 0
                     ELSE n_tok - len(kept) END AS BIGINT)
               AS n_tokens_removed
    FROM cut
"""


@register_extra(
    "decontaminate_corpus",
    oracle=_DECONTAM_CUT_ORACLE,
    doc="end-to-end targeted decontamination: contamination_spans + "
        "cut_spans as ONE transform — every token span overlapping the "
        "benchmark (doc_id%97 stand-in) is cut, unaffected docs pass "
        "through verbatim. The cut itself is a narrow JVM token-array "
        "filter (no output-side explode, no Python); the only corpus "
        "exchanges are the doc-key span merge and the span join-back. "
        "Note the cut re-tokenizes, so text_deduped is whitespace-"
        "normalized in both engines identically.",
)
def decontaminate_corpus(spark, sf_dir):
    from streamz_spark.operators.contamination import (
        contamination_spans as spans_op,
    )
    from streamz_spark.operators.dedup import cut_spans

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    spans = spans_op(docs, bench, k=_CSPAN_K)
    return cut_spans(docs, spans).select(
        "doc_id", "text_deduped", "n_tokens_removed"
    )


# --------------------------------------------------------------------------
# serving-shape IVF ANN: index the corpus once, probe with a fixed workload
# --------------------------------------------------------------------------

@register_extra(
    "ann_ivf_serving_topk",
    # same seed-centroid IVF pipeline as ann_ivf_topk's oracle, with the
    # PROBE side restricted to the fixed 20-query workload (id < 20) —
    # the corpus index side (rnk = 1 primary cells) is unchanged. The
    # serving path is differentially pinned equal to the self-query
    # slice in tests/test_dedup.py; this entry adds the oracle bar.
    oracle="""
        WITH v AS (
            SELECT vec_id AS id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
        ), cent AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cell, v AS cvec
            FROM (SELECT * FROM n ORDER BY id LIMIT 64)
        ), scored AS (
            SELECT n.id, n.v, n.norm, c.cell,
                   list_sum(list_transform(range(1, len(n.v) + 1),
                       i -> (n.v[i] - c.cvec[i]) * (n.v[i] - c.cvec[i]))) AS d2
            FROM n CROSS JOIN cent c
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY d2 ASC, cell ASC) AS rnk
            FROM scored
        ), cand AS (
            SELECT DISTINCT a.id AS qid, m.id AS cid,
                   CASE WHEN a.norm * m.norm > 0
                        THEN list_dot_product(a.v, m.v) / (a.norm * m.norm)
                        ELSE 0.0 END AS cosine
            FROM (SELECT * FROM ranked WHERE rnk <= 3 AND id < 20) a
            JOIN (SELECT * FROM ranked WHERE rnk = 1) m
              ON a.cell = m.cell AND a.id != m.id
        )
        SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, cid ASC) AS rnk
            FROM cand
        ) WHERE rnk <= 5
    """,
    doc="serving-shape IVF ANN (round 8): the corpus is indexed once "
        "(primary cell only) and a FIXED 20-query workload probes its "
        "n_probe nearest cells — per-query cost n_probe*(n/n_cells) "
        "instead of the self-query all-pairs audit's ~n^1.5 total; how "
        "an ANN index is consumed at 100 TB (measured 100x exponent "
        "0.58 with sqrt-n cells, SCALE.md round 8)",
)
def ann_ivf_serving_topk(spark, sf_dir):
    from streamz_spark.operators import similarity as _sim

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    out = _sim.ivf_ann(
        emb, k=5, n_cells=64, n_probe=3, centroids="seed", queries=queries
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@register_extra(
    "tpch_q6_shifted_window",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 with the date window shifted into the synthetic "
        "data's actual l_shipdate range (1995-2001): the round-8 "
        "vacuity audit (scripts/vacuity_audit.py) found the standard "
        "1994 window matches ZERO rows here, so the canonical entry's "
        "oracle check compares NULL to NULL — this companion sums ~12k "
        "real rows and gives the q6 plan shape (selective scan + "
        "single partial agg, filters fully pushed) non-vacuous "
        "aggregation teeth. The canonical entry stays standard for "
        "canary comparability.",
)
def tpch_q6_shifted_window(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
            .alias("revenue")
        )
    )
