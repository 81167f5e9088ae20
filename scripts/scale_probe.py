"""Measure wall-time scaling of the slowest bench entries between a
base SF directory and an N× replica (see make_scale_replica.py).

Prints one row per query: base time, replica time, ratio, and the
empirical scaling exponent log(ratio)/log(N). Steady-state protocol
matches bench.py (noop-sink force, min of 2 runs, cache/GC reset).

Usage: python scripts/scale_probe.py [query ...]
Env: SPARK_GRAFT_SCALE_BASE (default /root/testdata/sf0.1),
     SPARK_GRAFT_SCALE_REPLICA (default <repo>/.scale/sf1),
     SPARK_GRAFT_SCALE_N (default 10).
"""

from __future__ import annotations

import gc
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.catalog import load_all
from streamz_spark.session import get_spark

DEFAULT_QUERIES = [
    "pretrain_corpus_pipeline",
    "exact_substring_spans",
    "dedup_spans_removed",
    "dedup_exact",
    "dedup_clusters",
    "dedup_clusters_distributed",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "contamination_bloom",
    "fuzzy_levenshtein_pairs",
    "boilerplate_common_shingles",
    "approx_sketches",
    "tpch_q21_waiting_suppliers",
    "ann_ivf_topk",
    "unigram_nll_quality",
    "nb_quality_classifier",
    "dsir_importance_resample",
    "semdedup_embedding",
    "chunk_documents",
    "dedup_paragraphs",
    "temperature_mixture_resample",
    "bpe_learned_tokenizer",
    "stupid_backoff_nll",
    "incremental_dedup_vs_index",
    "corpus_data_card",
    "select_top_quality_per_source",
    "select_to_token_budget_per_source",
    "pagerank_centrality",
    "heavy_hitter_keys",
]


def timed(spark, fn, sf_dir, runs=2) -> float:
    best = float("inf")
    err = None
    for _ in range(runs):
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            # transient session-memory pressure (e.g. a broadcast build
            # failing right after a heavy prior entry) must not void
            # the whole entry — keep the runs that succeed
            err = exc
            continue
        best = min(best, time.perf_counter() - t0)
    if best == float("inf"):
        raise err if err else RuntimeError("no successful run")
    return best


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    replica = os.environ.get(
        "SPARK_GRAFT_SCALE_REPLICA", os.path.join(repo, ".scale", "sf1")
    )
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "10"))
    queries = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    registry = dict(load_all())
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    registry.update(EXTRA_REGISTRY)
    # warm once
    timed(spark, registry[queries[0]].fn, base, runs=1)
    print(f"| query | {os.path.basename(base)} | {n}x | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name in queries:
        if name not in registry:
            print(f"| {name} | MISSING | | | |", flush=True)
            continue
        try:
            t0 = timed(spark, registry[name].fn, base)
            t1 = timed(spark, registry[name].fn, replica)
            ratio = t1 / t0
            exp = math.log(ratio) / math.log(n)
            print(
                f"| {name} | {t0:.2f} s | {t1:.2f} s | {ratio:.1f}x | {exp:.2f} |",
                flush=True,
            )
        except Exception as exc:
            print(f"| {name} | FAILED: {exc} | | | |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
