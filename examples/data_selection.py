"""Data-selection ladder over the documents table: heuristic quality
-> corpus-LM NLL -> trained Naive Bayes classifier -> DSIR importance
resampling -> SemDeDup over the embeddings table.

This is the selection stack a pretraining team climbs (CCNet / DCLM /
FineWeb-Edu / DSIR), each rung as one Spark plan.

Run: python examples/data_selection.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark, load_table
from streamz_spark.operators.dedup import semdedup
from streamz_spark.operators.sampling import dsir_select
from streamz_spark.operators.text import (
    nb_quality_apply,
    nb_quality_train,
    unigram_nll_quality,
)


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("data-selection-example")
    docs = load_table(spark, sf_dir, "documents")

    # rung 2: LM perplexity signal (rung 1, heuristics, is
    # quality_features — see examples/neardup_pipeline.py)
    nll = unigram_nll_quality(docs, vocab_limit=1000)
    print("LM-NLL quantiles:",
          nll.agg(F.expr("percentile(nll_mean, array(0.1, 0.5, 0.9))")).first()[0])

    # rung 3: train a classifier on weak labels, score everything
    labeled = docs.withColumn("__y", F.col("lang") == "en")
    model = nb_quality_train(labeled, "__y", vocab_limit=5000)
    scores = nb_quality_apply(docs, model)
    print("classifier positive fraction:",
          scores.agg(F.avg(F.col("pred").cast("double"))).first()[0])

    # rung 4: importance-resample toward the target domain
    sel = dsir_select(labeled, "__y", k=200, n_buckets=8192)
    picked = sel.filter("selected")
    print("DSIR selected:", picked.count(), "docs; mean log-weight:",
          picked.agg(F.avg(F.col("logw_micro") / 1e6)).first()[0])

    # semantic tier of dedup, on the embeddings table
    emb = load_table(spark, sf_dir, "embeddings")
    sd = semdedup(emb, n_clusters=None, threshold=0.9)  # sqrt-sized cells
    print("SemDeDup kept:", sd.filter("keep").count(), "of", sd.count())

    # rung 5: spend the final token budget best-first — keep each
    # source's top slice, then fill a per-source token budget with the
    # highest-quality prefix, and print the resulting data card
    from streamz_spark.operators.sampling import (
        select_to_token_budget,
        select_top_quality,
    )
    from streamz_spark.operators.text import quality_features

    scored = quality_features(docs, "text").select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    pruned = select_top_quality(scored, frac=0.5, method="rank")
    budgeted = select_to_token_budget(
        pruned, budget_tokens=20_000, tokens_col="n_tokens", by="source"
    )
    spent = budgeted.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    )
    print("budgeted selection per source:")
    for r in spent.orderBy("source").collect():
        print(f"  {r['source']}: {r['docs']} docs, {r['tokens']} tokens")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
