"""Corpus-to-training-set export pipeline: Gopher quality filter ->
PII scrub -> exact dedup -> reproducible train/test split -> token
budget sequence packing -> deterministic shuffle.

Every step is a narrow expression pass or a single exchange — at
100 TB this whole pipeline is two shuffles (dedup fingerprint groupBy,
packing shard exchange) plus the final export shuffle.

Run: python examples/corpus_export.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark, load_table
from streamz_spark.operators import dedup as dd
from streamz_spark.operators import export as ex
from streamz_spark.operators import quality as q
from streamz_spark.operators import sampling as sa
from streamz_spark.operators.text import token_count


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("corpus-export-example")
    docs = load_table(spark, sf_dir, "documents")

    # 1. repetition/quality gate (thresholds sized for short synthetic docs)
    gated = q.gopher_quality_filter(docs, min_words=10).filter(F.col("keep"))
    print("gopher filter:", docs.count(), "->", gated.count())

    # 2. PII scrub (in place) + exact dedup on the scrubbed text
    clean = q.pii_scrub(gated.select("doc_id", "text", "lang"))
    deduped = dd.dedup_exact(clean)
    print("exact dedup ->", deduped.count())

    # 3. deterministic split: same ids land in 'test' on every run
    split = sa.hash_split_fast(deduped, "doc_id", test_frac=0.05, seed=42)
    print("split:", {r["split"]: r["count"] for r in split.groupBy("split").count().collect()})

    # 4. pack the train shard into 512-token sequences
    train = split.filter("split = 'train'").withColumn("n_tokens", token_count("text"))
    packed = ex.pack_sequences(train, budget=512, num_shards=8)
    stats = packed.groupBy("pack_id").agg(F.first("pack_tokens").alias("fill")).agg(
        F.count("*").alias("n_packs"), F.avg("fill").alias("avg_fill")
    ).collect()[0]
    print(f"packed: {stats['n_packs']} packs, avg fill {stats['avg_fill']:.0f}/512")

    # 5. canonical shuffled order for the writer
    final = ex.deterministic_shuffle(
        train.join(packed.select(F.col("id").alias("doc_id"), "pack_id"), "doc_id"),
        "doc_id", seed=42,
    )
    print("export rows:", final.count())
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
