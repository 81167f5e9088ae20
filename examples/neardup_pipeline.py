"""Training-data curation pipeline: quality filter -> exact dedup ->
MinHash near-dup -> language id, over the documents table.

Run: python examples/neardup_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark import get_spark, load_table
from streamz_spark.operators import dedup as dd
from streamz_spark.operators.text import language_id, quality_features


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("neardup-example")
    docs = load_table(spark, sf_dir, "documents")

    scored = quality_features(docs)
    kept = scored.filter("n_tokens >= 5 AND punct_ratio < 0.2")
    print("quality filter:", docs.count(), "->", kept.count())

    deduped = dd.dedup_exact(kept.select(docs.columns))
    print("exact dedup ->", deduped.count())

    near = dd.minhash_near_duplicates(deduped, num_perm=64, bands=16, threshold=0.5)
    print("near-dup pairs (MinHash->verified Jaccard>=0.5):", near.count())

    # pairs -> clusters (transitive closure) -> drop all but one per cluster
    from pyspark.sql import functions as F

    from streamz_spark.operators.components import dedup_clusters

    clusters = dedup_clusters(deduped, near)
    drop = clusters.filter(~F.col("keep")).select("doc_id")
    resolved = deduped.join(drop, "doc_id", "left_anti")
    print("cluster-resolved ->", resolved.count(),
          f"({clusters.select('cluster_id').distinct().count()} clusters)")

    lang = language_id(deduped)
    lang.groupBy("lang", "lang_pred").count().orderBy("lang", "lang_pred").show(30)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
