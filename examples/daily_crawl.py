"""The daily-crawl loop: screen today's ingest against the historical
index, then report what survived.

1. Build (once) the stored index artifact — fingerprints, shingle
   sets, LSH band table — and persist it as parquet.
2. Screen the incoming slice with incremental_dedup using the stored
   artifact: exact fingerprint anti-join + band-bucket near-dup join,
   both incoming-sized.
3. Print the per-source data card of the kept set.

Run: python examples/daily_crawl.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark, load_table
from streamz_spark.operators.dedup import dedup_index_artifacts, incremental_dedup


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("daily-crawl-example")
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 10 < 2)
    index = docs.where(F.col("doc_id") % 10 >= 2)

    # 1. the index artifact a production deployment persists once
    base = tempfile.mkdtemp(prefix="crawl_index_")
    fp, sh, band = dedup_index_artifacts(index)
    fp.write.mode("overwrite").parquet(base + "/fp")
    sh.write.mode("overwrite").parquet(base + "/sh")
    band.write.mode("overwrite").parquet(base + "/band")
    arts = tuple(spark.read.parquet(base + p) for p in ("/fp", "/sh", "/band"))

    # 2. screen today's batch — incoming-sized work only
    kept = incremental_dedup(incoming, index_artifacts=arts)
    n_in, n_kept = incoming.count(), kept.count()
    print(f"incoming {n_in} docs -> kept {n_kept} "
          f"({n_in - n_kept} duplicates of the index dropped)")

    # 3. data card of what survived
    spent = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("text")).alias("chars"),
    )
    for r in spent.orderBy("source").collect():
        print(f"  {r['source']}: {r['docs']} docs, {r['chars']} chars")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
