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
from streamz_spark.operators.index_store import DedupIndexStore


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("daily-crawl-example")
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 10 < 2)
    index = docs.where(F.col("doc_id") % 10 >= 2)

    # 1. the index artifact a production deployment persists once —
    # DedupIndexStore owns the whole lifecycle (screen/append/compact)
    store = DedupIndexStore(spark, tempfile.mkdtemp(prefix="crawl_index_"))
    store.initialize(index)

    # 2. screen today's batch — incoming-sized work only
    kept = store.screen(incoming)
    n_in, n_kept = incoming.count(), kept.count()
    print(f"incoming {n_in} docs -> kept {n_kept} "
          f"({n_in - n_kept} duplicates of the index dropped)")

    # 3. data card of what survived — computed BEFORE mutating the
    # store: `kept` is lazy and reads the store's current files, so
    # re-executing it after append/compact would hit deleted paths
    # (see DedupIndexStore.screen's contract)
    spent = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("text")).alias("chars"),
    ).orderBy("source").collect()
    for r in spent:
        print(f"  {r['source']}: {r['docs']} docs, {r['chars']} chars")

    # 4. fold the survivors into the index (tomorrow screens against
    # them) and compact so read amplification stays bounded over days
    store.append(kept)
    print("files after append:", store.file_counts(),
          "-> after compact:", store.compact())

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
