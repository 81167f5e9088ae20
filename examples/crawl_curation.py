"""Crawl curation end-to-end: WET archives in, ranked + screened
corpus out — the front half of a web-scale pretraining pipeline.

1. Ingest WET (Common Crawl's text format): serialize the documents
   table as WET archives (plain + gzip), then parse them back with
   `read_wet` — binaryFile rows, Content-Length framing, malformed
   quarantine.
2. Hot-host pre-flight: exact Misra-Gries heavy hitters over the host
   key — the skew check a 100 TB pipeline runs before any host-keyed
   join/groupBy (candidates bounded at k per partition, answer exact).
3. Host centrality: 3 rounds of fixed-point PageRank over the link
   graph — the crawl-seed ranking signal (Common Crawl publishes host
   ranks computed this way); ranks join back as a per-doc quality
   prior.
4. Quality screen: keep docs whose host centrality reaches the top
   quartile.

Run: python examples/crawl_curation.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark, load_table
from streamz_spark.formats import read_wet, wet_bytes
from streamz_spark.operators.graph import pagerank
from streamz_spark.operators.sketches import heavy_hitters


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("crawl-curation-example")
    docs = load_table(spark, sf_dir, "documents")

    # --- 1. write + re-ingest WET archives -----------------------------
    pdf = docs.select("doc_id", "text").toPandas()
    wet_dir = tempfile.mkdtemp(prefix="wet_")
    n_files = 8
    for i in range(n_files):
        part = pdf[pdf.doc_id % n_files == i]
        recs = [
            (f"http://host{r.doc_id % 40:02d}.test/doc/{r.doc_id}",
             "2026-01-01T00:00:00Z", r.text)
            for r in part.itertuples()
        ]
        path = os.path.join(wet_dir, f"part-{i:05d}.warc.wet" + (".gz" if i % 2 else ""))
        with open(path, "wb") as f:
            f.write(wet_bytes(recs, gz=bool(i % 2)))
    corpus = read_wet(spark, wet_dir).select(
        F.regexp_extract("url", r"http://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
    )
    print(f"ingested {corpus.count()} records from {n_files} WET files")

    # --- 2. hot-host pre-flight ----------------------------------------
    hot = heavy_hitters(corpus.select("host"), "host", k=50)
    print("hosts holding > 1/50 of the crawl (exact):")
    for r in hot.orderBy(F.desc("cnt")).collect()[:5]:
        print(f"  {r['host']}: {r['cnt']} docs")

    # --- 3. host link graph -> centrality ------------------------------
    hosts = corpus.select("host").distinct()
    n_hosts = hosts.count()
    # deterministic stand-in link graph (a real deployment extracts
    # hrefs from the WARC response records)
    h = F.regexp_extract("host", r"host(\d+)", 1).cast("long")
    def hname(expr):
        return F.concat(
            F.lit("host"), F.lpad(expr.cast("string"), 2, "0"), F.lit(".test")
        )

    base = hosts.select(F.col("host").alias("src"), h.alias("i"))
    edges = (
        base.select("src", hname((F.col("i") * 7 + 3) % n_hosts).alias("dst"))
        .union(base.select("src", hname((F.col("i") * 3 + 1) % n_hosts).alias("dst")))
        # portal hubs: every host links to one of 4 aggregators
        .union(base.select("src", hname(F.col("i") % 4).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = pagerank(hosts.withColumnRenamed("host", "id"), edges, iterations=3)
    cut = ranks.approxQuantile("rank_scaled", [0.75], 0.0)[0]
    print(f"{n_hosts} hosts ranked; p75 rank_scaled={cut:.0f}")

    # --- 4. centrality screen ------------------------------------------
    kept = corpus.join(
        ranks.filter(F.col("rank_scaled") >= cut).withColumnRenamed("id", "host"),
        "host",
    )
    print(f"kept {kept.count()} of {corpus.count()} docs on top-quartile-centrality hosts")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
