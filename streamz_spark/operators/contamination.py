"""Benchmark-contamination detection for training corpora.

Standard LLM decontamination (public recipe: GPT-3 appendix C /
Gopher §A.1 / PaLM): a training document is contaminated when a large
fraction of its k-word shingles (k≈13 in published pipelines) also
appears in an evaluation benchmark. The reference engine has no such
operator; it's core to the 100 TB training-data story, so it ships as
a first-class op.

Scale design: both sides reduce to distinct (doc, shingle) posting
lists; the benchmark side is collapsed to a *distinct shingle set*
(typically ≪ corpus — benchmarks are MBs against TBs of corpus), so
the hit-count join is corpus-posting ⋈ benchmark-shingles on the
shingle key. AQE broadcasts the benchmark side when it fits, else it
is a balanced high-cardinality shuffle; either way the corpus is
scanned once and never self-joined. Per-doc totals ride along from
the shingling pass — no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamz_spark.operators.text import word_shingles

__all__ = ["contamination_check"]


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    k: int = 13,
    threshold: float = 0.8,
) -> DataFrame:
    """Flag training docs whose k-gram overlap with a benchmark set
    exceeds ``threshold``.

    Returns one row per doc with ≥1 shingle:
    ``(id_col, n_shingles, n_hits, overlap, contaminated)`` where
    ``overlap = n_hits / n_shingles`` over the doc's *distinct*
    shingles. Docs shorter than k words have no shingles and are
    reported with ``n_shingles = 0, overlap = 0.0`` (can't be judged —
    published pipelines fall back to exact-substring rules there).
    """
    sh = docs.select(
        F.col(id_col), word_shingles(text_col, k).alias("sh")
    )
    posting = sh.select(id_col, F.explode("sh").alias("shingle"))
    bench = (
        benchmark.select(
            F.explode(word_shingles(bench_text_col or text_col, k)).alias("shingle")
        )
        .distinct()
    )
    hits = (
        posting.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = sh.select(id_col, F.size("sh").alias("n_shingles"))
    overlap = F.when(
        F.col("n_shingles") > 0,
        F.col("n_hits") / F.col("n_shingles"),
    ).otherwise(F.lit(0.0))
    return (
        totals.join(hits, id_col, "left")
        .fillna(0, subset=["n_hits"])
        .select(
            id_col,
            "n_shingles",
            "n_hits",
            overlap.alias("overlap"),
            (overlap >= threshold).alias("contaminated"),
        )
    )
