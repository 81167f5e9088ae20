"""Write-side layout → read-side pruning (export.write_partitioned_corpus).

The claims are physical, so the assertions are physical: a filter on
the partition column must shrink `inputFiles()` to only the matching
directories (partition pruning), a range filter on the sort key must
reach the scan as a pushed filter against min/max-ordered row groups,
and the round trip must be lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.operators.export import write_partitioned_corpus
from streamz_spark.operators.sampling import hash_split
from streamz_spark.plans import explain_string, pushed_filters

from .conftest import SF_DIR


def _written(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("layout") / "corpus")
    docs = hash_split(load_table(spark, SF_DIR, "documents"), "doc_id")
    write_partitioned_corpus(
        docs, base, partition_by=("split",), sort_within_by=("doc_id",)
    )
    return base, docs


def test_partition_pruning_and_roundtrip(spark, tmp_path_factory):
    base, docs = _written(spark, tmp_path_factory)
    back = spark.read.parquet(base)

    # lossless round trip (split survives as the partition column)
    want = docs.orderBy("doc_id").select("doc_id", "text", "split").toPandas()
    got = back.orderBy("doc_id").select("doc_id", "text", "split").toPandas()
    assert got.equals(want)

    # partition pruning: the split predicate must land in the scan's
    # PartitionFilters (directory-level pruning), NOT as a post-scan
    # data filter. (inputFiles() reflects the pre-pruning file index,
    # so the plan is the physical evidence.)
    val = back.filter(F.col("split") == "val")
    plan = explain_string(val)
    assert "PartitionFilters" in plan, plan
    partition_clause = plan.split("PartitionFilters", 1)[1][:250]
    assert "split" in partition_clause and "val" in partition_clause, partition_clause
    # and the directory IS the partition: reading it directly yields
    # exactly the filtered rows
    direct = spark.read.parquet(os.path.join(base, "split=val"))
    assert sorted(r["doc_id"] for r in direct.collect()) == sorted(
        r["doc_id"] for r in val.collect()
    )


def test_sort_key_filter_pushed_to_scan(spark, tmp_path_factory):
    base, _ = _written(spark, tmp_path_factory)
    back = spark.read.parquet(base)
    rng = back.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    pf = " ".join(pushed_filters(rng))
    assert "doc_id" in pf, pf


def test_partitionby_explosion_prevented(spark, tmp_path_factory):
    # without the repartition-on-partition-cols, every input task
    # writes a file per split directory; with it, each directory holds
    # a bounded file count independent of input parallelism
    base, _ = _written(spark, tmp_path_factory)
    for split in ("train", "val", "test"):
        d = os.path.join(base, f"split={split}")
        n = len([f for f in os.listdir(d) if f.endswith(".parquet")])
        assert 1 <= n <= 4, (split, n)
