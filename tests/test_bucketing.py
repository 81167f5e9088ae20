"""Bucketing: pre-shuffled table layout so repeated joins on the
bucket key need no Exchange — the 100 TB answer to 'this join runs
every hour'. Asserted from the physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.plans import exchange_count, sort_merge_join_count

from .conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    # tables land in ./spark-warehouse (gitignored); warehouse dir is a
    # static config and cannot be pointed at a tmpdir on a live session
    # disable auto-broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import shutil

        orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        # a killed run can leave the managed-table location behind while the
        # catalog entry is gone — saveAsTable then fails LOCATION_ALREADY_EXISTS
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("b_orders", "b_lineitem"):
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
         .sortBy("o_orderkey").saveAsTable("b_orders"))
        (li.withColumnRenamed("l_orderkey", "o_orderkey")
         .write.mode("overwrite").bucketBy(8, "o_orderkey")
         .sortBy("o_orderkey").saveAsTable("b_lineitem"))

        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        agg = joined.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
        # bucketed sides: the join itself requires no Exchange, and the
        # groupBy on the bucket key reuses the bucketing too
        assert exchange_count(joined) == 0, "bucketed join still shuffles"
        assert sort_merge_join_count(joined) == 1  # co-located sort-merge
        # correctness unchanged
        want = (
            load_table(spark, SF_DIR, "lineitem")
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
