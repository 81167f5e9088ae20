"""Phase-0 flagship: the reference's canonical grouped-aggregation.

Mirrors streamz's headline example ``sdf.groupby('name').amount.sum()``
(reference: streamz/core.py:616-619, dataframe/tests/
test_dataframes.py:454-463) over the driver's ``events`` table, as an
update-mode streaming aggregate expressed in batch as a plain
groupBy/agg — Catalyst keeps partial (map-side) aggregates, so the
shuffle moves one row per (partition × key), not per event.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table


@register(
    "groupby_sum",
    oracle="""
        SELECT event_type,
               SUM(value) AS sum_value,
               COUNT(*)   AS n_events
        FROM events
        GROUP BY event_type
    """,
    doc="sdf.groupby('event_type').value.sum() — streamz dataframe/core.py:840-881",
)
def groupby_sum(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
