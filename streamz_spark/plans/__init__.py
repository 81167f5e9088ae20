"""Plan inspection: mechanical checks that the 100 TB contract holds.

The scale rules this engine commits to — filters reach the parquet
scan, projections prune the read schema, dimension joins broadcast,
aggregations combine map-side before shuffling — are all visible in
the formatted physical plan. These helpers turn them into assertions
so every optimization claim is tested, not asserted in prose.
"""

from streamz_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    explain_string,
    pushed_filters,
    read_schema_columns,
    sort_merge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "explain_string",
    "pushed_filters",
    "read_schema_columns",
    "sort_merge_join_count",
]
