"""Importing this package registers every catalog query.

Module per SURVEY.md §2 area; each module's import populates
``streamz_spark.catalog.REGISTRY``.
"""

from streamz_spark.queries import (  # noqa: F401
    aggs,
    core,
    dedup_queries,
    joins,
    misc,
    multimodal_queries,
    stateless,
    text_analysis,
    tpch,
    windows,
)
