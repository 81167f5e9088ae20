"""Importing this package registers every catalog query.

Module per SURVEY.md §2 area; each module's import populates
``streamz_spark.catalog.REGISTRY``.
"""

from streamz_spark.queries import aggs, core, joins, stateless, tpch, windows  # noqa: F401
