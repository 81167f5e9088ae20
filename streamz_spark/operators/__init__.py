"""Operator library: reusable building blocks behind the query catalog
and the fluent frame API.

Each module re-expresses one area of the reference's operator
inventory (SURVEY.md §2) in idiomatic Spark — declarative DataFrame
ops first, Arrow-batched pandas UDFs only where Catalyst genuinely
cannot express the semantics (EWM scans, MinHash signatures).
"""
