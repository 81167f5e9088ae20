"""Source/sink format coverage: JSON, CSV, ORC roundtrips with explicit
schemas (the reference's from_textfile/sink_to_textfile family —
SURVEY.md §2.2 — generalized to Spark's format matrix).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.io import load_table

from .conftest import SF_DIR


def _roundtrip(spark, df, path, fmt, schema):
    getattr(df.write.mode("overwrite"), fmt)(path)
    if fmt == "csv":
        back = spark.read.schema(schema).option("header", "false").csv(path)
    else:
        back = spark.read.schema(schema).format(fmt).load(path)
    return back


def test_json_csv_orc_roundtrip(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("formats"))
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    schema = ev.schema
    want_n = ev.count()
    want_sum = ev.agg(F.sum("value")).first()[0]

    for fmt in ("json", "csv", "orc"):
        back = _roundtrip(spark, ev, f"{base}/{fmt}", fmt, schema)
        assert back.count() == want_n, fmt
        got_sum = back.agg(F.sum("value")).first()[0]
        assert abs(got_sum - want_sum) < 1e-6, fmt
        assert back.schema == schema, fmt


def test_text_lines_roundtrip(spark, tmp_path_factory):
    """sink_to_textfile / from_textfile: line-per-element text files."""
    base = str(tmp_path_factory.mktemp("text")) + "/lines"
    docs = load_table(spark, SF_DIR, "documents").select(
        F.concat_ws("|", "doc_id", "lang").alias("value")
    )
    docs.write.mode("overwrite").text(base)
    back = spark.read.text(base)
    assert back.count() == docs.count()
    parsed = back.select(
        F.split("value", r"\|").getItem(0).cast("long").alias("doc_id"),
        F.split("value", r"\|").getItem(1).alias("lang"),
    )
    want = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    assert parsed.exceptAll(want).count() == 0
    assert want.exceptAll(parsed).count() == 0
