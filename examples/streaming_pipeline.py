"""Round-trip streaming pipeline on the file-backed log source, plus
updating-aggregate composition and a custom Aggregation — the
reference's kafka-wordcount + updating-aggregate examples re-expressed.

Run: python examples/streaming_pipeline.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from streamz_spark import get_spark
from streamz_spark.frame import StreamingFrame
from streamz_spark.streaming.datasources import filelog_append, from_filelog, to_filelog
from streamz_spark.streaming.sinks import sink_to_list, updating_to_list
from streamz_spark.streaming.sources import from_iterable


def main():
    spark = get_spark("streaming-example")

    # 1. produce -> consume -> transform -> produce, with offsets
    src = tempfile.mkdtemp(prefix="log_src_")
    dst = tempfile.mkdtemp(prefix="log_dst_")
    filelog_append(src, [json.dumps({"word": w}) for w in "the quick brown fox the lazy dog the".split()])
    events = from_filelog(spark, src)
    words = events.select(F.get_json_object("value", "$.word").alias("value"))
    to_filelog(words, dst)
    echoed = sink_to_list(from_filelog(spark, dst))
    print("round-tripped words:", sorted(v for b in echoed for v in b["value"]))

    # 2. updating aggregate feeding a second aggregation (streamz
    #    sdf.groupby('x').y.sum().mean() semantics)
    rows = [(i % 3, float(i)) for i in range(12)]
    chunks = [pd.DataFrame(rows[i:i + 4], columns=["x", "y"]) for i in (0, 4, 8)]
    sdf = StreamingFrame(from_iterable(spark, chunks, schema="x long, y double"))
    per_chunk = updating_to_list(sdf.groupby("x").y.sum().y_sum.mean())
    print("mean of per-key running sums, per chunk:",
          [round(b["y_sum_mean"].iloc[0], 3) for b in per_chunk])

    # 3. custom Aggregation protocol
    from streamz_spark.aggregation import Aggregation, aggregate_updating_to_list

    class CountChunks(Aggregation):
        def initial(self, new):
            return 0

        def on_new(self, state, new):
            return state + 1, {"chunks_seen": state + 1, "rows_in_chunk": len(new)}

    stream = from_iterable(spark, chunks, schema="x long, y double")
    for r in aggregate_updating_to_list(stream, CountChunks()):
        print("custom agg:", r)

    spark.stop()


if __name__ == "__main__":
    main()
