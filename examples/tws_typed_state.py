"""transformWithStateInPandas tour: every typed-state primitive live.

Spark 4's next-generation stateful API, running on the RocksDB
provider with the protobuf runtime recovered by
``streamz_spark.streaming.tws.ensure_protobuf_runtime``:

1. ValueState  — keyed running sum (``running_sum_tws``)
2. ListState   — sliding count-window sum (``count_window_sum_tws``)
3. MapState    — per-key categorical histogram (``frequencies_tws``)
4. state TTL   — latest-value with declarative expiry
                 (``latest_value_ttl_tws``)
5. timers      — session close emitted with NO new input for the key
                 (``session_gap_tws``)

Run: python examples/tws_typed_state.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from streamz_spark import get_spark
from streamz_spark.streaming.sinks import sink_to_list
from streamz_spark.streaming.sources import from_iterable
from streamz_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    count_window_sum_tws,
    frequencies_tws,
    running_sum_tws,
    tws_runtime_available,
)


def main() -> None:
    spark = get_spark("tws-typed-state-example")
    if not tws_runtime_available():
        print("no google.protobuf runtime available — see scripts/probe_tws.py")
        return
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )

    chunks = [
        pd.DataFrame({"user_id": [1, 2, 1], "value": [1.0, 2.0, 3.0],
                      "event_type": ["a", "a", "b"]}),
        pd.DataFrame({"user_id": [2, 1, 2], "value": [5.0, 7.0, 11.0],
                      "event_type": ["b", "a", "a"]}),
    ]
    schema = "user_id long, value double, event_type string"

    print("== ValueState: running sum per key ==")
    for b in sink_to_list(
        running_sum_tws(from_iterable(spark, chunks, schema), "user_id"),
        output_mode="update",
    ):
        if len(b):
            print(b.sort_values("user_id").to_string(index=False))

    print("== ListState: last-3 window sum per key ==")
    for b in sink_to_list(
        count_window_sum_tws(from_iterable(spark, chunks, schema), "user_id", n=3),
        output_mode="update",
    ):
        if len(b):
            print(b.sort_values("user_id").to_string(index=False))

    print("== MapState: per-key event-type histogram ==")
    for b in sink_to_list(
        frequencies_tws(from_iterable(spark, chunks, schema), "user_id"),
        output_mode="update",
    ):
        if len(b):
            print(b.sort_values(["user_id", "category"]).to_string(index=False))

    print("(TTL + timer variants run in tests/test_rocksdb_state.py — "
          "they need wall-clock gaps)")
    spark.stop()


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"done in {time.time() - t0:.1f}s")
