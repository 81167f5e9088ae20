"""Structured Streaming layer: sources, sinks, and stateful specials.

Maps the reference's source/sink inventory (streamz/sources.py,
sinks.py — SURVEY.md §2.2) and its custom-state operators
(accumulate / partition / count-windows — §4.3) onto readStream /
writeStream / applyInPandasWithState.
"""

from streamz_spark.streaming.sources import (
    from_directory,
    from_iterable,
    from_rate,
    from_socket,
    from_kafka,
    replay_table,
)
from streamz_spark.streaming.datasources import (
    filelog_append,
    from_filelog,
    from_http_server,
    from_mqtt,
    from_process,
    from_q,
    from_websocket,
    to_filelog,
)
from streamz_spark.streaming.sinks import (
    run_available_now,
    sink_foreach_batch,
    sink_to_directory,
    sink_to_list,
    sink_to_memory,
    to_kafka,
    to_mqtt,
    to_websocket,
    updating_to_list,
)
from streamz_spark.streaming.stateful import accumulate, partition_batches

__all__ = [
    "from_directory", "from_iterable", "from_rate", "from_socket",
    "from_kafka", "replay_table",
    "filelog_append", "from_filelog", "from_http_server", "from_mqtt",
    "from_process", "from_q", "from_websocket", "to_filelog",
    "run_available_now", "sink_foreach_batch", "sink_to_directory",
    "sink_to_list", "sink_to_memory", "to_kafka", "to_mqtt", "to_websocket",
    "updating_to_list",
    "accumulate", "partition_batches",
]
