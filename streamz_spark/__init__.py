"""streamz_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of python-streamz/streamz.

Not a port: the reference's push-based DAG becomes lazy DataFrame
lineage analyzed by Catalyst; its incremental add/subtract aggregation
state machines become Structured Streaming partial aggregates + state
store; its pandas micro-batches become Arrow-backed Spark micro-batches.
"""

from streamz_spark.session import get_spark
from streamz_spark.io import load_table, load_tables, register_views
from streamz_spark.core import Stream
from streamz_spark.frame import StreamingFrame
from streamz_spark.aggregation import Aggregation

__version__ = "0.2.0"

__all__ = [
    "get_spark", "load_table", "load_tables", "register_views",
    "Stream", "StreamingFrame", "Aggregation", "__version__",
]
