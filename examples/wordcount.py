"""Network word count — the reference's canonical example
(streamz examples/network_wordcount.py) on this engine.

Run: python examples/wordcount.py   (serves its own demo socket)
"""

import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark
from streamz_spark.streaming.sources import from_socket


def main():
    spark = get_spark("wordcount-example")

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def feed():
        conn, _ = server.accept()
        for line in ["the quick brown fox", "jumps over the lazy dog", "the end"]:
            conn.sendall((line + "\n").encode())
        time.sleep(8)
        conn.close()

    threading.Thread(target=feed, daemon=True).start()

    counts = (
        from_socket(spark, "127.0.0.1", port)
        .select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word").count()
    )
    q = (counts.writeStream.outputMode("complete").format("memory")
         .queryName("wc").trigger(processingTime="500 milliseconds").start())
    time.sleep(6)
    q.stop()
    spark.sql("SELECT * FROM wc ORDER BY count DESC").show()
    spark.stop()


if __name__ == "__main__":
    main()
