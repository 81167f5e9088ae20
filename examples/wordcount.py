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

    lines = ["the quick brown fox", "jumps over the lazy dog", "the end"]
    n_distinct = len({w for ln in lines for w in ln.split()})

    def feed():
        conn, _ = server.accept()
        for line in lines:
            conn.sendall((line + "\n").encode())
        time.sleep(30)
        conn.close()

    threading.Thread(target=feed, daemon=True).start()

    counts = (
        from_socket(spark, "127.0.0.1", port)
        .select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word").count()
    )
    q = (counts.writeStream.outputMode("complete").format("memory")
         .queryName("wc").trigger(processingTime="500 milliseconds").start())
    # poll until every word arrived (fixed sleeps starve under a busy
    # machine and print an empty table)
    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.sql("SELECT count(*) FROM wc").first()[0] >= n_distinct:
            break
        time.sleep(0.5)
    q.stop()
    spark.sql("SELECT * FROM wc ORDER BY count DESC, word").show()
    spark.stop()


if __name__ == "__main__":
    main()
