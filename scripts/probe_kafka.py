"""Reproducible probe: can the real Kafka connector path execute in
this container? (VERDICT r2 next-round item #2.)

The real path needs three things; each is probed independently:
  1. the spark-sql-kafka connector jar on the classpath
  2. a Kafka broker to talk to (binary, or an embeddable client lib)
  3. failing local options, network access to fetch either

Run: python scripts/probe_kafka.py   (exit 0 = path available)
"""

import glob
import importlib.util
import os
import socket
import subprocess
import sys


def probe() -> dict:
    out = {}

    # 1. connector jar anywhere plausible
    spec = importlib.util.find_spec("pyspark")
    jar_dirs = [
        os.path.join(os.path.dirname(spec.origin), "jars"),
        os.path.expanduser("~/.ivy2"),
        "/opt", "/usr/share/java",
    ]
    hits = []
    for d in jar_dirs:
        hits += glob.glob(os.path.join(d, "**", "*kafka*.jar"), recursive=True)
    out["connector_jar"] = hits or "ABSENT in pyspark/jars, ~/.ivy2, /opt, /usr/share/java"

    # 2. broker: server binary or python client lib
    which = subprocess.run(
        ["bash", "-c", "command -v kafka-server-start kafka-server-start.sh"],
        capture_output=True, text=True,
    )
    out["broker_binary"] = which.stdout.strip() or "ABSENT (no kafka-server-start on PATH)"
    out["confluent_kafka_pylib"] = (
        "present" if importlib.util.find_spec("confluent_kafka") else "ABSENT"
    )

    # 3. network to Maven Central (to fetch the jar via spark.jars.packages)
    try:
        socket.getaddrinfo("repo1.maven.org", 443)
        out["network"] = "DNS resolves (fetch may work)"
    except OSError as exc:
        out["network"] = f"ABSENT — DNS failure: {exc}"

    return out


if __name__ == "__main__":
    result = probe()
    for k, v in result.items():
        print(f"{k}: {v}")
    ok = (
        isinstance(result["connector_jar"], list)
        and "ABSENT" not in result["broker_binary"]
    )
    print("kafka-executable:", ok)
    sys.exit(0 if ok else 1)
