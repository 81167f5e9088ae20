"""IoT-style pipeline over live MQTT: sensors publish readings to an
embedded broker; the engine subscribes with a wildcard topic filter,
streams the readings, and sessionizes per device with the native
session-window aggregation.

Everything here runs on the built-in pure-stdlib MQTT 3.1.1 fallback
(streamz_spark/streaming/mqtt.py) — no external broker, no paho.

Run: python examples/iot_mqtt_sessions.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark
from streamz_spark.operators.windows import session_window_agg
from streamz_spark.streaming.datasources import from_mqtt
from streamz_spark.streaming.mqtt import MQTTBroker, MQTTClient
from streamz_spark.streaming.sinks import sink_to_list


def main():
    spark = get_spark("iot-mqtt-sessions")
    broker = MQTTBroker().start()
    print(f"embedded MQTT broker on :{broker.port}")

    # subscribe (wildcard filter) -> stream rows (key=topic, value=payload)
    log_dir = tempfile.mkdtemp(prefix="mqtt_log_")
    raw = from_mqtt(spark, "127.0.0.1", broker.port, "sensors/+/temp", log_dir)

    readings = raw.select(
        F.split_part("key", F.lit("/"), F.lit(2)).alias("device"),
        F.timestamp_seconds(F.split_part("value", F.lit(","), F.lit(1)).cast("long")).alias("ts"),
        F.split_part("value", F.lit(","), F.lit(2)).cast("double").alias("reading"),
    )

    # sessionize per device: 30-minute inactivity gap closes a session;
    # append mode emits a session once the watermark passes its end
    sessions = session_window_agg(
        readings, "ts", "30 minutes",
        aggs={"n_readings": F.count(F.lit(1)),
              "avg_reading": F.round(F.avg("reading"), 3)},
        keys=["device"],
        watermark="1 hour",
    )
    out: list = []
    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: out.extend(b.collect()))
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    # devices publish "<epoch_seconds>,<reading>" under sensors/<id>/temp
    pub = MQTTClient("127.0.0.1", broker.port, client_id="devices")
    base = 1_700_000_000
    for dev, offsets in {"a": (0, 60, 120), "b": (30, 90)}.items():
        for off in offsets:
            pub.publish(f"sensors/{dev}/temp", f"{base + off},{20 + off / 100.0}")
    time.sleep(1.0)  # let the subscriber thread log the wave
    q.processAllAvailable()

    # a reading 2h later advances the watermark past the first burst's
    # session end, closing it for both devices
    pub.publish("sensors/a/temp", f"{base + 7200},21.0")
    pub.disconnect()
    deadline = time.time() + 60
    while time.time() < deadline and len(out) < 2:
        time.sleep(0.3)
        q.processAllAvailable()
    q.stop()
    broker.stop()

    rows = sorted((r.device, str(r.session_start), int(r.n_readings)) for r in out)
    for dev, start, n in rows:
        print(f"device={dev} session_start={start} readings={n}")
    # burst sessions closed by the late reading; a's trailing session
    # stays open past the watermark (append emits only closed sessions)
    assert ("a", "2023-11-14 22:13:20", 3) in rows, rows
    assert ("b", "2023-11-14 22:13:50", 2) in rows, rows
    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
