"""Reproducible probe: can transformWithStateInPandas execute in this
container? (VERDICT r4 next-round item #6.)

The TWS Python worker speaks a protobuf protocol to the JVM state
server, so the binding constraint is a ``google.protobuf`` runtime.
This container has none in site-packages, but the gcloud SDK vendors
a complete pure-Python protobuf (6.32) under
``platform/google_appengine`` — ``ensure_protobuf_runtime()``
discovers it, wires it into sys.path + worker PYTHONPATH, and relaxes
protobuf's advisory gencode-minor-version check (pyspark 4.1 gencode
is 6.33; same major, wire-compatible).

Run: python scripts/probe_tws.py   (exit 0 = TWS path available)
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe() -> dict:
    out = {}
    try:
        found = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        found = False
    out["site_packages_protobuf"] = "present" if found else "ABSENT"

    from streamz_spark.streaming.tws import (
        BUNDLED_PROTOBUF_ROOTS,
        ensure_protobuf_runtime,
        tws_runtime_available,
    )

    for root in BUNDLED_PROTOBUF_ROOTS:
        marker = os.path.join(root, "google", "protobuf", "__init__.py")
        out[f"bundle:{root}"] = "present" if os.path.isfile(marker) else "ABSENT"

    src = ensure_protobuf_runtime()
    out["resolved_runtime"] = src or "NONE"
    if src:
        import google.protobuf as pb

        out["protobuf_version"] = getattr(pb, "__version__", "?")
        try:
            import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

            out["pyspark_state_gencode"] = (
                f"imports OK ({len(sm.DESCRIPTOR.message_types_by_name)} messages)"
            )
        except Exception as exc:  # noqa: BLE001
            out["pyspark_state_gencode"] = f"FAILED: {exc}"
    out["tws_runtime_available"] = tws_runtime_available()
    return out


if __name__ == "__main__":
    result = probe()
    for k, v in result.items():
        print(f"{k}: {v}")
    sys.exit(0 if result["tws_runtime_available"] else 1)
