"""Unit tests for the built-in protocol fallbacks (streaming/ws.py,
streaming/mqtt.py): frame-codec edge paths the live round-trip tests
don't reach — extended payload lengths, fragmentation, ping/pong,
wildcard topic matching."""

from __future__ import annotations

import threading
import time

from streamz_spark.streaming.mqtt import MQTTBroker, MQTTClient, topic_matches
from streamz_spark.streaming.ws import WSClient, WSServer, _write_frame


def _wait(cond, timeout=10):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.05)
    return False


def test_ws_extended_payload_lengths():
    # 7-bit (<126), 16-bit (126..65535), 64-bit (>65535) length paths
    received: list = []
    server = WSServer("127.0.0.1", 0, received.append).start()
    try:
        c = WSClient("127.0.0.1", server.port)
        msgs = ["x" * 5, "y" * 300, "z" * 70_000]
        for m in msgs:
            c.send(m)
        c.close()
        assert _wait(lambda: len(received) == 3), f"got {len(received)}"
        assert sorted(len(m) for m in received) == [5, 300, 70_000]
        assert set("".join(sorted(set(m))) for m in received) == {"x", "y", "z"}
    finally:
        server.stop()


def test_ws_fragmentation_and_ping():
    # continuation frames reassemble; ping gets ponged without
    # disturbing the data stream
    received: list = []
    server = WSServer("127.0.0.1", 0, received.append).start()
    try:
        c = WSClient("127.0.0.1", server.port)
        # hand-build a fragmented text message: 0x01 (text, FIN=0) then
        # 0x00 (continuation, FIN=1); client->server frames must mask
        conn = c.conn
        b1 = bytes([0x01])  # text, no FIN
        payload = b"hello "
        conn.sendall(b1 + bytes([0x80 | len(payload)]) + b"\x00\x00\x00\x00" + payload)
        _write_frame(conn, b"ping!", opcode=0x9, mask=True)  # interleaved ping
        b2 = bytes([0x80])  # continuation, FIN
        payload2 = b"world"
        conn.sendall(b2 + bytes([0x80 | len(payload2)]) + b"\x00\x00\x00\x00" + payload2)
        assert _wait(lambda: received == ["hello world"]), received
        c.close()
    finally:
        server.stop()


def test_mqtt_topic_matches():
    assert topic_matches("a/b/c", "a/b/c")
    assert topic_matches("a/+/c", "a/b/c")
    assert not topic_matches("a/+/c", "a/b/d")
    assert not topic_matches("a/+", "a/b/c")  # + is single-level
    assert topic_matches("a/#", "a/b/c")
    assert topic_matches("#", "anything/at/all")
    assert not topic_matches("a/b", "a/b/c")
    assert not topic_matches("a/b/c", "a/b")


def test_mqtt_large_payload_varint():
    # >127-byte remaining length exercises the varint encoding; >16KB
    # exercises multi-byte continuation
    received: list = []
    broker = MQTTBroker().start()
    try:
        sub = MQTTClient("127.0.0.1", broker.port, client_id="s")
        sub.subscribe("big/#", lambda t, p: received.append((t, len(p))))
        pub = MQTTClient("127.0.0.1", broker.port, client_id="p")
        pub.publish("big/one", "a" * 200)
        pub.publish("big/two", "b" * 20_000)
        pub.disconnect()
        assert _wait(lambda: len(received) == 2), received
        assert sorted(received) == [("big/one", 200), ("big/two", 20_000)]
        sub.disconnect()
    finally:
        broker.stop()


def test_mqtt_multiple_subscribers_routing():
    got_a: list = []
    got_all: list = []
    broker = MQTTBroker().start()
    try:
        s1 = MQTTClient("127.0.0.1", broker.port, client_id="s1")
        s1.subscribe("t/a", lambda t, p: got_a.append(p))
        s2 = MQTTClient("127.0.0.1", broker.port, client_id="s2")
        s2.subscribe("t/+", lambda t, p: got_all.append(p))
        pub = MQTTClient("127.0.0.1", broker.port, client_id="p")
        pub.publish("t/a", "1")
        pub.publish("t/b", "2")
        pub.disconnect()
        assert _wait(lambda: len(got_all) == 2 and len(got_a) == 1)
        assert got_a == ["1"] and sorted(got_all) == ["1", "2"]
        s1.disconnect()
        s2.disconnect()
    finally:
        broker.stop()


def test_ws_pipelined_frames_after_handshake():
    # a client that sends its first frames in the SAME tcp segment as
    # the upgrade request must not lose them (server keeps bytes after
    # \r\n\r\n as the initial frame buffer)
    import base64
    import os
    import socket

    received: list = []
    server = WSServer("127.0.0.1", 0, received.append).start()
    try:
        conn = socket.create_connection(("127.0.0.1", server.port), timeout=10)
        key = base64.b64encode(os.urandom(16)).decode()
        handshake = (
            f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
        payload = b"pipelined"
        frame = (
            bytes([0x81, 0x80 | len(payload)]) + b"\x00\x00\x00\x00" + payload
        )
        conn.sendall(handshake + frame)  # one segment: handshake + frame
        assert _wait(lambda: received == ["pipelined"]), received
        conn.close()
    finally:
        server.stop()


def test_ws_accept_key_is_case_sensitive():
    # a server answering with a wrong-case (invalid) accept value must
    # be rejected — base64 is case-sensitive (RFC 6455 §4.1)
    import socket
    import threading as _t

    import pytest

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def bad_server():
        conn, _ = srv.accept()
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        key = ""
        for line in req.decode("latin-1").split("\r\n"):
            if line.lower().startswith("sec-websocket-key:"):
                key = line.split(":", 1)[1].strip()
        from streamz_spark.streaming.ws import _accept_key

        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_accept_key(key).lower()}\r\n\r\n"
            ).encode()
        )

    _t.Thread(target=bad_server, daemon=True).start()
    try:
        with pytest.raises(ConnectionError, match="Sec-WebSocket-Accept"):
            WSClient("127.0.0.1", port)
    finally:
        srv.close()


def test_mqtt_varint_bounded_at_four_bytes():
    # MQTT 3.1.1 §2.2.3: a peer streaming 0x80 continuation bytes must
    # raise, not spin the reader thread with an unbounded multiplier
    import socket

    import pytest

    from streamz_spark.streaming.mqtt import _read_varint

    a, b = socket.socketpair()
    try:
        a.sendall(b"\x80" * 10)
        with pytest.raises(ConnectionError, match="remaining-length"):
            _read_varint(b)
    finally:
        a.close()
        b.close()


def test_mqtt_concurrent_publishers_no_interleave():
    # two publisher threads fanning out to one subscriber: per-socket
    # write locks must keep frames intact (no interleaved bytes)
    broker = MQTTBroker().start()
    try:
        got: list = []
        sub = MQTTClient("127.0.0.1", broker.port, client_id="sub")
        sub.subscribe("t/#", lambda topic, payload: got.append((topic, payload)))
        pubs = [MQTTClient("127.0.0.1", broker.port, client_id=f"p{i}") for i in range(4)]
        n_each = 50

        def blast(c, i):
            for j in range(n_each):
                c.publish(f"t/{i}", f"m{i}-{j}" + "x" * 200)

        threads = [
            threading.Thread(target=blast, args=(c, i)) for i, c in enumerate(pubs)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert _wait(lambda: len(got) == 4 * n_each, timeout=20), len(got)
        # every payload arrived exactly as published — corruption from
        # interleaved writes would break topic/payload pairing
        for topic, payload in got:
            i = int(topic.rsplit("/", 1)[1])
            assert payload.startswith(f"m{i}-") and payload.endswith("x" * 200)
        for c in pubs:
            c.disconnect()
        sub.disconnect()
    finally:
        broker.stop()
