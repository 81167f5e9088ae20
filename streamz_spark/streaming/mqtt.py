"""Minimal MQTT 3.1.1 support, pure stdlib (public OASIS spec).

The fallback transport behind ``from_mqtt`` / ``to_mqtt`` when
``paho-mqtt`` is not installed (reference: streamz/sources.py:880-932,
streamz/sinks.py:236-273), plus an embeddable broker so the live path
is testable without external infrastructure. Implements the QoS-0
subset a streaming source/sink needs:

- CONNECT/CONNACK, PUBLISH (QoS 0), SUBSCRIBE/SUBACK,
  PINGREQ/PINGRESP, DISCONNECT
- topic filters with ``+`` (single-level) and ``#`` (multi-level)
  wildcards

No QoS 1/2, retained messages, wills, or auth — those belong to a
real broker; this exists so the container without one still runs a
live MQTT path end-to-end.
"""

from __future__ import annotations

import socket
import struct
import threading

CONNECT, CONNACK, PUBLISH, SUBSCRIBE, SUBACK = 1, 2, 3, 8, 9
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


def _encode_varint(n: int) -> bytes:
    out = b""
    while True:
        byte = n % 128
        n //= 128
        out += bytes([byte | (0x80 if n else 0)])
        if not n:
            return out


def _read_varint(conn: socket.socket) -> int:
    # MQTT 3.1.1 §2.2.3: remaining-length is at most 4 bytes — bound the
    # loop so a peer streaming 0x80 continuation bytes can't spin us
    mult, value = 1, 0
    for _ in range(4):
        (b,) = _recv_exact(conn, 1)
        value += (b & 0x7F) * mult
        if not b & 0x80:
            return value
        mult *= 128
    raise ConnectionError("mqtt malformed remaining-length (>4 bytes)")


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("mqtt peer closed")
        buf += chunk
    return buf


def _mqtt_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + _encode_varint(len(body)) + body


def _read_packet(conn: socket.socket) -> tuple[int, int, bytes]:
    (h,) = _recv_exact(conn, 1)
    length = _read_varint(conn)
    body = _recv_exact(conn, length) if length else b""
    return h >> 4, h & 0x0F, body


def topic_matches(flt: str, topic: str) -> bool:
    """MQTT 3.1.1 §4.7 wildcard matching: + one level, # remainder."""
    fparts, tparts = flt.split("/"), topic.split("/")
    for i, fp in enumerate(fparts):
        if fp == "#":
            return True
        if i >= len(tparts):
            return False
        if fp != "+" and fp != tparts[i]:
            return False
    return len(fparts) == len(tparts)


class MQTTBroker:
    """Embeddable QoS-0 broker: routes PUBLISH to matching subscribers."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.sock = socket.create_server((host, port))
        self.port = self.sock.getsockname()[1]
        self._subs: list[tuple[socket.socket, str]] = []
        self._lock = threading.Lock()
        # per-subscriber write lock: PUBLISH fan-out runs on each
        # publisher's serve thread, so two concurrent publishers would
        # otherwise interleave frame bytes on one subscriber socket
        self._wlocks: dict[socket.socket, threading.Lock] = {}
        self._stopped = False

    def start(self) -> "MQTTBroker":
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def _accept_loop(self) -> None:
        while not self._stopped:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        wlock = threading.Lock()
        with self._lock:
            self._wlocks[conn] = wlock

        def reply(pkt: bytes) -> None:
            # the serve thread's own control replies (CONNACK/SUBACK/
            # PINGRESP) take the same per-socket lock as PUBLISH
            # fan-out from publisher threads — otherwise a PINGRESP
            # can interleave bytes with an in-flight PUBLISH
            with wlock:
                conn.sendall(pkt)

        try:
            while True:
                ptype, _flags, body = _read_packet(conn)
                if ptype == CONNECT:
                    reply(_packet(CONNACK, 0, b"\x00\x00"))
                elif ptype == SUBSCRIBE:
                    pid = body[:2]
                    i, grants = 2, b""
                    while i < len(body):
                        (tlen,) = struct.unpack(">H", body[i : i + 2])
                        flt = body[i + 2 : i + 2 + tlen].decode()
                        i += 2 + tlen + 1  # skip requested qos
                        with self._lock:
                            self._subs.append((conn, flt))
                        grants += b"\x00"
                    reply(_packet(SUBACK, 0, pid + grants))
                elif ptype == PUBLISH:
                    (tlen,) = struct.unpack(">H", body[:2])
                    topic = body[2 : 2 + tlen].decode()
                    payload = body[2 + tlen :]  # QoS 0: no packet id
                    with self._lock:
                        targets = [
                            (c, self._wlocks.get(c))
                            for c, f in self._subs
                            if topic_matches(f, topic)
                        ]
                    pkt = _packet(PUBLISH, 0, _mqtt_str(topic) + payload)
                    for c, wlock in targets:
                        try:
                            if wlock is None:
                                c.sendall(pkt)
                            else:
                                with wlock:
                                    c.sendall(pkt)
                        except OSError:
                            pass
                elif ptype == PINGREQ:
                    reply(_packet(PINGRESP, 0, b""))
                elif ptype == DISCONNECT:
                    return
        except (ConnectionError, OSError):
            return
        finally:
            with self._lock:
                self._subs = [(c, f) for c, f in self._subs if c is not conn]
                self._wlocks.pop(conn, None)
            conn.close()

    def stop(self) -> None:
        self._stopped = True
        self.sock.close()


class MQTTClient:
    """Blocking QoS-0 client: connect, publish, subscribe+callback."""

    def __init__(self, host: str, port: int, client_id: str = "streamz-spark",
                 keepalive: int = 60, timeout: float = 10.0):
        self.conn = socket.create_connection((host, port), timeout=timeout)
        var = (_mqtt_str("MQTT") + bytes([4])  # protocol level 3.1.1
               + bytes([0x02])                 # clean session
               + struct.pack(">H", keepalive))
        self.conn.sendall(_packet(CONNECT, 0, var + _mqtt_str(client_id)))
        ptype, _, body = _read_packet(self.conn)
        if ptype != CONNACK or body[1] != 0:
            raise ConnectionError(f"mqtt connect refused: {body!r}")

    def publish(self, topic: str, payload: str | bytes) -> None:
        data = payload.encode() if isinstance(payload, str) else payload
        self.conn.sendall(_packet(PUBLISH, 0, _mqtt_str(topic) + data))

    def subscribe(self, topic_filter: str, on_message) -> None:
        """SUBSCRIBE then spawn a reader thread calling
        ``on_message(topic, payload_str)`` per delivery."""
        body = struct.pack(">H", 1) + _mqtt_str(topic_filter) + bytes([0])
        self.conn.sendall(_packet(SUBSCRIBE, 0x02, body))
        ptype, _, _ = _read_packet(self.conn)
        if ptype != SUBACK:
            raise ConnectionError("mqtt subscribe not acknowledged")
        self.conn.settimeout(None)  # reader blocks indefinitely

        def reader():
            try:
                while True:
                    ptype, _, body = _read_packet(self.conn)
                    if ptype == PUBLISH:
                        (tlen,) = struct.unpack(">H", body[:2])
                        on_message(body[2 : 2 + tlen].decode(), body[2 + tlen :].decode())
            except (ConnectionError, OSError):
                return

        threading.Thread(target=reader, daemon=True).start()

    def disconnect(self) -> None:
        try:
            self.conn.sendall(_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        self.conn.close()
