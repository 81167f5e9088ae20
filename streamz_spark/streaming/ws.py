"""Minimal RFC 6455 WebSocket support, pure stdlib.

The fallback transport behind ``from_websocket`` / ``to_websocket``
when the ``websockets`` package is not installed (reference:
streamz/sources.py:799-838, streamz/sinks.py:199-232). Implements the
protocol subset a line-oriented streaming source/sink needs:

- HTTP/1.1 upgrade handshake (Sec-WebSocket-Key -> -Accept per the
  RFC 6455 GUID)
- text/binary data frames with client-side masking (required by the
  RFC for client->server traffic), 7/16/64-bit payload lengths
- fragmentation reassembly (continuation frames), ping->pong,
  close handshake

No extensions, no TLS, no permessage-deflate — those belong to the
real library; this exists so the container without it still runs a
live websocket path end-to-end.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
import threading

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _accept_key(key: str) -> str:
    return base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()


class _BufferedConn:
    """Socket wrapper that serves leftover handshake bytes first — a
    pipelining client may send its first frames in the same segment as
    the upgrade request; those bytes must not be discarded."""

    def __init__(self, conn: socket.socket, initial: bytes = b""):
        self._conn = conn
        self._buf = initial

    def recv(self, n: int) -> bytes:
        if self._buf:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        return self._conn.recv(n)

    def sendall(self, data: bytes) -> None:
        self._conn.sendall(data)

    def close(self) -> None:
        self._conn.close()


def _recv_exact(conn, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def _read_frame(conn: socket.socket) -> tuple[int, bool, bytes]:
    """Returns (opcode, fin, unmasked payload)."""
    b1, b2 = _recv_exact(conn, 2)
    fin = bool(b1 & 0x80)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    length = b2 & 0x7F
    if length == 126:
        (length,) = struct.unpack(">H", _recv_exact(conn, 2))
    elif length == 127:
        (length,) = struct.unpack(">Q", _recv_exact(conn, 8))
    mask = _recv_exact(conn, 4) if masked else None
    payload = _recv_exact(conn, length) if length else b""
    if mask:
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return opcode, fin, payload


def _write_frame(conn: socket.socket, payload: bytes, opcode: int = 0x1, mask: bool = False) -> None:
    b1 = 0x80 | opcode  # FIN set — no outbound fragmentation
    header = bytes([b1])
    length = len(payload)
    mask_bit = 0x80 if mask else 0
    if length < 126:
        header += bytes([mask_bit | length])
    elif length < 1 << 16:
        header += bytes([mask_bit | 126]) + struct.pack(">H", length)
    else:
        header += bytes([mask_bit | 127]) + struct.pack(">Q", length)
    if mask:
        key = os.urandom(4)
        payload = bytes(c ^ key[i % 4] for i, c in enumerate(payload))
        header += key
    conn.sendall(header + payload)


class WSServer:
    """Accept websocket connections and hand every received text/binary
    message to ``on_message(str)``. One daemon thread per connection."""

    def __init__(self, host: str, port: int, on_message):
        self.on_message = on_message
        self.sock = socket.create_server((host, port))
        self.port = self.sock.getsockname()[1]
        self._stopped = False

    def start(self) -> "WSServer":
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
        try:
            # HTTP upgrade request, headers only
            req = b""
            while b"\r\n\r\n" not in req:
                chunk = conn.recv(4096)
                if not chunk:
                    return
                req += chunk
            head, _, leftover = req.partition(b"\r\n\r\n")
            key = ""
            for line in head.decode("latin-1").split("\r\n"):
                if line.lower().startswith("sec-websocket-key:"):
                    key = line.split(":", 1)[1].strip()
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
                ).encode()
            )
            # frame bytes pipelined behind the handshake are the start
            # of the frame stream, not garbage
            conn = _BufferedConn(conn, leftover)
            fragments: list[bytes] = []
            while True:
                opcode, fin, payload = _read_frame(conn)
                if opcode == 0x8:  # close
                    _write_frame(conn, payload, opcode=0x8)
                    return
                if opcode == 0x9:  # ping -> pong
                    _write_frame(conn, payload, opcode=0xA)
                    continue
                if opcode in (0x1, 0x2, 0x0):
                    fragments.append(payload)
                    if fin:
                        msg = b"".join(fragments)
                        fragments = []
                        self.on_message(msg.decode("utf-8", errors="replace"))
        except (ConnectionError, OSError):
            return
        finally:
            conn.close()

    def stop(self) -> None:
        self._stopped = True
        self.sock.close()


class WSClient:
    """Blocking client: connect, handshake, send text messages."""

    def __init__(self, host: str, port: int, path: str = "/", timeout: float = 10.0):
        self.conn = socket.create_connection((host, port), timeout=timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        self.conn.sendall(
            (
                f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.conn.recv(4096)
            if not chunk:
                raise ConnectionError("websocket handshake failed: peer closed")
            resp += chunk
        status = resp.split(b"\r\n", 1)[0].decode("latin-1")
        if "101" not in status:
            raise ConnectionError(f"websocket handshake rejected: {status}")
        # header NAME compares case-insensitively; the accept VALUE is
        # base64 and must match case-sensitively (RFC 6455 §4.1)
        want = _accept_key(key)
        got = None
        for line in resp.split(b"\r\n\r\n", 1)[0].decode("latin-1").split("\r\n"):
            name, _, value = line.partition(":")
            if name.strip().lower() == "sec-websocket-accept":
                got = value.strip()
        if got != want:
            raise ConnectionError(
                f"websocket handshake: bad Sec-WebSocket-Accept {got!r}"
            )

    def send(self, text: str) -> None:
        _write_frame(self.conn, text.encode(), opcode=0x1, mask=True)

    def close(self) -> None:
        try:
            _write_frame(self.conn, b"", opcode=0x8, mask=True)
        except OSError:
            pass
        self.conn.close()


def parse_ws_uri(uri: str) -> tuple[str, int, str]:
    """ws://host:port/path -> (host, port, path). No wss (no TLS here)."""
    if not uri.startswith("ws://"):
        raise ValueError(f"only ws:// URIs supported by the fallback client: {uri}")
    rest = uri[len("ws://"):]
    hostport, _, path = rest.partition("/")
    host, _, port = hostport.partition(":")
    return host, int(port or 80), "/" + path
