"""Minimal RFC 6455 WebSocket client for the request protocol.

The reference's cli crate talks to the server over WebSocket
(server/src/networking.rs:34-95); this module gives the Python CLI the
same transport: connect, send one TEXT message per request batch,
receive one TEXT message per output batch. Dependency-free — the
server side lives in server.py (serve_ws); both share the framing
rules (client frames masked, server frames not).
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
from typing import Optional

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class WsClient:
    """Blocking WebSocket client: ``send_text`` / ``recv_text`` /
    ``close``. Control frames (ping) are answered transparently."""

    def __init__(self, host: str, port: int, path: str = "/"):
        self.sock = socket.create_connection((host, port))
        self._rfile = self.sock.makefile("rb")
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\n"
                f"Host: {host}:{port}\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        status = self._rfile.readline()
        if b"101" not in status:
            raise ConnectionError(f"handshake rejected: {status!r}")
        accept = None
        while True:
            line = self._rfile.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            name, _, value = line.decode("latin1").partition(":")
            if name.strip().lower() == "sec-websocket-accept":
                accept = value.strip()
        expect = base64.b64encode(
            hashlib.sha1((key + WS_GUID).encode()).digest()
        ).decode()
        if accept != expect:
            raise ConnectionError("bad Sec-WebSocket-Accept")

    # -- framing ---------------------------------------------------
    def _send_frame(self, payload: bytes, opcode: int, fin: bool = True) -> None:
        mask = os.urandom(4)
        head = bytes([(0x80 if fin else 0) | opcode])
        n = len(payload)
        if n < 126:
            head += bytes([0x80 | n])
        elif n < 1 << 16:
            head += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            head += bytes([0x80 | 127]) + struct.pack(">Q", n)
        if payload:
            import numpy as np

            data = np.frombuffer(payload, dtype=np.uint8)
            keyb = np.frombuffer(
                (mask * ((n + 3) // 4))[:n], dtype=np.uint8
            )
            payload = (data ^ keyb).tobytes()
        self.sock.sendall(head + mask + payload)

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._rfile.read(n - len(buf))
            if not chunk:
                raise ConnectionError("connection closed mid-frame")
            buf += chunk
        return buf

    def _read_frame(self) -> tuple[bool, int, bytes]:
        hdr = self._read_exact(2)
        fin = bool(hdr[0] & 0x80)
        opcode = hdr[0] & 0x0F
        length = hdr[1] & 0x7F
        if length == 126:
            (length,) = struct.unpack(">H", self._read_exact(2))
        elif length == 127:
            (length,) = struct.unpack(">Q", self._read_exact(8))
        # Server frames are unmasked (RFC 6455 §5.1).
        payload = self._read_exact(length) if length else b""
        return fin, opcode, payload

    # -- protocol --------------------------------------------------
    def send_text(self, text: str) -> None:
        self._send_frame(text.encode("utf-8"), opcode=0x1)

    def recv_text(self) -> Optional[str]:
        """Next TEXT message, or None on clean close. Pings are
        answered; fragments reassembled."""

        message = b""
        while True:
            fin, opcode, payload = self._read_frame()
            if opcode == 0x8:
                return None
            if opcode == 0x9:
                self._send_frame(payload, opcode=0xA)
                continue
            if opcode == 0xA:
                continue
            message += payload
            if fin:
                return message.decode("utf-8")

    def close(self) -> None:
        try:
            self._send_frame(b"", opcode=0x8)
        except OSError:
            pass
        self.sock.close()
