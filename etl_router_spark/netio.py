"""Shared blocking-socket helpers for the hermetic wire-protocol
gates (gRPC/HTTP2, Kafka, MongoDB) — one read-exactly loop instead of
one per protocol module."""

from __future__ import annotations

import socket


def recv_exact(conn: socket.socket, n: int) -> bytes:
    """Read exactly ``n`` bytes or raise ConnectionError on EOF."""
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return buf
