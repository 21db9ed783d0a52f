"""Shared wire-server helpers."""

from __future__ import annotations

import socketserver


class ReusableThreadingTCPServer(socketserver.ThreadingTCPServer):
    """ThreadingTCPServer with SO_REUSEADDR, set on THIS subclass only.

    Both wire servers previously flipped the attribute on the shared
    socketserver.ThreadingTCPServer base class — a process-global side
    effect on every other TCP server in the process (ADVICE r4). The
    subclass scopes it.
    """

    allow_reuse_address = True
    daemon_threads = True


def first_line(e: Exception) -> str:
    """First NON-EMPTY line of an error — Spark ParseExceptions start
    with a blank line, which would otherwise serialize as an empty
    wire-protocol error message. Shared by the MySQL and ClickHouse
    fronts so both report errors identically."""
    for line in str(e).splitlines():
        if line.strip():
            return line.strip()
    return type(e).__name__
