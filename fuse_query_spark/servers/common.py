"""Shared wire-server helpers."""

from __future__ import annotations


def first_line(e: Exception) -> str:
    """First NON-EMPTY line of an error — Spark ParseExceptions start
    with a blank line, which would otherwise serialize as an empty
    wire-protocol error message. Shared by the MySQL and ClickHouse
    fronts so both report errors identically."""
    for line in str(e).splitlines():
        if line.strip():
            return line.strip()
    return type(e).__name__
