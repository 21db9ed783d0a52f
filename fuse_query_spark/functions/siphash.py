"""Byte-exact SipHash-1-3 matching the reference's ``siphash`` output.

The reference hashes each value with a fresh Rust ``DefaultHasher``
(scalars/hashes/siphash.rs:69-73 via vec_hash,
common/datavalues/src/arrays/ops/vec_hash.rs:42-49). Rust's
``DefaultHasher::new()`` is SipHash-1-3 with a zero key, and the byte
stream fed to it is defined by ``std::hash::Hash``:

- integers: little-endian bytes of the value at its native width
  (``write_u64`` etc.); the reference's numbers() column is UInt64.
- ``str``: the UTF-8 bytes followed by a single ``0xff`` terminator.
- floats: hashed via ``to_bits`` (IEEE-754 bit pattern, LE bytes).
- bool: one byte 0/1.

SipHash itself is public (Aumasson & Bernstein, 2012); the 1-3 round
variant only changes the compression/finalization round counts from
the canonical 2-4. The implementation below is validated against the
published SipHash-2-4 test vector (empty input, key 0x0f0e..00) in
tests — the round function is shared, so matching 2-4 exercises the
same code paths 1-3 uses.

This is the parity path, NOT the hot path: ``siphash`` in the dialect
maps to Spark's JVM-side ``xxhash64`` (stable 64-bit hash, ~100x
faster). Use ``siphash_exact`` when byte-for-byte agreement with the
reference engine's output is required.
"""

from __future__ import annotations

import pandas as pd

_MASK = (1 << 64) - 1


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _MASK


def _sipround(v0: int, v1: int, v2: int, v3: int) -> tuple[int, int, int, int]:
    v0 = (v0 + v1) & _MASK
    v1 = _rotl(v1, 13) ^ v0
    v0 = _rotl(v0, 32)
    v2 = (v2 + v3) & _MASK
    v3 = _rotl(v3, 16) ^ v2
    v0 = (v0 + v3) & _MASK
    v3 = _rotl(v3, 21) ^ v0
    v2 = (v2 + v1) & _MASK
    v1 = _rotl(v1, 17) ^ v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def siphash(data: bytes, k0: int = 0, k1: int = 0, c: int = 1, d: int = 3) -> int:
    """SipHash-c-d of ``data`` under key (k0, k1); defaults to the
    1-3 zero-key configuration of Rust's DefaultHasher."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573
    n = len(data)
    end = n - (n % 8)
    for off in range(0, end, 8):
        m = int.from_bytes(data[off : off + 8], "little")
        v3 ^= m
        for _ in range(c):
            v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
    b = (n & 0xFF) << 56 | int.from_bytes(data[end:], "little")
    v3 ^= b
    for _ in range(c):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= b
    v2 ^= 0xFF
    for _ in range(d):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _MASK


def rust_hash_u64(v: int) -> int:
    """DefaultHasher result for a Rust u64/i64 (write_u64: 8 LE bytes)."""
    return siphash((v & _MASK).to_bytes(8, "little"))


def rust_hash_str(s: str) -> int:
    """DefaultHasher result for a Rust &str (bytes + 0xff terminator)."""
    return siphash(s.encode("utf-8") + b"\xff")


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _siphash_exact_series(col: pd.Series) -> pd.Series:
    """Pandas-UDF kernel: UInt64-domain SipHash-1-3 per value, returned
    as Spark LongType (the UInt64 bit pattern, two's complement — same
    convention as the LongType mapping of the reference's UInt64)."""
    if col.dtype == object:  # strings
        out = [None if v is None else _to_signed64(rust_hash_str(v)) for v in col]
    else:
        out = [
            None if pd.isna(v) else _to_signed64(rust_hash_u64(int(v)))
            for v in col
        ]
    return pd.Series(out, dtype="Int64")


def register_siphash(spark) -> None:
    """Register ``siphash_exact`` (long input) and
    ``siphash_exact_str`` (string input) as pandas UDFs."""
    from pyspark.sql.functions import pandas_udf

    spark.udf.register("siphash_exact", pandas_udf(_siphash_exact_series, "long"))
    spark.udf.register("siphash_exact_str", pandas_udf(_siphash_exact_series, "long"))
