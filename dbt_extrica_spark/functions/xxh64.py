"""Pure-Python XXH64 matching Spark's ``xxhash64`` SQL function.

Spark's ``xxhash64(col)`` hashes a string column's UTF-8 bytes with the
public XXH64 algorithm (Cyan4973/xxHash spec) at seed 42 and returns the
result as a SIGNED 64-bit value. This module reimplements that from the
published spec so oracle ground truth for xxhash64-derived operators
(simhash, seeded minhash permutations) can be computed WITHOUT Spark —
the oracle engine (DuckDB) has no xxhash64.

Parity with Spark is pinned by tests/test_xxh64.py across every tail-path
length (0, 1-7, 8-31, >=32 bytes) and against literal probes of the real
``xxhash64`` expression.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as an UNSIGNED 64-bit int (default seed 42 —
    Spark's)."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl(h ^ ((lane * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 as Spark emits it: two's-complement SIGNED 64-bit."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
