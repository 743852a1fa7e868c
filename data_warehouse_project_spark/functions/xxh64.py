"""Spark-compatible XXH64: the exact hash ``F.xxhash64`` computes,
reimplemented in pure Python so DRIVER-side planners (the native data
source's ``partitions()``, which runs during Spark's own planning and
cannot launch jobs) can probe bloom sidecars built by executor-side
``xxhash64``.

Spark semantics reproduced here (catalyst XxHash64 / XXH64.java):
- multi-argument hashing CHAINS the running hash as the seed:
  ``xxhash64(a, b) = step(b, step(a, 42))``;
- integral types int/short/byte hash their 32-bit pattern via
  ``hashInt``; long via ``hashLong``; strings hash their UTF-8 bytes
  via the standard XXH64 byte stream;
- NULL children leave the running hash unchanged (the bloom layer
  never probes NULL, so this path is unused but kept for fidelity).

Pinned bit-for-bit against ``F.xxhash64`` in
tests/test_txbatch_bloom.py over negatives, unicode, empty strings and
the salt-chained second hash.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong — one 8-byte block, Spark's long path."""
    v = value & _M  # two's complement view of a (possibly negative) long
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt — Spark's int/short/byte path (32-bit pattern)."""
    v = value & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte stream — Spark's string (UTF-8) path."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M

        def lane(v: int, w: int) -> int:
            return (_rotl((v + w * _P2) & _M, 31) * _P1) & _M

        while off + 32 <= n:
            v1 = lane(v1, int.from_bytes(data[off:off + 8], "little"))
            v2 = lane(v2, int.from_bytes(data[off + 8:off + 16], "little"))
            v3 = lane(v3, int.from_bytes(data[off + 16:off + 24], "little"))
            v4 = lane(v4, int.from_bytes(data[off + 24:off + 32], "little"))
            off += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        w = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        w = int.from_bytes(data[off:off + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_step(value, spark_type: str, seed: int) -> int:
    """One child's contribution with the running hash as seed —
    chain these for multi-argument ``xxhash64``. ``spark_type`` is the
    Spark simple type name from a schema JSON. Unsigned result."""
    if value is None:
        return seed & _M
    if spark_type == "long":
        return hash_long(int(value), seed)
    if spark_type in ("integer", "short", "byte"):
        return hash_int(int(value), seed)
    if spark_type == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    raise TypeError(f"xxh64: unsupported Spark type {spark_type!r}")


def spark_xxhash64(value, spark_type: str) -> int:
    """``F.xxhash64(col)`` of one value — SIGNED, like Spark's."""
    return _to_signed(spark_xxhash64_step(value, spark_type, SPARK_SEED))


def spark_xxhash64_salted(value, spark_type: str, salt: int) -> int:
    """``F.xxhash64(col, lit(salt))`` with an int32 salt — the bloom
    layer's second hash. SIGNED, like Spark's."""
    h = spark_xxhash64_step(value, spark_type, SPARK_SEED)
    return _to_signed(hash_int(salt, h))
