"""Driver-side xxHash64 matching Spark's ``F.xxhash64`` bit-for-bit.

Why: the manifest's bucket index is keyed by
``pmod(xxhash64(*key_cols), n_buckets)`` (operators/merge.bucket_expr,
computed JVM-side during writes). A POINT LOOKUP (``LakeTable.
read_key``) must evaluate the same function for ONE key — launching a
Spark job for that costs ~100 ms of scheduler overhead per call, the
wrong shape for a serving path. This module evaluates it in pure
Python in microseconds; a test pins it against ``F.xxhash64`` across
types and multi-column chains.

The algorithm is public: xxHash (Yann Collet, BSD) with Spark's fixed
seed 42 and Spark's per-type mapping (int-family → 4-byte path for
byte/short/int, 8-byte path for long/timestamp-micros; strings → UTF-8
bytes; columns chain left-to-right with the running hash as the next
seed; NULL leaves the hash unchanged).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _hash_int(value: int, seed: int) -> int:
    """4-byte input path (Spark ByteType/ShortType/IntegerType)."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def _hash_long(value: int, seed: int) -> int:
    """8-byte input path (Spark LongType, timestamp micros)."""
    h = (seed + _P5 + 8) & _MASK
    h ^= (_rotl((value & _MASK) * _P2 & _MASK, 31) * _P1) & _MASK
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def _hash_bytes(data: bytes, seed: int) -> int:
    """Full xxHash64 over a byte string, little-endian word reads —
    Spark's hashUnsafeBytes path for StringType/BinaryType."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= length - 32:
            for off, acc in ((0, 1), (8, 2), (16, 3), (24, 4)):
                k = int.from_bytes(data[i + off:i + off + 8], "little")
                if acc == 1:
                    v1 = (_rotl((v1 + k * _P2) & _MASK, 31) * _P1) & _MASK
                elif acc == 2:
                    v2 = (_rotl((v2 + k * _P2) & _MASK, 31) * _P1) & _MASK
                elif acc == 3:
                    v3 = (_rotl((v3 + k * _P2) & _MASK, 31) * _P1) & _MASK
                else:
                    v4 = (_rotl((v4 + k * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + length) & _MASK
    while i <= length - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= length - 4:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < length:
        h ^= ((data[i] & 0xFF) * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = SPARK_XXHASH64_SEED) -> int:
    """``F.xxhash64(c1, c2, ...)`` for concrete Python values: ints are
    hashed on Spark's 8-byte LongType path, strings as UTF-8 bytes,
    bytes as-is, bools as ints; None leaves the running hash unchanged
    (Spark's null semantics). Returns the SIGNED 64-bit value Spark
    returns. Pass ``("int", v)`` to force the 4-byte IntegerType path
    when a key column is int/short/byte typed."""
    h = seed & _MASK
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "int":
            h = _hash_int(int(v[1]), h)
        elif isinstance(v, bool):
            h = _hash_int(int(v), h)
        elif isinstance(v, int):
            h = _hash_long(v, h)
        elif isinstance(v, str):
            h = _hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = _hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported key type for driver-side hash: {type(v)}")
    return _to_signed(h)


def bucket_of(values_with_types: list, n_buckets: int) -> int:
    """Driver-side ``pmod(xxhash64(*keys), n_buckets)`` — the bucket a
    key lands in, computed without a Spark job. ``values_with_types``
    holds plain values, with int-family columns (IntegerType and
    narrower) wrapped as ``("int", v)`` by the caller (LakeTable knows
    the schema)."""
    return xxhash64(*values_with_types) % n_buckets
