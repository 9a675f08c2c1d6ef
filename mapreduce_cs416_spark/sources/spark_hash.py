"""Pure-Python replay of Spark's ``xxhash64(...)`` expression.

Why this exists: the manifest table's default layout hashes key
columns through ``pmod(xxhash64(keys), n_buckets)`` (see
``manifest.default_partition_expr``).  ``read_table`` replays that
expression with a tiny Spark job to turn key-equality predicates into
bucket pruning — but PySpark 4's Python DataSource API runs
``pushFilters``/``partitions()`` in a driver-side Python worker with
NO SparkSession, so the native ``spark.read.format("manifest")``
source (manifest_source.py) cannot launch jobs during planning.  This
module computes the same 64-bit hashes JVM-free.

xxHash64 is a public, fully specified algorithm (Yann Collet,
github.com/Cyan4973/xxHash); Spark's ``XxHash64`` expression applies
it per column with the running hash as the seed (initial seed 42) and
a documented per-type lane encoding (sql/catalyst HashExpression):
integral types hash as their 4- or 8-byte two's-complement lanes,
strings/binary as their UTF-8 bytes, floats/doubles as their IEEE
bits with -0.0 normalized to 0.0, dates as days-since-epoch ints,
and NULL columns leave the running hash unchanged.

Correctness is pinned empirically, not by trust:
``tests/test_manifest_source.py`` property-tests every supported type
against ``F.xxhash64`` on randomized values.  Anything not supported
here (timestamps — their lane depends on the session timezone —
arrays, maps, wide decimals) makes :func:`bucket_of` raise, and the
caller degrades to stats-only pruning; a wrong prune is never an
option because unsupported inputs refuse loudly.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Reference xxHash64 over ``data`` (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            lanes = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _avalanche(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _hash_int(value: int, seed: int) -> int:
    # Spark XXH64.hashInt == xxh64 over the 4-byte LE two's complement
    return xxh64(struct.pack("<i", value), seed)


def _hash_long(value: int, seed: int) -> int:
    return xxh64(struct.pack("<q", value), seed)


class UnsupportedLane(ValueError):
    """Raised when a (value, Spark type) pair has no replayable lane —
    callers must treat this as 'cannot prune', never guess."""


def hash_value(value, type_name: str, seed: int, dtype=None) -> int:
    """One column's contribution: the new running hash given the old
    one as ``seed``.  ``type_name`` is ``DataType.typeName()``;
    ``dtype`` carries the full type for decimals.  NULL handling
    (skip) is the CALLER's job — Spark skips the column entirely."""
    import datetime
    import decimal

    if type_name == "boolean":
        return _hash_int(1 if value else 0, seed)
    if type_name in ("byte", "short", "integer"):
        return _hash_int(int(value), seed)
    if type_name == "long":
        return _hash_long(int(value), seed)
    if type_name == "date":
        if isinstance(value, datetime.date) and not isinstance(value, datetime.datetime):
            days = (value - datetime.date(1970, 1, 1)).days
        elif isinstance(value, str):
            d = datetime.date.fromisoformat(value.strip())
            days = (d - datetime.date(1970, 1, 1)).days
        else:
            raise UnsupportedLane(f"date lane from {type(value).__name__}")
        return _hash_int(days, seed)
    if type_name == "float":
        v = float(value)
        if v == 0.0:
            v = 0.0  # -0.0f normalizes
        return _hash_int(struct.unpack("<i", struct.pack("<f", v))[0], seed)
    if type_name == "double":
        v = float(value)
        if v == 0.0:
            v = 0.0
        return _hash_long(struct.unpack("<q", struct.pack("<d", v))[0], seed)
    if type_name == "string":
        if not isinstance(value, str):
            raise UnsupportedLane(f"string lane from {type(value).__name__}")
        return xxh64(value.encode("utf-8"), seed)
    if type_name == "binary":
        return xxh64(bytes(value), seed)
    if type_name == "decimal":
        if dtype is None or dtype.precision > 18:
            # wide decimals hash their BigInteger byte array; the
            # changelog faces never key on them — refuse, don't guess
            raise UnsupportedLane("decimal precision > 18")
        if isinstance(value, float):
            # Spark rounds a double→decimal cast HALF_UP; Python's
            # Decimal(float) carries binary noise — refuse rather
            # than risk a one-ulp bucket mismatch
            raise UnsupportedLane("float literal on decimal column")
        unscaled = int(
            (decimal.Decimal(value)).scaleb(dtype.scale).to_integral_value()
        )
        return _hash_long(unscaled, seed)
    # timestamps intentionally unsupported: their long lane is
    # session-timezone-dependent micros — a replay here could prune
    # wrongly across timezones
    raise UnsupportedLane(type_name)


def xxhash64_row(values, fields) -> int:
    """Spark's ``xxhash64(col1, col2, ...)`` over one row of typed
    values: running hash seeded at 42, NULLs skipped, SIGNED 64-bit
    result (what the SQL expression returns)."""
    h = 42
    for value, field in zip(values, fields):
        if value is None:
            continue
        h = hash_value(value, field.dataType.typeName(), h, field.dataType)
    return _signed(h)


def bucket_of(values, fields, n_buckets: int) -> int:
    """``pmod(xxhash64(keys), n) `` for one key combination — the
    default-layout bucket id."""
    return xxhash64_row(values, fields) % n_buckets


# --- vectorized lanes (numpy uint64 wraparound arithmetic) -------------
#
# The scalar path above replays ≤64 pruning combos; the native
# streaming SINK (manifest_sink.py) has to bucket EVERY ROW of every
# micro-batch, where a per-row Python loop would be the classic
# slow path. These vector twins compute the identical chained hash
# over whole numpy arrays; null positions carry the running seed
# through unchanged, exactly Spark's skip. Property-pinned against
# F.xxhash64 alongside the scalar tests.

def _v_rotl(x, r: int):
    import numpy as np

    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _v_avalanche(h):
    import numpy as np

    u = np.uint64
    h = h ^ (h >> u(33))
    h = h * u(_P2)
    h = h ^ (h >> u(29))
    h = h * u(_P3)
    return h ^ (h >> u(32))


def _v_hash_long(lane_u64, seed_u64):
    import numpy as np

    u = np.uint64
    h = seed_u64 + u((_P5 + 8) & _M)
    h = h ^ (_v_rotl(lane_u64 * u(_P2), 31) * u(_P1))
    h = _v_rotl(h, 27) * u(_P1) + u(_P4)
    return _v_avalanche(h)


def _v_hash_int(lane_u32, seed_u64):
    import numpy as np

    u = np.uint64
    h = seed_u64 + u((_P5 + 4) & _M)
    h = h ^ (lane_u32.astype(np.uint64) * u(_P1))
    h = _v_rotl(h, 23) * u(_P2) + u(_P3)
    return _v_avalanche(h)


VECTOR_LANES = ("boolean", "byte", "short", "integer", "date",
                "long", "float", "double")


def _lane_arrays(values, type_name: str):
    """(lane, width) for one column: a uint32 ('int' lanes) or uint64
    ('long' lanes) numpy array of the exact bit patterns Spark hashes.
    ``values`` is a numpy array with nulls already replaced by any
    placeholder (masked out by the caller)."""
    import numpy as np

    if type_name in ("byte", "short", "integer", "date"):
        return values.astype(np.int32).view(np.uint32), 32
    if type_name == "boolean":
        return values.astype(np.int32).view(np.uint32), 32
    if type_name == "long":
        return values.astype(np.int64).view(np.uint64), 64
    if type_name == "float":
        f = values.astype(np.float32) + np.float32(0.0)  # -0.0 → +0.0
        return f.view(np.uint32), 32
    if type_name == "double":
        d = values.astype(np.float64) + 0.0
        return d.view(np.uint64), 64
    raise UnsupportedLane(type_name)


def xxhash64_vector(columns, fields):
    """Vector twin of :func:`xxhash64_row`: ``columns`` is a list of
    ``(values, valid)`` pairs (numpy value array — null slots may hold
    any placeholder — and a boolean validity array or None), one per
    field, all the same length. Returns the SIGNED int64 hash array.
    Only :data:`VECTOR_LANES` types are supported — callers fall back
    to the scalar path (or refuse) for strings and decimals."""
    import numpy as np

    n = len(columns[0][0]) if columns else 0
    h = np.full(n, 42, dtype=np.uint64)
    for (values, valid), field in zip(columns, fields):
        lane, width = _lane_arrays(values, field.dataType.typeName())
        nh = _v_hash_int(lane, h) if width == 32 else _v_hash_long(lane, h)
        h = np.where(valid, nh, h) if valid is not None else nh
    return h.view(np.int64)


def bucket_vector(columns, fields, n_buckets: int):
    """``pmod(xxhash64(keys), n)`` over whole arrays — the native
    sink's per-row bucketing. numpy's % on signed int64 is already
    the non-negative (floored) modulus pmod computes."""
    return xxhash64_vector(columns, fields) % n_buckets
