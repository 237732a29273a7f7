"""Spec-compliant Iceberg partition transforms (bucket/truncate/
temporal) shared by the writer (partition tuple derivation) and the
reader (manifest-entry pruning).

Why this exists: Iceberg's ``bucket[N]`` is defined as
``(murmur3_x86_32(single_value_binary(v), seed=0) & Int.MAX) % N``
over the value's *single-value binary serialization* (int/long/date/
timestamp as little-endian 8-byte longs, strings as UTF-8 bytes —
Iceberg spec, Appendix B). Spark's ``F.hash`` is also murmur3 but with
seed 42 and Spark's own per-type mixing, so partition tuples computed
with it are internally consistent yet NOT what an external Iceberg
reader (Spark runtime, Trino, pyiceberg) expects — such a reader would
prune on wrong bucket values and silently drop rows. This module
implements the spec hash (vectorized over Arrow batches for the write
path) so the written metadata is interoperable.

Reference behavior: ``daft/io/iceberg/_iceberg.py:130`` plans scans
through pyiceberg with pushed partition filters; the transform
definitions themselves are the public Iceberg spec
(https://iceberg.apache.org/spec/#partition-transforms).
"""

from __future__ import annotations

import datetime

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public domain algorithm, Austin Appleby) —
    returns the SIGNED 32-bit hash, matching the Iceberg spec's
    published test vectors."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n:]
    k = 0
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def murmur3_32_long_vec(vals: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32(seed=0) over int64 values serialized
    as little-endian 8-byte blocks — the Iceberg single-value form for
    int/long/date/time/timestamp. Returns signed int32."""
    with np.errstate(over="ignore"):
        v = vals.astype(np.uint64)
        k1 = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k2 = (v >> np.uint64(32)).astype(np.uint32)
        h = np.zeros(len(v), dtype=np.uint32)
        for k in (k1, k2):
            k = k * _C1
            k = _rotl32(k, 15)
            k = k * _C2
            h = h ^ k
            h = _rotl32(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)  # length
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h.view(np.int32)


_EPOCH = datetime.date(1970, 1, 1)


def _to_long_form(v) -> int:
    """The long a value hashes as (int/long/date/timestamp variants)."""
    if isinstance(v, bool):
        raise NotImplementedError("bucket on boolean is not in the Iceberg spec")
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        # microseconds from epoch (UTC when aware; as-is when naive).
        # Exact integer arithmetic: total_seconds() is a double whose
        # ~2^-24 s resolution at epoch-scale magnitudes truncated some
        # values one microsecond off — which would flip bucket hashes
        # and stats bounds.
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        d = v - datetime.datetime(1970, 1, 1)
        return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
    if isinstance(v, datetime.date):
        return (v - _EPOCH).days
    raise TypeError(f"no Iceberg long form for {type(v).__name__}")


def bucket_value(v, n: int) -> int | None:
    """``bucket[n]`` of one Python value per the Iceberg spec (None
    stays None — null partitions)."""
    if v is None:
        return None
    if isinstance(v, str):
        h = murmur3_32(v.encode("utf-8"))
    elif isinstance(v, (bytes, bytearray)):
        h = murmur3_32(bytes(v))
    else:
        h = murmur3_32(
            int(_to_long_form(v)).to_bytes(8, "little", signed=True)
        )
    return (h & 0x7FFFFFFF) % n


def day_value(v) -> int:
    """``day(v)``: days from epoch (dates/timestamps; timestamps in
    UTC for aware values, field-wise for naive ones)."""
    if isinstance(v, str):
        v = datetime.date.fromisoformat(v[:10])
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc)
        v = v.date()
    return (v - _EPOCH).days


def month_value(v) -> int:
    if isinstance(v, str):
        v = datetime.date.fromisoformat(v[:10])
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc)
        v = v.date()
    return (v.year - 1970) * 12 + v.month - 1


def year_value(v) -> int:
    if isinstance(v, str):
        v = datetime.date.fromisoformat(v[:10])
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc)
        v = v.date()
    return v.year - 1970


def truncate_value(v, width: int):
    if v is None:
        return None
    if isinstance(v, int):
        return v - (v % width)
    if isinstance(v, str):
        return v[:width]
    raise NotImplementedError(f"truncate of {type(v).__name__}")


# ---------------------------------------------------------------------------
# manifest-entry pruning

_INCOMPARABLE = object()


def _identity_lit(pv, val):
    """Pushed literal normalized to the manifest's stored form for an
    identity partition value ``pv`` — or ``_INCOMPARABLE`` when
    exclusion can't be proven. Avro passes Iceberg date/timestamp
    logical types through as raw ints, so externally-written tables
    store days / epoch-micros where Catalyst pushes datetime.date /
    datetime literals; ``int == date`` is silently False in Python
    (no TypeError), which would prune every matching file."""
    if isinstance(pv, bool) or isinstance(val, bool):
        return val if isinstance(pv, bool) and isinstance(val, bool) else _INCOMPARABLE
    if isinstance(pv, int):
        if isinstance(val, (datetime.date, datetime.datetime)):
            try:
                return _to_long_form(val)  # date -> days, ts -> micros
            except (TypeError, NotImplementedError):
                return _INCOMPARABLE
        return val if isinstance(val, (int, float)) else _INCOMPARABLE
    if isinstance(pv, float):
        return val if isinstance(val, (int, float)) else _INCOMPARABLE
    if isinstance(pv, str):
        return val if isinstance(val, str) else _INCOMPARABLE
    if isinstance(pv, datetime.datetime):
        return val if isinstance(val, datetime.datetime) else _INCOMPARABLE
    if isinstance(pv, datetime.date):
        if isinstance(val, datetime.date) and not isinstance(val, datetime.datetime):
            return val
        return _INCOMPARABLE
    if isinstance(pv, (bytes, bytearray)):
        return val if isinstance(val, (bytes, bytearray)) else _INCOMPARABLE
    return _INCOMPARABLE


def transform_admits(transform: str, pv, op: str, val) -> bool:
    """Could a row inside a file whose partition value for this
    transform is ``pv`` satisfy ``col <op> val``? Conservative: True
    whenever pruning can't be PROVEN sound (unknown op/transform,
    unexpected literal type). ``op`` in =, ==, !=, <, <=, >, >=, in.

    Soundness notes per transform:
    - identity: direct comparison; a null partition value means every
      row's column is null, which no comparison operator satisfies.
    - bucket[N]: only equality prunes (the bucket of the literal must
      match); ranges span buckets arbitrarily.
    - truncate[W] on ints: the file covers [pv, pv+W).
    - truncate[W] on strings: the file covers strings with prefix pv;
      v < val possible iff pv < val, v > val possible iff pv >= val[:W]
      (if pv sorts before the truncated literal, every prefixed value
      sorts before val).
    - day/month/year: monotonic int transforms — boundary values share
      a partition, so < / > keep the literal's own partition.
    """
    try:
        if op == "==":
            op = "="
        if op in ("isnull", "isnotnull"):
            # every Iceberg transform maps null -> null and (for the
            # transforms we support) non-null -> non-null, so the
            # partition value's null-ness decides for ANY transform
            return (pv is None) if op == "isnull" else (pv is not None)
        if transform == "identity":
            if pv is None:
                return op == "!="
            if op == "!=":
                return True  # other rows in the file may differ
            if op == "in":
                norm = [_identity_lit(pv, x) for x in val]
                if any(x is _INCOMPARABLE for x in norm):
                    return True  # can't prove exclusion
                return pv in norm
            val = _identity_lit(pv, val)
            if val is _INCOMPARABLE:
                return True  # can't prove exclusion
            if op == "=":
                return pv == val
            if op == "<":
                return pv < val
            if op == "<=":
                return pv <= val
            if op == ">":
                return pv > val
            if op == ">=":
                return pv >= val
            return True
        if transform.startswith("bucket["):
            n = int(transform[7:-1])
            if pv is None:
                return op == "!="
            if op == "=":
                return bucket_value(val, n) == pv
            if op == "in":
                return any(bucket_value(x, n) == pv for x in val)
            return True
        if transform.startswith("truncate["):
            w = int(transform[9:-1])
            if pv is None:
                return op == "!="
            if isinstance(pv, int):
                lo, hi = pv, pv + w - 1  # inclusive value range
                if op == "=":
                    return lo <= val <= hi
                if op == "in":
                    return any(lo <= x <= hi for x in val)
                if op == "<":
                    return lo < val
                if op == "<=":
                    return lo <= val
                if op == ">":
                    return hi > val
                if op == ">=":
                    return hi >= val
                return True
            if isinstance(pv, str):
                tval = val[:w] if isinstance(val, str) else val
                if op == "=":
                    return tval == pv
                if op == "in":
                    return any(x[:w] == pv for x in val)
                if op == "<":
                    return pv < val
                if op == "<=":
                    return pv <= val
                if op in (">", ">="):
                    return pv >= tval
                return True
            return True
        if transform in ("day", "month", "year"):
            fn = {"day": day_value, "month": month_value, "year": year_value}[
                transform
            ]
            if pv is None:
                return op == "!="
            if op == "=":
                return pv == fn(val)
            if op == "in":
                return any(pv == fn(x) for x in val)
            if op == "<":
                return pv <= fn(val)
            if op == "<=":
                return pv <= fn(val)
            if op == ">":
                return pv >= fn(val)
            if op == ">=":
                return pv >= fn(val)
            return True
        return True
    except (TypeError, ValueError, NotImplementedError):
        return True


def entry_matches(
    partition: dict,
    spec_fields: list[dict],
    source_names: dict[int, str],
    filters: list[tuple],
) -> bool:
    """AND-semantics pruning of one manifest entry: False only when
    some filter PROVABLY excludes every row of the file."""
    for col, op, val in filters:
        for f in spec_fields:
            if source_names.get(f["source-id"]) != col:
                continue
            if f["name"] not in partition:
                continue
            if not transform_admits(f["transform"], partition[f["name"]], op, val):
                return False
    return True


# ---------------------------------------------------------------------------
# single-value serialization (Iceberg spec, Appendix D "Single-value
# serialization": binary form used for lower_bounds / upper_bounds in
# manifest data_file entries) + file-level stats pruning

_TRUNC_WIDTH = 16


def single_value_bytes(v, ice_type: str) -> bytes | None:
    """Binary single-value form per the spec: booleans 0x00/0x01, ints
    4-byte little-endian, longs 8-byte little-endian, float/double IEEE
    little-endian, date = 4-byte LE days from epoch, timestamp[tz] =
    8-byte LE epoch micros, string = UTF-8 bytes, binary as-is.
    Returns None for types this writer doesn't bound (decimal, uuid,
    fixed) or unconvertible values — an absent bound never prunes."""
    import struct

    if v is None:
        return None
    try:
        if ice_type == "boolean":
            return b"\x01" if v else b"\x00"
        if ice_type == "int":
            return struct.pack("<i", int(v))
        if ice_type == "long":
            return struct.pack("<q", int(v))
        if ice_type == "float":
            return struct.pack("<f", float(v))
        if ice_type == "double":
            return struct.pack("<d", float(v))
        if ice_type == "date":
            if isinstance(v, int):
                return struct.pack("<i", v)
            if isinstance(v, datetime.datetime):
                v = v.date()
            return struct.pack("<i", (v - _EPOCH).days)
        if ice_type in ("timestamp", "timestamptz"):
            if isinstance(v, int):
                return struct.pack("<q", v)
            return struct.pack("<q", _to_long_form(v))
        if ice_type == "string":
            return v.encode("utf-8") if isinstance(v, str) else None
        if ice_type == "binary":
            return bytes(v) if isinstance(v, (bytes, bytearray)) else None
    except (TypeError, ValueError, OverflowError):
        return None
    return None


def single_value_decode(b, ice_type: str):
    """Inverse of single_value_bytes (None on size/type mismatch —
    callers treat an undecodable bound as absent)."""
    import struct

    if b is None:
        return None
    b = bytes(b)
    try:
        if ice_type == "boolean":
            return b != b"\x00"
        if ice_type == "int":
            return struct.unpack("<i", b)[0]
        if ice_type == "long":
            return struct.unpack("<q", b)[0]
        if ice_type == "float":
            return struct.unpack("<f", b)[0]
        if ice_type == "double":
            return struct.unpack("<d", b)[0]
        if ice_type == "date":
            return _EPOCH + datetime.timedelta(days=struct.unpack("<i", b)[0])
        if ice_type in ("timestamp", "timestamptz"):
            us = struct.unpack("<q", b)[0]
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
        if ice_type == "string":
            return b.decode("utf-8", errors="replace")
        if ice_type == "binary":
            return b
    except (struct.error, ValueError, OverflowError):
        return None
    return None


def truncate_lower(v):
    """Lower-bound truncation: a prefix of the minimum is still a valid
    lower bound (Iceberg UnicodeUtil.truncateStringMin /
    BinaryUtil.truncateBinaryMin)."""
    if isinstance(v, str):
        return v[:_TRUNC_WIDTH]
    if isinstance(v, (bytes, bytearray)):
        return bytes(v[:_TRUNC_WIDTH])
    return v


def truncate_upper(v):
    """Upper-bound truncation: truncate, then increment the last code
    point / byte so the result sorts >= every value sharing the prefix
    (UnicodeUtil.truncateStringMax / BinaryUtil.truncateBinaryMax).
    None when no increment is possible — the caller omits the bound."""
    if isinstance(v, str):
        if len(v) <= _TRUNC_WIDTH:
            return v
        t = v[:_TRUNC_WIDTH]
        for i in range(len(t) - 1, -1, -1):
            cp = ord(t[i])
            if cp < 0x10FFFF:
                nxt = cp + 1
                if 0xD800 <= nxt <= 0xDFFF:  # skip the surrogate gap
                    nxt = 0xE000
                return t[:i] + chr(nxt)
        return None
    if isinstance(v, (bytes, bytearray)):
        v = bytes(v)
        if len(v) <= _TRUNC_WIDTH:
            return v
        t = bytearray(v[:_TRUNC_WIDTH])
        for i in range(len(t) - 1, -1, -1):
            if t[i] < 0xFF:
                t[i] += 1
                return bytes(t[: i + 1])
        return None
    return v


def stats_admit(lower, upper, op: str, val) -> bool:
    """Could any row of a file whose column spans [lower, upper]
    satisfy ``col <op> val``? Sound under spec truncation (lower is a
    prefix of the true min, upper is incremented past the true max).
    None on either side = unknown = can't prune on that side.
    Conservative True on any type mismatch."""
    try:
        if op == "==":
            op = "="
        if op == "!=":
            return True
        if op == "in":
            return any(stats_admit(lower, upper, "=", x) for x in val)
        if op == "=":
            if lower is not None and _identity_ordered(val, lower):
                return False  # val < min
            if upper is not None and _identity_ordered(upper, val):
                return False  # max < val
            return True
        if op == "<":
            return lower is None or _identity_ordered(lower, val)
        if op == "<=":
            return lower is None or not _identity_ordered(val, lower)
        if op == ">":
            return upper is None or _identity_ordered(val, upper)
        if op == ">=":
            return upper is None or not _identity_ordered(upper, val)
        return True
    except TypeError:
        return True


class _Incomparable(TypeError):
    pass


def _identity_ordered(a, b) -> bool:
    """a < b after the same literal normalization identity pruning
    uses; raises TypeError (caught by stats_admit) when the pair can't
    be compared soundly."""
    b2 = _identity_lit(a, b)
    if b2 is _INCOMPARABLE:
        raise _Incomparable(f"{type(a).__name__} vs {type(b).__name__}")
    return a < b2
