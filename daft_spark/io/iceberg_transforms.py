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
        # microseconds from epoch (UTC when aware; as-is when naive)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return int((v - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
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
        if transform == "identity":
            if pv is None:
                return op == "!="
            if op == "=":
                return pv == val
            if op == "!=":
                return True  # other rows in the file may differ
            if op == "in":
                return pv in val
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
