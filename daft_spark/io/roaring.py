"""Roaring bitmap serialization — the format Delta Lake deletion
vectors store row indexes in.

Two public specs implemented from their published documents, nothing
else:

- 32-bit RoaringBitmap "portable" format (RoaringFormatSpec,
  github.com/RoaringBitmap/RoaringFormatSpec): cookie header
  (12346 without run containers / 12347 with), descriptive headers of
  (key, cardinality-1) pairs, optional offset header, then array
  (sorted uint16 LE), bitmap (1024×uint64 LE) or run
  (n_runs × (start, length-1)) containers.
- Delta's 64-bit ``RoaringBitmapArray`` "portable" wrapper (Delta
  PROTOCOL.md, Deletion Vectors): magic 1681511377 (4B LE), number of
  32-bit bitmaps (8B LE), then the dense sequence of 32-bit portable
  bitmaps in high-word order (index = upper 32 bits of the value).

The writer emits array/bitmap containers only (runs are legal to read,
optional to write per the spec); the reader handles all three.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE_RUN = 12347
NO_OFFSET_THRESHOLD = 4
RBM64_MAGIC = 1681511377
ARRAY_MAX = 4096


# ---------------------------------------------------------------------------
# 32-bit portable format


def serialize_roaring32(values) -> bytes:
    """Portable bytes for a set of uint32s (sorted internally)."""
    vals = sorted(set(values))
    if any(v < 0 or v > 0xFFFFFFFF for v in vals):
        raise ValueError("roaring32 values must be uint32")
    containers: dict[int, list[int]] = {}
    for v in vals:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present for the no-run cookie)
    off_pos = len(out)
    out += b"\x00" * (4 * n)
    offsets = []
    for k in keys:
        offsets.append(len(out))
        lows = containers[k]
        if len(lows) <= ARRAY_MAX:
            out += struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for lo in lows:
                words[lo >> 6] |= 1 << (lo & 63)
            out += struct.pack("<1024Q", *words)
    for i, off in enumerate(offsets):
        struct.pack_into("<I", out, off_pos + 4 * i, off)
    return bytes(out)


def deserialize_roaring32(buf: bytes, base: int = 0) -> tuple[list[int], int]:
    """Parse one portable 32-bit bitmap at ``buf[base:]``; returns
    (sorted values, bytes consumed)."""
    (cookie,) = struct.unpack_from("<I", buf, base)
    pos = base + 4
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_flags = buf[pos : pos + nb]
        pos += nb
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")
    heads = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        heads.append((k, cm1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are for random access; sequential parse
    values: list[int] = []
    for i, (k, card) in enumerate(heads):
        is_run = bool(run_flags and (run_flags[i // 8] & (1 << (i % 8))))
        hi = k << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(hi | v for v in range(start, start + lm1 + 1))
        elif card <= ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(hi | v for v in lows)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(hi | (wi << 6) | b.bit_length() - 1)
                    w ^= b
    return values, pos - base


# ---------------------------------------------------------------------------
# Delta 64-bit RoaringBitmapArray


def serialize_rbm64(values) -> bytes:
    """Delta RoaringBitmapArray portable bytes for a set of uint64 row
    indexes: dense high-word-indexed sequence of 32-bit bitmaps
    (intermediate empty words serialize as empty bitmaps)."""
    vals = sorted(set(values))
    if any(v < 0 for v in vals):
        raise ValueError("row indexes must be non-negative")
    by_hi: dict[int, list[int]] = {}
    for v in vals:
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<Iq", RBM64_MAGIC, n))
    for hi in range(n):
        out += serialize_roaring32(by_hi.get(hi, []))
    return bytes(out)


def deserialize_rbm64(buf: bytes) -> list[int]:
    magic, n = struct.unpack_from("<Iq", buf, 0)
    if magic != RBM64_MAGIC:
        raise ValueError(f"not a RoaringBitmapArray (magic {magic})")
    pos = 12
    values: list[int] = []
    for hi in range(n):
        lows, used = deserialize_roaring32(buf, pos)
        pos += used
        values.extend((hi << 32) | v for v in lows)
    return values
