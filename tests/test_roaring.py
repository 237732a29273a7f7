"""Roaring bitmap codec (io/roaring.py) — the Delta deletion-vector
payload format. Roundtrips across container types, the spec's run
container on read, and the 64-bit RoaringBitmapArray wrapper."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from daft_spark.io.roaring import (
    RBM64_MAGIC,
    SERIAL_COOKIE_RUN,
    deserialize_rbm64,
    deserialize_roaring32,
    serialize_rbm64,
    serialize_roaring32,
)


def test_container_shapes_roundtrip():
    cases = [
        [],
        [0],
        [65535],
        [65536],
        [1, 2, 3, 100000],
        list(range(5000)),            # bitmap container (card > 4096)
        list(range(0, 200000, 7)),    # several containers
        [0xFFFFFFFF],
    ]
    for c in cases:
        b = serialize_roaring32(c)
        got, used = deserialize_roaring32(b)
        assert used == len(b)
        assert got == sorted(set(c))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 2**32 - 1), max_size=500))
def test_roaring32_roundtrip_property(vals):
    got, used = deserialize_roaring32(serialize_roaring32(vals))
    assert got == sorted(set(vals))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**34), max_size=300))
def test_rbm64_roundtrip_property(vals):
    b = serialize_rbm64(vals)
    assert struct.unpack_from("<I", b)[0] == RBM64_MAGIC
    assert deserialize_rbm64(b) == sorted(set(vals))


def test_run_container_read():
    """The writer never emits run containers (legal per spec); the
    reader must still parse them — hand-built per RoaringFormatSpec:
    cookie 12347 with size-1 in the upper 16 bits, run bitset, header,
    no offsets below the 4-container threshold, (start, length-1)
    runs."""
    buf = struct.pack("<I", SERIAL_COOKIE_RUN | (0 << 16))
    buf += bytes([0b1])
    buf += struct.pack("<HH", 0, 5)   # key 0, cardinality 6
    buf += struct.pack("<H", 2)       # two runs
    buf += struct.pack("<HH", 3, 2)   # 3,4,5
    buf += struct.pack("<HH", 9, 2)   # 9,10,11
    got, used = deserialize_roaring32(buf)
    assert got == [3, 4, 5, 9, 10, 11]
    assert used == len(buf)
