"""Pruning soundness for the Iceberg partition transforms
(io/iceberg_transforms.py): transform_admits may return False ONLY
when no value in the partition can satisfy the predicate — a single
false negative silently drops rows at scan time, the worst failure
mode a reader can have. Property-based over random values/ops."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from daft_spark.io.iceberg_transforms import (
    bucket_value,
    day_value,
    month_value,
    transform_admits,
    truncate_value,
    year_value,
)

OPS = ["=", "!=", "<", "<=", ">", ">="]


def _sat(v, op, lit):
    return {
        "=": v == lit,
        "!=": v != lit,
        "<": v < lit,
        "<=": v <= lit,
        ">": v > lit,
        ">=": v >= lit,
    }[op]


@settings(max_examples=300, deadline=None)
@given(
    v=st.integers(-10_000, 10_000),
    lit=st.integers(-10_000, 10_000),
    op=st.sampled_from(OPS),
    w=st.sampled_from([1, 2, 5, 10, 100]),
)
def test_truncate_int_never_false_negative(v, lit, op, w):
    pv = truncate_value(v, w)
    if _sat(v, op, lit):
        assert transform_admits(f"truncate[{w}]", pv, op, lit), (v, pv, op, lit)


@settings(max_examples=300, deadline=None)
@given(
    v=st.text(alphabet="abcxyz", min_size=0, max_size=6),
    lit=st.text(alphabet="abcxyz", min_size=0, max_size=6),
    op=st.sampled_from(OPS),
    w=st.sampled_from([1, 2, 3]),
)
def test_truncate_string_never_false_negative(v, lit, op, w):
    pv = truncate_value(v, w)
    if _sat(v, op, lit):
        assert transform_admits(f"truncate[{w}]", pv, op, lit), (v, pv, op, lit)


@settings(max_examples=300, deadline=None)
@given(
    v=st.dates(datetime.date(1960, 1, 1), datetime.date(2030, 12, 31)),
    lit=st.dates(datetime.date(1960, 1, 1), datetime.date(2030, 12, 31)),
    op=st.sampled_from(OPS),
    t=st.sampled_from(["day", "month", "year"]),
)
def test_temporal_never_false_negative(v, lit, op, t):
    fn = {"day": day_value, "month": month_value, "year": year_value}[t]
    pv = fn(v)
    if _sat(v, op, lit):
        assert transform_admits(t, pv, op, lit), (v, pv, op, lit)


@settings(max_examples=300, deadline=None)
@given(
    v=st.one_of(
        st.integers(-(2**40), 2**40),
        st.text(alphabet="abcdef", min_size=0, max_size=8),
    ),
    op=st.sampled_from(["=", "!="]),
    n=st.sampled_from([2, 4, 16]),
)
def test_bucket_equality_never_false_negative(v, op, n):
    pv = bucket_value(v, n)
    # the only prunable case is equality with the same literal
    if _sat(v, op, v):
        assert transform_admits(f"bucket[{n}]", pv, op, v)


@settings(max_examples=200, deadline=None)
@given(
    v=st.integers(-1000, 1000),
    lits=st.lists(st.integers(-1000, 1000), min_size=1, max_size=5),
    w=st.sampled_from([1, 7, 50]),
)
def test_in_op_never_false_negative(v, lits, w):
    if v in lits:
        assert transform_admits(f"truncate[{w}]", truncate_value(v, w), "in", lits)
        assert transform_admits("identity", v, "in", lits)
        assert transform_admits("bucket[8]", bucket_value(v, 8), "in", lits)


def test_identity_null_partition():
    # a null identity partition holds only null rows: no comparison matches
    for op in OPS:
        want = op == "!="
        assert transform_admits("identity", None, op, 5) is want


def test_unknown_transform_or_type_is_conservative():
    assert transform_admits("void", 1, "=", 1) is True
    assert transform_admits("truncate[4]", 3.5, "=", 3.0) is True  # odd pv type
    assert transform_admits("day", 3, "~", "x") is True  # unknown op


def test_identity_temporal_literal_normalization():
    """ADVICE r6: manifests from external writers store identity
    date/timestamp partition values as raw ints (days / epoch micros);
    pushed literals arrive as datetime.date / datetime. int==date is
    silently False in Python, which pruned every matching file."""
    import datetime

    from daft_spark.io.iceberg_transforms import transform_admits

    d = datetime.date(2024, 1, 1)
    days = (d - datetime.date(1970, 1, 1)).days
    assert transform_admits("identity", days, "=", d) is True
    assert transform_admits("identity", days + 1, "=", d) is False
    assert transform_admits("identity", days, "in", [d, datetime.date(2000, 1, 1)])
    assert not transform_admits(
        "identity", days + 5, "in", [d, datetime.date(2024, 1, 2)]
    )
    assert transform_admits("identity", days + 1, ">", d) is True
    assert transform_admits("identity", days - 1, ">", d) is False
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    micros = int(
        (ts - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    assert transform_admits("identity", micros, "=", ts) is True
    assert transform_admits("identity", micros + 1, "=", ts) is False
    # same-type partition values keep exact comparison
    assert transform_admits("identity", d, "=", d) is True
    assert transform_admits("identity", d, "=", datetime.date(2024, 1, 2)) is False
    # incomparable pairs can't prove exclusion -> admit
    assert transform_admits("identity", "2024-01-01", "=", d) is True
    assert transform_admits("identity", 5, "=", "x") is True


def test_timestamp_long_form_is_microsecond_exact():
    """Regression: _to_long_form went through total_seconds() (a
    double), truncating some values one microsecond off — flipping
    bucket-transform hashes and stats bounds. Exact integer arithmetic
    must roundtrip every microsecond, pre- and post-epoch."""
    import datetime
    import random

    from daft_spark.io.iceberg_transforms import (
        _to_long_form,
        single_value_bytes,
        single_value_decode,
    )

    rng = random.Random(7)
    epoch = datetime.datetime(1970, 1, 1)
    for _ in range(5000):
        us = rng.randint(-(2**55), 2**55)
        v = epoch + datetime.timedelta(microseconds=us)
        assert _to_long_form(v) == us
        assert single_value_decode(single_value_bytes(v, "timestamp"), "timestamp") == v
