"""Property-based tests (hypothesis) — the reference's strategy for sort
correctness over random data (reference:
tests/property_based_testing/{strategies,test_sort}.py), extended to the
as-of join against a pure-python model.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

values = st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                        width=32), st.just(0.0))


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    rows = [
        (
            i,
            draw(st.integers(min_value=0, max_value=3)),  # key with collisions
            draw(values),
        )
        for i in range(n)
    ]
    return rows


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(frames())
def test_sort_matches_python_model(spark, rows):
    df = spark.createDataFrame(rows, "id long, k long, v double") if rows else (
        spark.createDataFrame([], "id long, k long, v double")
    )
    got = [(r["id"]) for r in df.orderBy(
        df["v"].asc_nulls_last(), df["id"]
    ).collect()]
    expected = [r[0] for r in sorted(
        rows, key=lambda r: ((r[2] is None, r[2] if r[2] is not None else 0.0), r[0])
    )]
    assert got == expected


@st.composite
def asof_inputs(draw):
    nl = draw(st.integers(min_value=0, max_value=15))
    nr = draw(st.integers(min_value=0, max_value=15))
    keys = ["a", "b"]
    left = [
        (i, draw(st.sampled_from(keys)), draw(st.integers(min_value=0, max_value=50)))
        for i in range(nl)
    ]
    right = [
        (draw(st.sampled_from(keys)), draw(st.integers(min_value=0, max_value=50)), float(j))
        for j in range(nr)
    ]
    # drop duplicate (key, t) on the right — matches the determinism
    # precondition (duplicate right keys make ANY as-of join ambiguous)
    seen = set()
    right_dedup = []
    for k, t, v in right:
        if (k, t) not in seen:
            seen.add((k, t))
            right_dedup.append((k, t, v))
    return left, right_dedup


def _model_asof(left, right, strategy):
    out = {}
    for i, k, t in left:
        cands = [(rt, v) for (rk, rt, v) in right if rk == k]
        if strategy == "backward":
            c = [(rt, v) for rt, v in cands if rt <= t]
            out[i] = max(c)[1] if c else None
        elif strategy == "forward":
            c = [(rt, v) for rt, v in cands if rt >= t]
            out[i] = min(c)[1] if c else None
        else:  # nearest, tie -> forward
            if not cands:
                out[i] = None
                continue
            best = min(cands, key=lambda rv: (abs(rv[0] - t), rv[0] < t))
            out[i] = best[1]
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_inputs(), st.sampled_from(["backward", "forward", "nearest"]))
def test_asof_matches_python_model(spark, inputs, strategy):
    from daft_spark.operators.asof_join import join_asof

    left, right = inputs
    ldf = spark.createDataFrame(left, "id long, k string, t long") if left else (
        spark.createDataFrame([], "id long, k string, t long")
    )
    rdf = spark.createDataFrame(right, "k string, t long, v double") if right else (
        spark.createDataFrame([], "k string, t long, v double")
    )
    got = {r["id"]: r["v"] for r in join_asof(ldf, rdf, on="t", by="k", strategy=strategy).collect()}
    expected = _model_asof(left, right, strategy)
    assert got == expected


def test_read_generator_custom_source(spark):
    from daft_spark.io.custom_source import read_generator

    def gen(partition: int):
        for j in range(5):
            yield (partition, j, f"p{partition}r{j}")

    df = read_generator(gen, "part int, row int, tag string", num_partitions=4, spark=spark)
    rows = sorted((r["part"], r["row"], r["tag"]) for r in df.collect())
    assert len(rows) == 20
    assert rows[0] == (0, 0, "p0r0") and rows[-1] == (3, 4, "p3r4")
    # partitions really map to separate tasks
    assert df.rdd.getNumPartitions() == 4
