"""EWMA / TWAP (daft_spark/operators/timeseries.py): pandas-equivalent
recurrence, block rebasing, tie handling, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daft_spark.operators.timeseries import ewma, time_weighted_avg


def test_ewma_matches_recurrence(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)], ["i", "g", "x"]
    )
    out = {
        r["i"]: r["ewma"]
        for r in ewma(df, "x", "i", by=["g"], alpha=0.3).collect()
    }
    y = vals[0]
    assert abs(out[0] - y) < 1e-12
    for t in range(1, len(vals)):
        y = 0.3 * vals[t] + 0.7 * y
        assert abs(out[t] - y) < 1e-9, (t, out[t], y)


def test_ewma_block_rebase_exact(spark):
    # force many blocks: block=4 over 50 points must equal block=512
    vals = [float((i * 37) % 11) for i in range(50)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["i", "x"]
    )
    a = {r["i"]: r["ewma"] for r in ewma(df, "x", "i", alpha=0.4, block=4).collect()}
    b = {r["i"]: r["ewma"] for r in ewma(df, "x", "i", alpha=0.4, block=512).collect()}
    assert all(abs(a[i] - b[i]) < 1e-9 for i in a)
    # and the recurrence agrees
    y = vals[0]
    for t in range(1, 50):
        y = 0.4 * vals[t] + 0.6 * y
    assert abs(a[49] - y) < 1e-9


def test_ewma_nulls_skipped_and_validation(spark):
    df = spark.createDataFrame(
        [(0, 2.0), (1, None), (2, 4.0)], "i long, x double"
    )
    out = {r["i"]: r["ewma"] for r in ewma(df, "x", "i", alpha=0.5).collect()}
    assert 1 not in out
    assert abs(out[2] - (0.5 * 4.0 + 0.5 * 2.0)) < 1e-12
    with pytest.raises(ValueError):
        ewma(df, "x", "i", alpha=1.0)
    with pytest.raises(ValueError):
        ewma(df, "x", "i", alpha=0.3, block=1)


def test_twap_holds_and_single_event(spark):
    rows = [
        ("u1", 0.0, 10.0, 1),
        ("u1", 10.0, 20.0, 2),  # 10.0 held 10s
        ("u1", 30.0, 99.0, 3),  # 20.0 held 20s; 99 zero-weight
        ("u2", 5.0, 7.5, 4),    # single event -> value itself
    ]
    df = spark.createDataFrame(rows, ["g", "t", "x", "eid"])
    out = {r["g"]: r for r in
           time_weighted_avg(df, "x", "t", by=["g"], tiebreak="eid").collect()}
    assert abs(out["u1"]["twap"] - (10 * 10 + 20 * 20) / 30) < 1e-12
    assert out["u1"]["n_events"] == 3
    assert abs(out["u2"]["twap"] - 7.5) < 1e-12


def test_twap_tiebreak_deterministic(spark):
    rows = [("g", 0.0, 1.0, 1), ("g", 0.0, 100.0, 2), ("g", 10.0, 0.0, 3)]
    df = spark.createDataFrame(rows, ["g", "t", "x", "eid"])
    r = time_weighted_avg(df, "x", "t", by=["g"], tiebreak="eid").first()
    # order by (t, eid): value 1.0 holds 0s, 100.0 holds 10s
    assert abs(r["twap"] - 100.0) < 1e-12


def test_cms_bounds_and_merge(spark):
    from daft_spark.operators.cms import cms_build, cms_estimate, cms_merge

    rows = [(f"k{i % 5}",) for i in range(1000)] + [("rare",)]
    df = spark.createDataFrame(rows, ["k"])
    sk = cms_build(df, "k", eps=0.01, delta=0.01)
    est = {r["k"]: r["estimate"] for r in
           cms_estimate(sk, df.select("k").distinct(), "k",
                        eps=0.01, delta=0.01).collect()}
    true = {f"k{i}": 200 for i in range(5)}
    true["rare"] = 1
    n = 1001
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] <= t + 0.01 * n + 1e-9, (k, est[k], t)
    # merge of two halves == sketch of the union (cell-wise sums)
    a = spark.createDataFrame(rows[:500], ["k"])
    b = spark.createDataFrame(rows[500:], ["k"])
    merged = cms_merge(cms_build(a, "k", eps=0.01, delta=0.01),
                       cms_build(b, "k", eps=0.01, delta=0.01))
    full = cms_build(df, "k", eps=0.01, delta=0.01)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    import pytest as _p

    with _p.raises(ValueError):
        cms_build(df, "k", eps=0.0)


def test_calibrated_group_filter_and_curriculum(spark):
    from daft_spark.operators.sampling import (
        calibrated_group_filter,
        curriculum_order,
    )

    rows = [(i, "a" if i < 10 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "g", "m"])
    kept = calibrated_group_filter(df, "m", "g", 0.5, keep="below")
    by_g = {}
    for r in kept.collect():
        by_g.setdefault(r["g"], []).append(r["id"])
    # each group keeps its own lower half (0..4 within 0..9; 10..14 within 10..19)
    assert sorted(by_g["a"]) == [0, 1, 2, 3, 4] and sorted(by_g["b"]) == [10, 11, 12, 13, 14]
    kept_hi = calibrated_group_filter(df, "m", "g", 0.5, keep="above")
    assert kept_hi.count() == 10
    import pytest as _p

    with _p.raises(ValueError):
        calibrated_group_filter(df, "m", "g", 1.5)

    buck = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], ["id", "b"]
    )
    out = curriculum_order(buck, "b", "id").collect()
    ranks = sorted(r["curriculum_rank"] for r in out)
    assert ranks == list(range(1, 31))  # dense 1-based global rank
    # bucket order: all b=2 rows rank before b=1 before b=0
    maxr = {b: max(r["curriculum_rank"] for r in out if r["b"] == b)
            for b in (0, 1, 2)}
    minr = {b: min(r["curriculum_rank"] for r in out if r["b"] == b)
            for b in (0, 1, 2)}
    assert maxr[2] < minr[1] and maxr[1] < minr[0]
    # deterministic
    again = {r["id"]: r["curriculum_rank"]
             for r in curriculum_order(buck, "b", "id").collect()}
    assert all(again[r["id"]] == r["curriculum_rank"] for r in out)


def test_ewma_windowed_matches_truncated_recurrence(spark):
    from daft_spark.operators.timeseries import ewma_windowed

    vals = [round(0.01 * ((i * 137) % 991), 2) for i in range(80)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["i", "x"]
    )
    k = 8
    out = {r["i"]: r["ewma"]
           for r in ewma_windowed(df, "x", "i", k=k, scale=100).collect()}
    for t in range(len(vals)):
        lo = max(0, t - k + 1)
        # replay the truncated definition: seed = oldest kept value
        y = vals[lo]
        for j in range(lo + 1, t + 1):
            y = 0.5 * vals[j] + 0.5 * y
        assert abs(out[t] - y) < 1e-9, (t, out[t], y)
    with pytest.raises(ValueError):
        ewma_windowed(df, "x", "i", k=0)


def test_ewma_overflow_guard_raises(spark):
    """Quantized values past 2^(63-k) must raise, not wrap the long
    accumulator (r12 advice)."""
    import pytest
    from pyspark.sql.utils import PythonException

    from daft_spark.operators.timeseries import ewma_windowed

    # mid-range: fits the long cast but overflows the k=32 accumulator
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 1e9)], "uid long, t long, v double"
    )
    out = ewma_windowed(df, "v", "t", by=["uid"], k=32, scale=100)
    with pytest.raises(Exception, match="ewma_windowed"):
        out.collect()
    # astronomically large: Spark's ANSI cast raises before the guard —
    # either way the job FAILS instead of silently wrapping
    df2 = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 1e18)], "uid long, t long, v double"
    )
    with pytest.raises(Exception, match="ewma_windowed|CAST_OVERFLOW"):
        ewma_windowed(df2, "v", "t", by=["uid"], k=32, scale=100).collect()
