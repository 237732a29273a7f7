"""Round-2 fixes: explode lockstep semantics, join deconfliction,
range() Python semantics, @method binding, to_arrow exactness,
checkpoint error narrowing (VERDICT.md "What's wrong" + ADVICE.md)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

import daft_spark
from daft_spark.dataframe import DataFrame


def _df(spark, data, schema):
    return DataFrame(spark.createDataFrame(data, schema))


# --- explode (reference daft/dataframe/dataframe.py:4239-4256) -------------

def test_explode_multi_lockstep(spark):
    d = _df(spark, [([1], ["a"]), ([2, 3], ["b", "c"])], "x: array<int>, y: array<string>")
    rows = d.explode("x", "y").to_pylist()
    assert rows == [
        {"x": 1, "y": "a"},
        {"x": 2, "y": "b"},
        {"x": 3, "y": "c"},
    ]


def test_explode_multi_ragged_raises(spark):
    d = _df(spark, [([1, 2], ["a"])], "x: array<int>, y: array<string>")
    with pytest.raises(Exception, match="same number"):
        d.explode("x", "y").to_pylist()


def test_explode_null_and_empty_default_single_null_row(spark):
    d = _df(spark, [(1, [10, 20]), (2, []), (3, None)], "id: int, xs: array<int>")
    rows = sorted(d.explode("xs").to_pylist(), key=lambda r: (r["id"], r["xs"] or -1))
    assert rows == [
        {"id": 1, "xs": 10},
        {"id": 1, "xs": 20},
        {"id": 2, "xs": None},
        {"id": 3, "xs": None},
    ]


def test_explode_ignore_empty_and_null(spark):
    d = _df(spark, [(1, [10, 20]), (2, []), (3, None)], "id: int, xs: array<int>")
    rows = d.explode("xs", ignore_empty_and_null=True).to_pylist()
    assert sorted(r["xs"] for r in rows) == [10, 20]


def test_explode_index_column(spark):
    d = _df(spark, [(1, ["a", "b", "c"])], "id: int, xs: array<string>")
    rows = d.explode("xs", index_column="pos").to_pylist()
    assert [(r["xs"], r["pos"]) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]


def test_explode_multi_null_lockstep(spark):
    # null + null lists agree on length 0 -> one null row (default)
    d = _df(spark, [(1, None, None)], "id: int, x: array<int>, y: array<string>")
    rows = d.explode("x", "y").to_pylist()
    assert rows == [{"id": 1, "x": None, "y": None}]


# --- join prefix/suffix deconfliction (reference dataframe.py:3882-3894) ---

def test_join_default_right_prefix(spark):
    a = _df(spark, [(1, "l")], "k: int, v: string")
    b = _df(spark, [(1, "r")], "k: int, v: string")
    j = a.join(b, on="k")
    assert set(j.column_names) == {"k", "v", "right.v"}
    row = j.to_pylist()[0]
    assert row["v"] == "l" and row["right.v"] == "r"


def test_join_suffix_override(spark):
    a = _df(spark, [(1, "l")], "k: int, v: string")
    b = _df(spark, [(1, "r")], "k: int, v: string")
    j = a.join(b, on="k", suffix="_r")
    assert set(j.column_names) == {"k", "v", "v_r"}


def test_join_left_on_right_on_deconflicts_nonkey(spark):
    a = _df(spark, [(1, "l")], "ak: int, v: string")
    b = _df(spark, [(1, "r")], "bk: int, v: string")
    j = a.join(b, left_on="ak", right_on="bk", prefix="b_")
    assert set(j.column_names) == {"ak", "v", "bk", "b_v"}


def test_join_column_condition_with_prefix_raises(spark):
    a = _df(spark, [(1, "l")], "k: int, v: string")
    b = _df(spark, [(1, "r")], "k: int, v: string")
    with pytest.raises(NotImplementedError):
        a.join(b, on=a["k"] == b["k"], prefix="x_")


# --- range() Python semantics (ADVICE: daft_spark/__init__.py) -------------

def test_range_python_semantics(spark):
    assert [r["id"] for r in daft_spark.range(5).to_pylist()] == [0, 1, 2, 3, 4]
    assert [r["id"] for r in daft_spark.range(2, 10, 3).to_pylist()] == [2, 5, 8]


# --- @method binding (ADVICE: udf.py) --------------------------------------

def test_method_preserves_instance_binding():
    from daft_spark.udf import method

    class M:
        def __init__(self):
            self.base = 10

        @method
        def add(self, x):
            return self.base + x

    m = M()
    assert m.add(5) == 15  # staticmethod would have bound 5 to `self`
    assert getattr(M.add, "__daft_method__", False)


# --- to_arrow exactness ----------------------------------------------------

def test_to_arrow_nested_roundtrip(spark):
    import pyarrow as pa

    d = _df(spark, [([1, 2], {"a": 1}, "x")],
            "xs: array<int>, s: struct<a:int>, t: string")
    tbl = d.to_arrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 1
    assert pa.types.is_list(tbl.schema.field("xs").type)
    assert pa.types.is_struct(tbl.schema.field("s").type)
    assert tbl.column("xs").to_pylist() == [[1, 2]]


# --- checkpoint error narrowing (ADVICE: operators/checkpoint.py) ----------

def test_skip_existing_missing_path_passthrough(spark):
    from daft_spark.operators.checkpoint import skip_existing

    df = spark.createDataFrame([(1,), (2,)], "k: int")
    with tempfile.TemporaryDirectory() as tmp:
        out = skip_existing(df, os.path.join(tmp, "never_written"), ["k"])
        assert out.count() == 2


def test_skip_existing_reraises_non_missing_errors(spark):
    from daft_spark.operators.checkpoint import skip_existing

    df = spark.createDataFrame([(1,)], "k: int")
    with tempfile.TemporaryDirectory() as tmp:
        # Existing output with a DIFFERENT schema (no `k` column): the
        # select(k) fails with a real AnalysisException that must NOT be
        # swallowed as "first run".
        spark.createDataFrame([("x",)], "other: string").write.parquet(
            os.path.join(tmp, "out"))
        with pytest.raises(Exception, match="k"):
            skip_existing(df, os.path.join(tmp, "out"), ["k"]).count()


# --- LSH bucket-size cap (VERDICT "weak-at-scale": degenerate buckets) -----

def test_lsh_degenerate_bucket_no_blowup(spark):
    """500 identical docs, cap 50: candidates must be LINEAR (star-linked
    to the bucket representative), not the 124,750 all-pairs quadratic —
    and the duplicate cluster stays fully connected for dedup."""
    from daft_spark.operators.dedup import (
        minhash_lsh_candidates,
        verify_candidates_jaccard,
    )

    n = 500
    d = spark.createDataFrame(
        [(i, "the same boilerplate text repeated verbatim in every document row") for i in range(n)],
        "doc_id: long, text: string",
    )
    cand = minhash_lsh_candidates(d, "text", "doc_id", max_bucket_size=50)
    rows = cand.collect()
    assert len(rows) == n - 1  # star: every doc linked to min id
    assert all(r["id_a"] == 0 for r in rows)
    verified = verify_candidates_jaccard(cand, d, "text", "doc_id", threshold=0.8)
    assert verified.count() == n - 1  # identical docs all verify


def test_lsh_small_buckets_unchanged_by_cap(spark):
    from daft_spark.operators.dedup import minhash_lsh_candidates

    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "completely different words entirely here now")],
        "doc_id: long, text: string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(d, "text", "doc_id").collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_degenerate_bucket_no_blowup(spark):
    from daft_spark.operators.dedup import simhash_near_dups

    n = 300
    d = spark.createDataFrame(
        [(i, "identical content for the simhash degenerate bucket case") for i in range(n)],
        "doc_id: long, text: string",
    )
    out = simhash_near_dups(d, "text", "doc_id", max_bucket_size=40)
    rows = out.collect()
    assert len(rows) == n - 1
    assert all(r["hamming"] == 0 and r["id_a"] == 0 for r in rows)


# --- SQL table functions (VERDICT missing #2) -------------------------------

def test_sql_table_function_parquet_and_glob(spark):
    from daft_spark.sql import sql as dsql

    out = dsql(
        "SELECT count(*) AS n FROM read_parquet('/root/testdata/sf0.001/region.parquet')",
        spark=spark,
    )
    assert out.collect()[0]["n"] == 5
    # glob + join of two table functions in one statement
    out2 = dsql(
        """
        SELECT r.r_name, count(*) AS n
        FROM read_parquet('/root/testdata/sf0.001/nation.parquet') n
        JOIN read_parquet('/root/testdata/sf0.001/region*.parquet') r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """,
        spark=spark,
    )
    assert out2.count() == 5


def test_sql_table_function_csv(spark, tmp_path):
    import os
    from daft_spark.sql import sql as dsql

    p = os.path.join(str(tmp_path), "t.csv")
    spark.createDataFrame([(1, "a"), (2, "b")], "k: int, v: string") \
        .coalesce(1).write.option("header", True).csv(p)
    out = dsql(f"SELECT sum(k) AS s FROM read_csv('{p}')", spark=spark)
    assert out.collect()[0]["s"] == 3


# --- bucketed global as-of / order-only window (VERDICT next-round #7) ------

def _asof_frames(spark):
    import random

    rnd = random.Random(7)
    lts = sorted(rnd.sample(range(0, 100000), 400))
    rts = sorted(rnd.sample(range(-50, 99950), 150))
    left = spark.createDataFrame([(i, t) for i, t in enumerate(lts)], "lid: long, t: long")
    right = spark.createDataFrame([(t, float(t) / 7.0) for t in rts], "t: long, rv: double")
    return left, right


def test_asof_global_bucketed_equals_serial(spark):
    from daft_spark.operators.asof_join import join_asof

    left, right = _asof_frames(spark)
    for strategy in ("backward", "forward", "nearest"):
        bucketed = join_asof(left, right, on="t", strategy=strategy, num_buckets=16)
        serial = join_asof(left, right, on="t", strategy=strategy, num_buckets=1)
        b = sorted(map(tuple, bucketed.collect()))
        s = sorted(map(tuple, serial.collect()))
        assert b == s, f"strategy={strategy}"


def _window_nodes(plan: str):
    import re

    return re.findall(r"Window \[[^\n]*", plan)


def test_asof_global_bucketed_parallel_window(spark):
    """No serial Window over the main data: every order-only Window in the
    plan must be the tiny carry-spine one (<= num_buckets rows)."""
    from daft_spark.operators.asof_join import join_asof

    left, right = _asof_frames(spark)
    j = join_asof(left, right, on="t", strategy="backward")
    plan = j._jdf.queryExecution().executedPlan().toString()
    nodes = _window_nodes(plan)
    assert any("__bkt" in n for n in nodes)  # bucketed window present
    serial_big = [n for n in nodes if "__bkt" not in n and "__carry" not in n]
    assert not serial_big, serial_big


def test_global_running_bucketed_parallel_window(spark):
    from daft_spark.operators.window_ext import global_running

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    out = global_running(df, axis=F.col("k"), order_cols=["k"], value_col="v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    nodes = _window_nodes(plan)
    assert any("__bkt" in n for n in nodes)
    serial_big = [n for n in nodes if "__bkt" not in n and "__off_" not in n]
    assert not serial_big, serial_big
    # correctness vs the serial formulation
    from pyspark.sql import Window
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expected = df.select("k", F.sum("v").over(w).alias("rs"),
                         F.row_number().over(Window.orderBy("k")).alias("rn"))
    got = {r["k"]: (r["global_run_sum"], r["global_rn"]) for r in out.collect()}
    for r in expected.collect():
        assert abs(got[r["k"]][0] - r["rs"]) < 1e-9 and got[r["k"]][1] == r["rn"]


def test_global_running_null_values(spark):
    from daft_spark.operators.window_ext import global_running

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, 5.0), (3, None), (4, 2.0)], "k: int, v: double"
    )
    out = {r["k"]: r["global_run_sum"]
           for r in global_running(df, axis=F.col("k"), order_cols=["k"],
                                   value_col="v", num_buckets=3).collect()}
    assert out == {0: None, 1: None, 2: 5.0, 3: 5.0, 4: 7.0}
