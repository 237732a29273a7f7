"""Edge-case micro-frames (FIXTURES.md): all-null columns, empty frames,
NaN/inf, unicode, empty vs null lists, null join keys, single rows —
the reference's pydict-fixture test style (tests/dataframe/conftest.py).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def test_all_null_column_aggs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "id long, v double"
    )
    r = df.agg(
        F.sum("v").alias("s"),
        F.avg("v").alias("a"),
        F.count("v").alias("c"),
        F.min("v").alias("mn"),
    ).first()
    assert r["s"] is None and r["a"] is None and r["c"] == 0 and r["mn"] is None


def test_empty_frame_with_schema(spark):
    schema = StructType([StructField("id", LongType()), StructField("v", DoubleType())])
    df = spark.createDataFrame([], schema)
    assert df.count() == 0
    agg = df.agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).first()
    assert agg["s"] is None and agg["n"] == 0
    # groupBy on empty -> empty, not error
    assert df.groupBy("id").agg(F.sum("v")).count() == 0
    # join with empty side
    other = spark.createDataFrame([(1, "x")], "id long, s string")
    assert other.join(df, "id", "left").count() == 1
    assert other.join(df, "id", "inner").count() == 0


def test_nan_inf_semantics(spark):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, float("-inf")), (4, 1.0), (5, None)],
        "id long, v double",
    )
    from daft_spark.functions.numeric import fill_nan, is_inf, is_nan

    out = {r["id"]: r for r in df.select(
        "id",
        is_nan(F.col("v")).alias("nan"),
        is_inf(F.col("v")).alias("inf"),
        fill_nan(F.col("v"), 0.0).alias("filled"),
    ).collect()}
    assert out[1]["nan"] is True and out[1]["filled"] == 0.0
    assert out[2]["inf"] is True and out[3]["inf"] is True
    assert out[4]["nan"] is False
    assert out[5]["nan"] is None or out[5]["nan"] is False  # null propagates

    # NaN ordering: Spark sorts NaN greater than any double (asc -> last)
    ordered = [r["id"] for r in df.filter(F.col("v").isNotNull()).orderBy("v").collect()]
    assert ordered == [3, 4, 2, 1]

    # NaN equality in groupBy: NaNs group together
    grouped = df.groupBy("v").count().collect()
    nan_groups = [r for r in grouped if r["v"] is not None and math.isnan(r["v"])]
    assert len(nan_groups) == 1


def test_unicode_and_regex_metachars(spark):
    df = spark.createDataFrame(
        [(1, "héllo wörld"), (2, "日本語テキスト"), (3, "a.b*c(d)e"), (4, ""), (5, None)],
        "id long, s string",
    )
    out = {r["id"]: r for r in df.select(
        "id",
        F.length("s").alias("len"),
        F.upper("s").alias("up"),
        F.split("s", r"\.").alias("dotsplit"),
    ).collect()}
    assert out[1]["len"] == 11 and out[1]["up"] == "HÉLLO WÖRLD"
    assert out[2]["len"] == 7
    assert out[3]["dotsplit"] == ["a", "b*c(d)e"]
    assert out[4]["len"] == 0
    assert out[5]["len"] is None

    from daft_spark.functions.strings import split as daft_split

    r3 = df.filter(F.col("id") == 3).select(daft_split("s", ".").alias("x")).first()
    assert r3["x"] == ["a", "b*c(d)e"]  # literal split escapes the dot


def test_empty_list_vs_null_list_explode(spark):
    schema = StructType(
        [StructField("id", LongType()), StructField("xs", ArrayType(StringType()))]
    )
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], schema
    )
    # explode drops empty+null (reference ignore_empty_and_null)
    assert [r["id"] for r in df.select("id", F.explode("xs").alias("x")).collect()] == [1, 1]
    # explode_outer keeps them with null element
    outer = df.select("id", F.explode_outer("xs").alias("x")).collect()
    assert sorted((r["id"], r["x"]) for r in outer) == [(1, "a"), (1, "b"), (2, None), (3, None)]
    # size: empty=0, null=-1 (Spark legacy) or null — pin the behavior
    sizes = {r["id"]: r["n"] for r in df.select("id", F.size("xs").alias("n")).collect()}
    assert sizes[1] == 2 and sizes[2] == 0 and sizes[3] in (-1, None)


def test_null_join_keys(spark):
    a = spark.createDataFrame([(1, "x"), (None, "y")], "k long, s string")
    b = spark.createDataFrame([(1, "p"), (None, "q")], "k long, t string")
    # standard equality: null keys never match
    assert a.join(b, a["k"] == b["k"], "inner").count() == 1
    # null-safe equality: null==null matches
    assert a.join(b, a["k"].eqNullSafe(b["k"]), "inner").count() == 2


def test_single_row_and_single_partition(spark):
    df = spark.createDataFrame([(42, "only")], "id long, s string").repartition(8)
    assert df.count() == 1
    from pyspark.sql import Window

    w = Window.partitionBy("s").orderBy("id")
    assert df.select(F.row_number().over(w).alias("rn")).first()["rn"] == 1


def test_asof_edge_cases(spark):
    from daft_spark.operators.asof_join import join_asof

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 100), (4, None, 50), (5, "c", 7)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 10, 2.0), ("b", 200, 3.0), (None, 1, 9.0)],
        "k string, t long, v double",
    )
    out = {r["id"]: r["v"] for r in join_asof(left, right, on="t", by="k").collect()}
    assert out[1] == 2.0   # exact match inclusive (t=10)
    assert out[2] is None  # nothing at/before t=5
    assert out[3] is None  # b only has t=200 (after)
    assert out[5] is None  # no 'c' partition in right
    fwd = {r["id"]: r["v"] for r in join_asof(left, right, on="t", by="k", strategy="forward").collect()}
    assert fwd[2] == 1.0 and fwd[3] == 3.0
    near = {r["id"]: r["v"] for r in join_asof(left, right, on="t", by="k", strategy="nearest").collect()}
    assert near[1] == 2.0 and near[2] == 1.0 and near[3] == 3.0


def test_asof_nearest_tie_prefers_forward(spark):
    from daft_spark.operators.asof_join import join_asof

    left = spark.createDataFrame([(1, 10)], "id long, t long")
    right = spark.createDataFrame([(8, "bwd"), (12, "fwd")], "t long, v string")
    r = join_asof(left, right, on="t", strategy="nearest").first()
    assert r["v"] == "fwd"  # equidistant -> forward (reference dataframe.py:3989)


def test_decimal_precision_roundtrip(spark, tmp_path):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("12345678901234.56"), 1)], "amount decimal(16,2), id int"
    )
    p = str(tmp_path / "dec")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.first()["amount"] == Decimal("12345678901234.56")
    assert dict(back.dtypes)["amount"] == "decimal(16,2)"


def test_sorted_nulls_positions(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 1.0)], "id long, v double")
    import daft_spark

    dd = daft_spark.DataFrame(df)
    # daft default: asc -> nulls last, desc -> nulls first
    assert [r["id"] for r in dd.sort("v").to_pylist()] == [3, 1, 2]
    assert [r["id"] for r in dd.sort("v", desc=True).to_pylist()] == [2, 1, 3]
