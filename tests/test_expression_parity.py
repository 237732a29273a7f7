"""Expression method parity: pyspark Column (after daft_spark import)
resolves every public method of the reference Expression class, and
the delegations compute correct values."""

from __future__ import annotations

import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

import daft_spark  # noqa: F401 — installs the Column extensions


def test_every_reference_expression_method_resolves():
    import re

    src = open("/root/reference/daft/expressions/expressions.py").read()
    body = re.search(r"class Expression:(.*?)\nclass ", src, re.S).group(1)
    names = sorted(set(re.findall(r"\n    def ([a-z][a-z0-9_]*)\(", body)))
    missing = [n for n in names if not hasattr(Column, n)]
    assert not missing, missing


def test_string_and_numeric_delegation(spark):
    df = spark.createDataFrame([("Hello World", -3.0, "kitten")], "s string, x double, t string")
    row = df.select(
        F.col("s").lower().alias("lo"),
        F.col("s").to_snake_case().alias("snake"),
        F.col("s").length().alias("n"),
        F.col("x").abs().alias("ab"),
        F.col("x").sign().alias("sg"),
        F.col("x").negate().alias("neg"),
        F.col("t").levenshtein_distance(F.lit("sitting")).alias("lev"),
        F.lit(8.0).log(2).alias("lg2"),
        F.lit(1.0).log().alias("ln1"),
    ).collect()[0]
    assert row["lo"] == "hello world"
    assert row["snake"] == "hello_world"
    assert row["n"] == 11
    assert row["ab"] == 3.0
    assert row["sg"] == -1.0
    assert row["neg"] == 3.0
    assert row["lev"] == 3
    assert row["lg2"] == 3.0
    assert row["ln1"] == 0.0


def test_list_datetime_null_delegation(spark):
    df = spark.createDataFrame(
        [([3, 1, 2], "2024-06-15 10:30:00", None)],
        "arr array<int>, ts string, maybe string",
    )
    row = df.select(
        F.col("arr").list_sum().alias("lsum"),
        F.col("arr").list_sort().alias("lsorted"),
        F.col("arr").slice(1, 3).alias("lslice"),
        F.col("ts").cast("timestamp").year().alias("yr"),
        F.col("ts").cast("timestamp").day_of_week().alias("dow"),
        F.col("maybe").is_null().alias("isn"),
        F.col("maybe").fill_null("dflt").alias("filled"),
        F.lit(float("inf")).is_inf().alias("inf"),
        F.lit(2.0).not_nan().alias("nn"),
    ).collect()[0]
    assert row["lsum"] == 6
    assert row["lsorted"] == [1, 2, 3]
    assert row["lslice"] == [1, 2]  # 0-indexed end-exclusive reference slice
    assert row["yr"] == 2024
    assert row["dow"] == 5  # Saturday, Monday=0 convention
    assert row["isn"] is True
    assert row["filled"] == "dflt"
    assert row["inf"] is True
    assert row["nn"] is True


def test_agg_method_delegation(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    row = df.agg(
        F.col("v").sum().alias("s"),
        F.col("v").mean().alias("m"),
        F.col("v").count().alias("c"),
        F.col("v").count_distinct().alias("cd"),
    ).collect()[0]
    assert (row["s"], row["m"], row["c"], row["cd"]) == (6, 2.0, 3, 3)


def test_apply_udf_and_hash(spark):
    df = spark.createDataFrame([(4,)], "v int")
    row = df.select(
        F.col("v").apply(lambda x: x * 10 + 1, return_dtype="long").alias("applied"),
        F.col("v").hash().alias("h"),
        F.col("v").cast("string").minhash(num_hashes=4).alias("mh"),
    ).collect()[0]
    assert row["applied"] == 41
    assert isinstance(row["h"], int)
    assert len(row["mh"]) == 4


def test_stage_and_introspection_gates(spark):
    with pytest.raises(TypeError, match="DataFrame-stage"):
        F.col("x").decode_image()
    with pytest.raises(NotImplementedError, match="unresolved"):
        F.col("x").is_literal()
    assert F.col("x").alias("y").column_name() == "y"
    # nothing Spark defines was overridden
    assert Column.alias.__module__.startswith("pyspark")
