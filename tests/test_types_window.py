"""Type mapping, Window builder, embedding interop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_DIR


def test_type_mapping():
    from daft_spark.types import to_spark_type

    assert to_spark_type("uint8") == T.ShortType()
    assert to_spark_type("uint32") == T.LongType()
    assert to_spark_type("uint64") == T.DecimalType(20, 0)
    assert to_spark_type("float16") == T.FloatType()
    assert to_spark_type("decimal", 15, 2) == T.DecimalType(15, 2)
    assert to_spark_type("timestamp", "ns") == T.TimestampNTZType()
    assert to_spark_type("timestamp", "us", "UTC") == T.TimestampType()
    assert to_spark_type("list", "int64") == T.ArrayType(T.LongType())
    assert to_spark_type("embedding", 64) == T.ArrayType(T.FloatType())
    assert to_spark_type("map", "string", "float64") == T.MapType(T.StringType(), T.DoubleType())
    st = to_spark_type("struct", {"a": "int32", "b": "utf8"})
    assert [f.name for f in st.fields] == ["a", "b"]
    img = to_spark_type("image")
    assert [f.name for f in img.fields] == ["data", "height", "width", "mode"]
    with pytest.raises(ValueError):
        to_spark_type("wat")


def test_window_builder(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.window import Window, over

    e = load_table(spark, SF_DIR, "events").limit(200)
    w = Window().partition_by("user_id").order_by("ts").rows_between(
        Window().spec.unboundedPreceding if False else -2, 0
    )
    out = e.select(
        "event_id",
        over(F.sum("value"), w).alias("s3"),
        F.row_number().over(
            Window().partition_by("user_id").order_by("ts", "event_id").spec
        ).alias("rn"),
    )
    rows = out.collect()
    assert len(rows) == 200
    assert all(r["rn"] >= 1 for r in rows)


def test_embedding_interop(spark):
    from daft_spark.functions.embedding import (
        euclidean_distance,
        from_ml_vector,
        normalize_vector,
        to_ml_vector,
    )
    from daft_spark.io.readers import load_table

    emb = load_table(spark, SF_DIR, "embeddings").limit(20)
    out = emb.select(
        "vec_id",
        to_ml_vector("embedding").alias("mlv"),
        normalize_vector(F.col("embedding")).alias("unit"),
        euclidean_distance(F.col("embedding"), F.col("embedding")).alias("self_dist"),
    )
    out2 = out.select("vec_id", from_ml_vector("mlv").alias("back"), "unit", "self_dist")
    r = out2.first()
    assert len(r["back"]) == 64
    assert r["self_dist"] == pytest.approx(0.0, abs=1e-9)
    assert sum(x * x for x in r["unit"]) == pytest.approx(1.0, rel=1e-6)
