"""Remaining DataFrame API behaviors: transform/pipe, cast_to_schema,
renames, iterators, window_fns parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_DIR


@pytest.fixture()
def ev(spark):
    import daft_spark

    return daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark).limit(100)


def test_transform_pipe(ev):
    def add_double(df, col, out):
        return df.with_column(out, F.col(col) * 2)

    out = ev.transform(add_double, "user_id", "uid2").pipe(add_double, "uid2", "uid4")
    r = out.where(F.col("user_id") == out["user_id"]).to_pylist()[0]
    assert r["uid4"] == r["user_id"] * 4


def test_cast_to_schema(ev):
    schema = T.StructType(
        [T.StructField("user_id", T.IntegerType()), T.StructField("value", T.FloatType())]
    )
    out = ev.cast_to_schema(schema)
    d = dict(out.to_spark().dtypes)
    assert d["user_id"] == "int" and d["value"] == "float"
    assert d["event_type"] == "string"  # untouched columns stay


def test_renames_and_iterators(ev):
    out = ev.with_columns_renamed({"user_id": "uid", "event_type": "etype"})
    assert "uid" in out.column_names and "user_id" not in out.column_names
    rows = list(out.select("uid", "etype").iter_rows())
    assert len(rows) == 100 and set(rows[0].keys()) == {"uid", "etype"}


def test_window_fns_parity(spark, ev):
    from daft_spark.functions import window_fns as W
    from daft_spark.window import Window

    w = Window().partition_by("user_id").order_by("ts")
    out = ev.select(
        "event_id",
        W.over(W.row_number(), w).alias("rn"),
        W.over(W.lag("value", 1, -1.0), w).alias("prev"),
        W.over(W.first_value("value", ignore_nulls=True), w).alias("fv"),
    )
    rows = out.to_pylist()
    assert all(r["rn"] >= 1 for r in rows)
    firsts = [r for r in rows if r["rn"] == 1]
    assert all(r["prev"] == -1.0 for r in firsts)


def test_with_columns_and_exclude(ev):
    out = ev.with_columns(
        {"a": F.col("user_id") + 1, "b": F.lit("x")}
    ).exclude("props", "value")
    assert "a" in out.column_names and "props" not in out.column_names
    assert out.to_pylist()[0]["b"] == "x"


def test_to_arrow_exact_types(spark):
    """to_arrow is Spark 4's native Arrow export — exact for nested,
    decimal and timestamp types (no pandas round-trip), and
    to_arrow_iter streams the same table as batches."""
    import datetime
    import decimal

    import pyarrow as pa

    import daft_spark

    df = daft_spark.from_pydict(
        {
            "i": [1, 2],
            "d": [decimal.Decimal("1.25"), decimal.Decimal("-3.50")],
            "ts": [datetime.datetime(2020, 1, 1, 12), datetime.datetime(2021, 6, 1)],
            "arr": [[1, 2], [3]],
            "s": [{"x": "a"}, {"x": "b"}],
        },
        spark=spark,
    )
    t = df.to_arrow()
    assert isinstance(t, pa.Table)
    assert t.num_rows == 2
    assert pa.types.is_decimal(t.schema.field("d").type)
    assert pa.types.is_timestamp(t.schema.field("ts").type)
    assert pa.types.is_list(t.schema.field("arr").type)
    assert pa.types.is_struct(t.schema.field("s").type)
    assert t.column("d").to_pylist() == [decimal.Decimal("1.25"), decimal.Decimal("-3.50")]
    assert t.column("arr").to_pylist() == [[1, 2], [3]]
    batches = list(df.to_arrow_iter())
    assert sum(b.num_rows for b in batches) == 2
    assert pa.Table.from_batches(batches).column("i").to_pylist() == [1, 2]
