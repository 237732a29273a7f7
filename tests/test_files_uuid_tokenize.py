"""File helpers, uuid7, tokenize_encode."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_file_helpers(spark):
    from daft_spark.functions import files as FF

    df = spark.createDataFrame(
        [("/root/testdata/sf0.001/region.parquet",), ("/nope/x.jpg",), (None,)],
        "p string",
    )
    rows = {r["p"]: r for r in df.select(
        "p",
        FF.file_size("p").alias("sz"),
        FF.file_exists("p").alias("ex"),
        FF.guess_mime_type("p").alias("mime"),
    ).collect()}
    ok = rows["/root/testdata/sf0.001/region.parquet"]
    assert ok["sz"] > 0 and ok["ex"] is True
    assert ok["mime"] == "application/vnd.apache.parquet"
    bad = rows["/nope/x.jpg"]
    assert bad["sz"] is None and bad["ex"] is False and bad["mime"] == "image/jpeg"


def test_uuid7_and_extractor(spark):
    from daft_spark.functions import misc as M

    df = spark.range(5).select(M.uuid7().alias("u"))
    rows = [r["u"] for r in df.collect()]
    assert len(set(rows)) == 5  # unique
    assert all(u[14] == "7" for u in rows)  # version nibble
    ts = df.select(M.uuid7_timestamp("u").alias("t")).first()["t"]
    assert abs((datetime.datetime.utcnow() - ts).total_seconds()) < 24 * 3600


def test_tokenize_encode(spark):
    from daft_spark.functions import text as TX

    d = spark.createDataFrame([("hello world hello",), ("",)], "t string")
    rows = d.select(TX.tokenize_encode(F.col("t")).alias("ids")).collect()
    ids = rows[0]["ids"]
    assert len(ids) == 3 and ids[0] == ids[2] != ids[1]  # stable per-word ids
    assert rows[1]["ids"] == []
    with pytest.raises(ImportError):
        d.select(TX.tokenize_encode(F.col("t"), "cl100k_base")).collect()
