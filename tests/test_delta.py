"""Pure-Python Delta Lake log: write/read roundtrip, append, overwrite
removes, time travel, atomicity guards (daft_spark/io/delta.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from daft_spark.io.delta import (
    _list_versions,
    read_deltalake_py,
    write_deltalake_py,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.format_string("k%d", F.col("id") % 3).alias("k")
    )


def test_roundtrip_and_append(spark, tbl):
    write_deltalake_py(_df(spark, 0, 100), tbl, mode="overwrite")
    write_deltalake_py(_df(spark, 100, 150), tbl, mode="append")
    out = read_deltalake_py(tbl, spark)
    assert out.count() == 150
    assert sorted(out.columns) == ["id", "k", "v"]
    assert out.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(150))
    assert _list_versions(tbl) == [0, 1]


def test_overwrite_removes_prior_files(spark, tbl):
    write_deltalake_py(_df(spark, 0, 100), tbl, mode="overwrite")
    write_deltalake_py(_df(spark, 500, 510), tbl, mode="overwrite")
    out = read_deltalake_py(tbl, spark)
    assert out.count() == 10
    assert out.agg(F.min("id"), F.max("id")).collect()[0] == (500, 509)
    # the remove actions are actually present in the v1 commit
    with open(os.path.join(tbl, "_delta_log", f"{1:020d}.json")) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    assert any("remove" in a for a in actions)


def test_time_travel(spark, tbl):
    write_deltalake_py(_df(spark, 0, 10), tbl, mode="overwrite")
    write_deltalake_py(_df(spark, 10, 30), tbl, mode="append")
    assert read_deltalake_py(tbl, spark, version=0).count() == 10
    assert read_deltalake_py(tbl, spark, version=1).count() == 30
    with pytest.raises(ValueError, match="version 7"):
        read_deltalake_py(tbl, spark, version=7)


def test_modes(spark, tbl):
    write_deltalake_py(_df(spark, 0, 5), tbl, mode="error")
    with pytest.raises(FileExistsError):
        write_deltalake_py(_df(spark, 0, 5), tbl, mode="error")
    write_deltalake_py(_df(spark, 0, 99), tbl, mode="ignore")  # no-op
    assert read_deltalake_py(tbl, spark).count() == 5
    with pytest.raises(ValueError, match="unsupported mode"):
        write_deltalake_py(_df(spark, 0, 5), tbl, mode="merge")


def test_not_a_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a Delta table"):
        read_deltalake_py(str(tmp_path), spark)


def test_schema_pinned_from_metadata(spark, tbl):
    write_deltalake_py(_df(spark, 0, 10), tbl, mode="overwrite")
    out = read_deltalake_py(tbl, spark)
    assert dict(out.dtypes)["v"] == "bigint"
    assert dict(out.dtypes)["k"] == "string"


def test_lakehouse_wrapper_falls_back(spark, tbl):
    """read_deltalake (lakehouse.py) uses the pure-python path when the
    delta-spark connector is absent (this container)."""
    from daft_spark.io.lakehouse import read_deltalake

    write_deltalake_py(_df(spark, 0, 25), tbl, mode="overwrite")
    assert read_deltalake(tbl, spark).count() == 25
    assert read_deltalake(tbl, spark, version=0).count() == 25


def test_writer_wrapper_falls_back(spark, tbl):
    from daft_spark.io.writers import write_deltalake

    write_deltalake(_df(spark, 0, 7), tbl, write_mode="overwrite")
    assert read_deltalake_py(tbl, spark).count() == 7
