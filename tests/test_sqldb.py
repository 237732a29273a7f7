"""sqlite-backed read_sql/write_sql (io/sqldb.py): partitioned parallel
read correctness (range splits neither drop nor duplicate boundary
rows), write modes, URL routing."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _orders(spark):
    from daft_spark.io.readers import load_table

    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_roundtrip_partitioned(spark, tmp_path):
    from daft_spark.io.readers import read_sql
    from daft_spark.io.writers import write_sql

    url = f"sqlite://{tmp_path}/t.db"
    o = _orders(spark).filter(F.col("o_orderkey") < 1000)
    write_sql(o, "orders", url, write_mode="overwrite")
    for nparts in (1, 4, 7):
        back = read_sql("orders", url, spark, partition_col="o_orderkey", num_partitions=nparts)
        assert back.count() == o.count(), f"nparts={nparts}"
        assert back.select("o_orderkey").distinct().count() == o.count()
        assert back.agg(F.sum("o_orderkey")).collect()[0][0] == o.agg(
            F.sum("o_orderkey")
        ).collect()[0][0]


def test_query_and_unpartitioned(spark, tmp_path):
    from daft_spark.io.readers import read_sql
    from daft_spark.io.writers import write_sql

    url = f"sqlite://{tmp_path}/t.db"
    write_sql(_orders(spark).limit(200), "orders", url, write_mode="overwrite")
    back = read_sql(
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus", url, spark
    )
    assert back.agg(F.sum("n")).collect()[0][0] == 200


def test_write_modes(spark, tmp_path):
    from daft_spark.io.readers import read_sql
    from daft_spark.io.writers import write_sql

    url = f"sqlite://{tmp_path}/t.db"
    o = _orders(spark).limit(50)
    write_sql(o, "t", url, write_mode="error")
    with pytest.raises(FileExistsError):
        write_sql(o, "t", url, write_mode="error")
    write_sql(o, "t", url, write_mode="ignore")  # no-op
    assert read_sql("t", url, spark).count() == 50
    write_sql(o, "t", url, write_mode="append")
    assert read_sql("t", url, spark).count() == 100
    write_sql(o, "t", url, write_mode="overwrite")
    assert read_sql("t", url, spark).count() == 50
    # the file is a real sqlite database other clients can open
    con = sqlite3.connect(f"{tmp_path}/t.db")
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 50
    con.close()


def test_missing_db(spark, tmp_path):
    from daft_spark.io.readers import read_sql

    with pytest.raises(FileNotFoundError):
        read_sql("t", f"sqlite://{tmp_path}/absent.db", spark)
