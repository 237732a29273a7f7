"""Bucketing: pre-partitioned co-located joins without a shuffle — the
scale strategy for repeated big-big joins (SURVEY 'Partitioning &
shuffle'; the reference's pre-partitioned clustering specs map to Spark
bucketed tables)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from daft_spark.io.readers import load_table

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path

    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    try:
        (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", str(tmp_path / "b_orders"))
          .mode("overwrite").saveAsTable("b_orders"))
        (l.withColumnRenamed("l_orderkey", "o_orderkey")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", str(tmp_path / "b_lineitem"))
          .mode("overwrite").saveAsTable("b_lineitem"))

        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = _plan(joined)
        # the join itself must not shuffle either bucketed side: no
        # Exchange below the SortMergeJoin (the aggregate above may).
        join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning(o_orderkey" not in join_part, plan
        # sanity: result matches the unbucketed join
        expected = (
            o.join(l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        got = {r["o_orderstatus"]: r["q"] for r in joined.collect()}
        exp = {r["o_orderstatus"]: r["q"] for r in expected.collect()}
        assert got.keys() == exp.keys()
        for k in got:
            assert got[k] == pytest.approx(exp[k], rel=1e-9)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        for t in ("b_orders", "b_lineitem"):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
