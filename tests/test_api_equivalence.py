"""The Daft-style API must express the reference's flagship queries and
produce byte-identical results to the raw pyspark formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_q1_via_daft_api_matches_registry(spark):
    import daft_spark
    from daft_spark.queries import all_queries

    # raw-pyspark registry version
    expected = sorted(
        tuple(r) for r in all_queries()["tpch_q1"].spark_fn(spark, SF_DIR).collect()
    )

    # reference-style formulation (benchmarking/tpch/answers.py:12-33)
    lineitem = daft_spark.read_parquet(f"{SF_DIR}/lineitem.parquet", spark=spark)
    disc_price = daft_spark.col("l_extendedprice") * (1 - daft_spark.col("l_discount"))
    charge = disc_price * (1 + daft_spark.col("l_tax"))
    got_df = (
        lineitem.where(
            daft_spark.col("l_shipdate") <= daft_spark.lit("1998-09-02").cast("timestamp_ntz")
        )
        .groupby(daft_spark.col("l_returnflag"), daft_spark.col("l_linestatus"))
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(daft_spark.lit(1)).alias("count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )
    got = sorted(tuple(r) for r in got_df.to_spark().collect())
    assert got == expected


def test_asof_via_daft_api_matches_registry(spark):
    import daft_spark
    from daft_spark.queries import all_queries

    expected = sorted(
        tuple(r) for r in all_queries()["asof_backward_by"].spark_fn(spark, SF_DIR).collect()
    )
    e = daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark)
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    buys = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    got_df = (
        clicks.join_asof(buys, on="ts", by="user_id", strategy="backward")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "click_value",
            "purchase_value",
        )
        .sort("event_id")
    )
    got = sorted(tuple(r) for r in got_df.to_spark().collect())
    assert got == expected
