"""Salted join correctness + size-based sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.skew import salted_join

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("t"))
    )
    salted = (
        salted_join(o, c, "o_custkey", num_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("t"))
    )
    p = {r["c_mktsegment"]: (r["n"], r["t"]) for r in plain.collect()}
    s = {r["c_mktsegment"]: (r["n"], r["t"]) for r in salted.collect()}
    assert p.keys() == s.keys()
    for k in p:
        assert p[k][0] == s[k][0]
        assert p[k][1] == pytest.approx(s[k][1], rel=1e-9)

    # left join keeps unmatched left rows exactly once
    o_extra = o.withColumn("o_custkey", F.col("o_custkey") + 1_000_000).limit(10).unionAll(o)
    lp = o_extra.join(c, "o_custkey", "left").count()
    ls = salted_join(o_extra, c, "o_custkey", num_salts=4, how="left").count()
    assert lp == ls

    with pytest.raises(ValueError):
        salted_join(o, c, "o_custkey", how="full")


def test_sample_size(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.sample import sample_size

    e = load_table(spark, SF_DIR, "events")
    total = e.count()
    s = sample_size(e, 100, seed=7)
    assert s.count() == 100
    # deterministic given the seed
    a = sorted(r["event_id"] for r in sample_size(e, 100, seed=7).select("event_id").collect())
    b = sorted(r["event_id"] for r in sample_size(e, 100, seed=7).select("event_id").collect())
    assert a == b
    # n >= total -> whole frame
    assert sample_size(e, total + 10).count() == total
