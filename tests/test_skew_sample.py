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


def test_remove_duplicated_spans_keep_first_and_none(spark):
    """Span removal blanks every cross-doc duplicated 20-token window
    except the minimum-(doc, start) occurrence; keep='none' blanks all;
    untouched docs reassemble byte-identically."""
    from pyspark.sql import functions as F

    from daft_spark.operators.dedup import remove_duplicated_spans

    shared = " ".join(f"w{i}" for i in range(25))  # 25-token shared run
    rows = [
        (1, shared + " unique one tail tokens here"),
        (2, "prefix for doc two " + shared),
        (3, "totally different words " + " ".join(f"x{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(df, "text", "doc_id", window_k=20).collect()
    }
    # doc 1 holds the keeper (min doc_id, start 1): its shared run has
    # windows at starts 1..6; starts 2..6 are non-keepers -> tokens
    # 2..25 covered, token 1 survives only if no other window covers it
    assert out[1]["n_tokens"] == 30
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == rows[2][1]
    # doc 2's copy of the run is fully non-keeper -> all 25 tokens gone
    assert out[2]["n_removed"] == 25
    assert out[2]["clean_text"] == "prefix for doc two"
    # keep='none' removes the keeper occurrence too
    none = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(
            df, "text", "doc_id", window_k=20, keep="none"
        ).collect()
    }
    assert none[1]["n_removed"] == 25
    assert none[1]["clean_text"] == "unique one tail tokens here"
    import pytest

    with pytest.raises(ValueError, match="keep must be"):
        remove_duplicated_spans(df, "text", "doc_id", keep="all")
