"""Daft-style API layer: DataFrame methods, UDF decorators, sql(),
writers — exercised end-to-end through the public package surface."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def dd(spark):
    import daft_spark

    return daft_spark.read_parquet(f"{SF_DIR}/lineitem.parquet", spark=spark)


def test_dataframe_chain(spark, dd):
    out = (
        dd.where(F.col("l_quantity") > 10)
        .with_column("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupby("l_returnflag")
        .agg(F.sum("rev").alias("total"), F.count(F.lit(1)).alias("n"))
        .sort("l_returnflag")
    )
    rows = out.to_pylist()
    assert len(rows) == 3
    assert rows[0]["l_returnflag"] == "A"
    assert all(r["total"] > 0 for r in rows)


def test_sort_nulls_and_topn(spark):
    import daft_spark

    e = daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark)
    top = e.sort("value", desc=True).limit(5).to_pylist()
    # Daft desc default: nulls first
    vals = [r["value"] for r in top]
    assert vals[0] is None or vals == sorted([v for v in vals if v is not None], reverse=True)


def test_join_and_asof(spark):
    import daft_spark

    o = daft_spark.read_parquet(f"{SF_DIR}/orders.parquet", spark=spark)
    c = daft_spark.read_parquet(f"{SF_DIR}/customer.parquet", spark=spark)
    j = o.join(c, left_on="o_custkey", right_on="c_custkey", how="left", strategy="broadcast")
    assert j.count_rows() == o.count_rows()

    e = daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark)
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    a = clicks.join_asof(buys, on="ts", by="user_id", strategy="backward")
    assert a.count_rows() == clicks.count_rows()
    assert "pv" in a.column_names


def test_pivot_explode_distinct(spark):
    import daft_spark

    e = daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark)
    p = e.pivot("user_id", "event_type", "value", "sum", ["click", "view"])
    assert set(p.column_names) == {"user_id", "click", "view"}
    d = daft_spark.read_parquet(f"{SF_DIR}/documents.parquet", spark=spark)
    ex = d.with_column("w", F.split("text", " ")).explode("w")
    assert ex.count_rows() > d.count_rows()
    assert e.distinct("user_id").count_rows() == e.select("user_id").distinct().count_rows()


def test_sql_and_session(spark):
    import daft_spark

    e = daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark)
    out = daft_spark.sql(
        "SELECT user_id, count(*) AS n FROM ev GROUP BY user_id ORDER BY user_id",
        spark=spark,
        ev=e,
    )
    assert out.count() > 0
    s = daft_spark.Session(spark)
    s.attach_table(e, "ev2")
    assert "ev2" in s.list_tables()
    assert s.sql("SELECT count(*) AS n FROM ev2").first()["n"] == e.count_rows()


def test_udf_surface(spark):
    import daft_spark
    from daft_spark import udf as dudf

    e = daft_spark.read_parquet(f"{SF_DIR}/events.parquet", spark=spark).limit(100)

    @dudf.func("string")
    def shout(s: str) -> str:
        return (s or "").upper()

    @dudf.func.batch("double")
    def double_it(v: pd.Series) -> pd.Series:
        return v * 2.0

    out = e.with_column("t2", shout(F.col("event_type"))).with_column(
        "v2", double_it(F.coalesce(F.col("value"), F.lit(0.0)))
    )
    row = out.where(F.col("event_type") == "click").to_pylist()[0]
    assert row["t2"] == "CLICK"
    assert row["v2"] == pytest.approx((row["value"] or 0.0) * 2)

    @dudf.cls
    class Scaler:
        def __init__(self):
            self.factor = 3.0  # "expensive init" runs once per executor

        def __call__(self, s: pd.Series) -> pd.Series:
            return s * self.factor

    out2 = e.with_column(
        "v3", Scaler.as_pandas_udf("double")(F.coalesce(F.col("value"), F.lit(1.0)))
    )
    r2 = out2.to_pylist()[0]
    assert r2["v3"] == pytest.approx((r2["value"] if r2["value"] is not None else 1.0) * 3)


def test_generator_udf(spark):
    import daft_spark
    from daft_spark.udf import generator_udf

    d = daft_spark.read_parquet(f"{SF_DIR}/documents.parquet", spark=spark).select(
        "doc_id", "text"
    ).limit(20)

    def explode_words(doc_id, text):
        for w in text.split(" ")[:3]:
            yield {"doc_id": doc_id, "word": w}

    schema = "doc_id long, word string"
    out = d.to_spark().mapInPandas(generator_udf(schema)(explode_words), schema)
    assert out.count() == 60


def test_writers_roundtrip(spark, dd):
    import daft_spark

    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "out_parquet")
        dd.limit(500).write_parquet(p, partition_cols=["l_returnflag"], write_mode="overwrite")
        back = daft_spark.read_parquet(p, spark=spark)
        assert back.count_rows() == 500
        assert set(back.select("l_returnflag").distinct().to_pydict()["l_returnflag"]) <= {
            "A", "N", "R"
        }

        c = os.path.join(tmp, "out_csv")
        dd.limit(100).select("l_orderkey", "l_quantity").write_csv(c, write_mode="overwrite")
        back_csv = daft_spark.read_csv(c, spark=spark)
        assert back_csv.count_rows() == 100

        jpath = os.path.join(tmp, "out_json")
        dd.limit(50).select("l_orderkey", "l_returnflag").write_json(jpath, write_mode="overwrite")
        back_json = daft_spark.read_json(jpath, spark=spark)
        assert back_json.count_rows() == 50


def test_from_constructors(spark):
    import daft_spark

    df = daft_spark.from_pydict({"a": [1, 2, 3], "b": ["x", "y", "z"]}, spark=spark)
    assert df.count_rows() == 3
    assert df.sort("a", desc=True).to_pydict()["a"] == [3, 2, 1]
    r = daft_spark.range(10, spark=None) if False else daft_spark.range(10)
    assert r.count_rows() == 10


def test_set_ops_and_sample(spark, dd):
    a = dd.select("l_orderkey").distinct()
    b = dd.where(F.col("l_quantity") > 25).select("l_orderkey").distinct()
    assert a.intersect(b).count_rows() == b.count_rows()
    assert a.except_distinct(b).count_rows() == a.count_rows() - b.count_rows()
    s = dd.sample(0.1, seed=1)
    assert 0 < s.count_rows() < dd.count_rows()


def test_shuffle_repartition(spark, dd):
    assert dd.repartition(4).to_spark().rdd.getNumPartitions() == 4
    assert dd.into_partitions(2).to_spark().rdd.getNumPartitions() <= 2
    assert dd.shuffle(seed=7).count_rows() == dd.count_rows()


def test_dataframe_lakehouse_write_methods(spark, tmp_path):
    """DataFrame-level write_deltalake/write_iceberg/write_hudi parity
    (reference dataframe.py:1330-1767) through the pure-python paths."""
    import daft_spark
    from daft_spark.io.hudi import read_hudi_py
    from daft_spark.io.iceberg import read_iceberg_py
    from daft_spark.io.lakehouse import read_deltalake

    e = daft_spark.read_parquet(f"{SF_DIR}/nation.parquet", spark=spark)
    for fmt, reader in (
        ("delta", lambda p: read_deltalake(p, spark)),
        ("iceberg", lambda p: read_iceberg_py(p, spark)),
        ("hudi", lambda p: read_hudi_py(p, spark)),
    ):
        path = str(tmp_path / fmt)
        getattr(e, f"write_{'deltalake' if fmt == 'delta' else fmt}")(path)
        assert reader(path).count() == 25


def test_async_func_udf(spark):
    """@func over an async def (reference 'Async row-wise' mode):
    rows of each Arrow batch run concurrently on one event loop,
    bounded by max_concurrency; results align 1:1. max_concurrency on
    a sync function raises (the reference contract)."""
    import pytest

    from daft_spark.udf import func

    @func(return_dtype="long", max_concurrency=8)
    async def slow_double(x):
        import asyncio

        await asyncio.sleep(0.001)
        return x * 2

    df = spark.range(50).select(F.col("id"), slow_double(F.col("id")).alias("d"))
    rows = {r["id"]: r["d"] for r in df.collect()}
    assert rows == {i: 2 * i for i in range(50)}

    with pytest.raises(ValueError, match="only valid for async"):

        @func(return_dtype="long", max_concurrency=4)
        def sync_fn(x):
            return x


def test_operators_package_surface():
    """daft_spark.operators re-exports the whole pipeline toolkit — the
    documented one-import surface for the training-data operators."""
    from daft_spark import operators as O

    for name in [
        "join_asof", "skip_existing", "checkpointed_write",
        "connected_components", "duplicate_clusters",
        "exact_dedup", "minhash_signatures", "minhash_near_dups",
        "simhash_signatures", "simhash_near_dups", "jaccard_pairs",
        "containment_pairs", "duplicated_span_stats",
        "remove_duplicated_spans", "near_dup_resolve",
        "benchmark_contamination",
        "bigram_lm_scores", "perplexity_buckets",
        "ngram_repetition_fractions",
        "stratified_sample", "token_budget_select", "pack_sequences",
        "hash_split", "mixture_weights", "shard",
        "cosine_similarity", "cosine_distance", "topk_cosine_bruteforce",
        "topk_cosine_lsh", "topk_cosine_ivf", "ivf_train", "ivf_assign",
        "pairs_above_threshold", "embedding_near_dups", "semdedup",
    ]:
        assert callable(getattr(O, name)), name
