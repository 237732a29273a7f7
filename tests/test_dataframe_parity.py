"""DataFrame method-surface parity with the reference class, plus
behavior checks for the round-5 additions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import daft_spark
from daft_spark.dataframe import DataFrame


def test_every_reference_dataframe_method_resolves():
    import re

    src = open("/root/reference/daft/dataframe/dataframe.py").read()
    names = sorted(
        set(re.findall(r"\n    def ([a-z][a-z0-9_]*)\(", src))
        | set(re.findall(r"\n    @property\n    def ([a-z][a-z0-9_]*)\(", src))
    )
    missing = [n for n in names if not hasattr(DataFrame, n)]
    assert not missing, missing


@pytest.fixture()
def df(spark):
    base = daft_spark.from_pydict(
        {
            "k": ["a", "a", "b", "b", "b"],
            "v": [1.0, 2.0, 3.0, 4.0, None],
            "n": [10, 20, 30, 40, 50],
            "arr": [[1], [2, 3], [], [4], [5]],
        }
    )
    # inject a real NaN in-plan (arrow ingestion folds python NaN to null)
    return DataFrame(
        base._sdf.withColumn(
            "v", F.when(F.col("n") == 40, F.acos(F.lit(2.0))).otherwise(F.col("v"))
        )
    )


def test_whole_frame_agg_family(df):
    row = df.count("k", "v").to_pylist()[0]
    assert row == {"k": 5, "v": 4}  # count skips nulls, counts NaN
    assert df.count_distinct("k").to_pylist()[0]["k"] == 2
    assert df.sum("n").to_pylist()[0]["n"] == 150
    # product is exp-sum-log (distributable) — float-exact only to ~1e-9 rel
    assert abs(df.product("n").to_pylist()[0]["n"] - 12_000_000) < 1.0
    assert abs(df.var("n").to_pylist()[0]["n"] - 250.0) < 1e-9
    assert sorted(df.agg_set("k").to_pylist()[0]["k"]) == ["a", "b"]
    assert sorted(df.agg_concat("arr").to_pylist()[0]["arr"]) == [1, 2, 3, 4, 5]
    joined = df.string_agg("k", sep="|").to_pylist()[0]["k"]
    assert sorted(joined.split("|")) == ["a", "a", "b", "b", "b"]


def test_drop_null_and_drop_nan(df):
    assert df.drop_null("v").count_rows() == 4  # null dropped, NaN kept
    assert df.drop_nan("v").count_rows() == 4   # NaN dropped, null kept
    assert df.drop_nan("v").drop_null("v").count_rows() == 3


def test_map_groups_and_into_batches(df, spark):
    def top_n(pdf):
        return pdf.nlargest(1, "n")[["k", "n"]]

    out = df.map_groups(top_n, "k string, n long", group_by="k").to_spark()
    assert sorted((r["k"], r["n"]) for r in out.collect()) == [("a", 20), ("b", 50)]
    # into_batches bounds the Arrow batch size every downstream batch
    # UDF sees; the observer runs executor-side, so it RETURNS the
    # sizes as data
    import pyarrow as pa

    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        big = daft_spark.range(1000).into_batches(64)

        def batch_sizes(batches):
            for b in batches:
                yield pa.RecordBatch.from_pydict({"sz": [b.num_rows]})

        got = big._sdf.mapInArrow(batch_sizes, "sz long").collect()
        assert got and max(r["sz"] for r in got) <= 64
        assert sum(r["sz"] for r in got) == 1000
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prior)


def test_union_all_by_name_and_columns(df):
    doubled = df.union_all_by_name(df)
    assert doubled.count_rows() == 10
    assert [str(c) for c in df.columns]  # Column objects
    assert df.column_names == ["k", "v", "n", "arr"]


def test_skip_existing_method(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    first = daft_spark.range(10)
    first.to_spark().write.parquet(out)
    remaining = daft_spark.range(15).skip_existing(out, ["id"])
    assert remaining.count_rows() == 5


def test_runtime_and_storage_surfaces(df):
    assert df.num_partitions() >= 1
    assert "application_id" in df.metrics()
    assert df.skipped_corrupt_files is None
    assert df.set_storage_option("fs.test.option", "1") is df
    batches = list(df.to_arrow_iter())
    assert sum(b.num_rows for b in batches) == 5


def test_gated_bridges(df):
    with pytest.raises(ImportError, match="torch"):
        df.to_torch_dataloader()
    with pytest.raises(ImportError, match="dask"):
        df.to_dask_dataframe()
    with pytest.raises(ImportError, match="ray"):
        df.to_ray_dataset()
    with pytest.raises(NotImplementedError, match="huggingface_hub"):
        df.write_huggingface("org/repo")


def test_grouped_dataframe_parity_and_values(spark, df):
    import re

    from daft_spark.dataframe import GroupedDataFrame

    src = open("/root/reference/daft/dataframe/dataframe.py").read()
    m = re.search(r"class GroupedDataFrame[^\n]*:(.*?)(\nclass |\Z)", src, re.S)
    names = sorted(set(re.findall(r"\n    def ([a-z][a-z0-9_]*)\(", m.group(1))))
    missing = [n for n in names if not hasattr(GroupedDataFrame, n)]
    assert not missing, missing

    g = df.groupby("k")
    got = {r["k"]: r["n"] for r in g.count_distinct("n").to_pylist()}
    assert got == {"a": 2, "b": 3}
    sets = {r["k"]: sorted(r["n"]) for r in g.list_agg_distinct("n").to_pylist()}
    assert sets == {"a": [10, 20], "b": [30, 40, 50]}
    var = {r["k"]: r["n"] for r in g.var("n").to_pylist()}
    assert abs(var["a"] - 50.0) < 1e-9
