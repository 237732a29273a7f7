"""Round-3 fix verification: ADVICE items (null-axis global windows,
Column-valued join keys, literal-aware SQL table functions) and the
MinHash permutation independence fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_global_running_null_axis_rows(spark):
    """Null AXIS values must not be dropped by the bucket join nor
    inflate other buckets' offsets — they get explicit bucket 0
    (nulls-first, matching Spark's asc default)."""
    from pyspark.sql import Window

    from daft_spark.operators.window_ext import global_running

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (1, 3.0), (5, 4.0), (9, 5.0), (12, 6.0)],
        "k: int, v: double",
    )
    out = global_running(df, axis=F.col("k"), order_cols=["k", "v"],
                         value_col="v", num_buckets=3)
    assert out.count() == 6  # no silent drops
    w = Window.orderBy(F.col("k").asc_nulls_first(), "v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expected = df.select(
        "k", "v", F.sum("v").over(w).alias("rs"),
        F.row_number().over(Window.orderBy(F.col("k").asc_nulls_first(), "v")).alias("rn"),
    )
    got = {(r["k"], r["v"]): (r["global_run_sum"], r["global_rn"]) for r in out.collect()}
    for r in expected.collect():
        g = got[(r["k"], r["v"])]
        assert abs(g[0] - r["rs"]) < 1e-9 and g[1] == r["rn"], (r, g)


def test_global_running_all_null_axis(spark):
    from daft_spark.operators.window_ext import global_running

    df = spark.createDataFrame([(None, 1.0), (None, 2.0)], "k: int, v: double")
    out = {r["v"]: (r["global_run_sum"], r["global_rn"])
           for r in global_running(df, axis=F.col("k"), order_cols=["k", "v"],
                                   value_col="v", num_buckets=3).collect()}
    assert out == {1.0: (1.0, 1), 2.0: (3.0, 2)}


def test_join_column_valued_keys_no_rename(spark):
    """Column-valued left_on/right_on with overlapping non-key columns
    must not rename the right side out from under the bound Columns."""
    import daft_spark as ds

    a = ds.DataFrame(spark.createDataFrame([(1, "x"), (2, "y")], "k: int, payload: string"))
    b_sdf = spark.createDataFrame([(1, "p"), (3, "q")], "k: int, payload: string")
    b = ds.DataFrame(b_sdf)
    out = a.join(b, left_on=a._sdf["k"], right_on=b_sdf["k"], how="inner")
    rows = out.to_spark().collect()
    assert len(rows) == 1 and rows[0][0] == 1

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        a.join(b, left_on=a._sdf["k"], right_on=b_sdf["k"], suffix="_r")

def test_sql_table_fn_skips_literals_and_comments(spark):
    from daft_spark.sql import _expand_table_functions

    q = "SELECT 'use read_parquet(''/x.parquet'') here' AS s"
    assert _expand_table_functions(q, spark) == q

    q2 = (f"SELECT count(*) AS n FROM read_parquet('{SF_DIR}/region.parquet') "
          "-- read_csv('/nope.csv')\n")
    out = _expand_table_functions(q2, spark)
    assert "__daft_tf_parquet" in out and "read_csv('/nope.csv')" in out
    assert spark.sql(out).collect()[0]["n"] == 5

    q3 = "/* read_text('/no.txt') */ SELECT 1 AS one"
    assert _expand_table_functions(q3, spark) == q3


def test_sql_table_fn_multiple_calls(spark):
    from daft_spark.sql import _expand_table_functions

    q = (f"SELECT (SELECT count(*) FROM read_parquet('{SF_DIR}/region.parquet'))"
         f" + (SELECT count(*) FROM read_parquet('{SF_DIR}/nation.parquet')) AS n")
    assert spark.sql(_expand_table_functions(q, spark)).collect()[0]["n"] == 30


def test_minhash_permutations_independent(spark):
    """Regression for the correlated-permutation bug: two docs must be
    able to share SOME but not all band buckets — with the broken
    (no modulus) permutations every signature was a function of the
    single min shingle hash, so bucket sharing was all-or-nothing."""
    from daft_spark.io.readers import load_table
    from daft_spark.operators.dedup import minhash_signatures

    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 100)
    sig = minhash_signatures(d, "text", "doc_id", num_hashes=16).collect()
    by_id = {r["__id"]: [r[f"__m{i}"] for i in range(16)] for r in sig}
    ids = sorted(by_id)
    # across all pairs, count per-coordinate agreement; independence
    # means partial agreement must exist for at least one near-dup pair
    partials = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            eq = sum(a == b for a, b in zip(by_id[ids[i]], by_id[ids[j]]))
            if 0 < eq < 16:
                partials += 1
    assert partials > 0


def test_two_stage_udaf_shuffles_states_not_rows(spark):
    """The two-stage UDAF plan must pre-aggregate INSIDE the scan stage:
    MapInPandas sits below the Exchange, FlatMapGroupsInPandas above it
    — the shuffle moves per-batch states, not input rows."""
    import pandas as pd

    from daft_spark.udf import two_stage_udaf

    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )

    def map_partial(pdf):
        g = pdf.groupby("k", as_index=False).agg(s=("v", "sum"), n=("v", "size"))
        return g

    def reduce_final(key, pdf):
        return pd.DataFrame({"k": [key[0]], "mean_v": [pdf["s"].sum() / pdf["n"].sum()]})

    agg = two_stage_udaf(["k"], "k bigint, s double, n bigint",
                         "k bigint, mean_v double", map_partial, reduce_final)
    out = agg(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    i_map = min(i for i, ln in enumerate(lines) if "MapInPandas" in ln)
    i_ex = min(i for i, ln in enumerate(lines) if "Exchange" in ln)
    i_red = min(i for i, ln in enumerate(lines) if "FlatMapGroupsInPandas" in ln)
    assert i_red < i_ex < i_map, plan  # top-down: reducer above exchange above map
    rows = {r["k"]: r["mean_v"] for r in out.collect()}
    import math
    for k in range(7):
        vals = [v for v in range(10_000) if v % 7 == k]
        assert math.isclose(rows[k], sum(vals) / len(vals))


class TestProviderRegistry:
    """API parity with the reference provider protocol
    (daft/ai/provider.py): registry names, Provider ABC surface, clean
    import gates for absent runtimes."""

    def test_load_provider_surface(self):
        import inspect

        from daft_spark.multimodal.provider import Provider, load_provider

        sig = inspect.signature(load_provider)
        assert list(sig.parameters) == ["provider", "name", "options"]
        for m in ("get_text_embedder", "get_text_classifier", "get_prompter"):
            assert hasattr(Provider, m)
        p = load_provider("deterministic")
        assert p.name == "deterministic"
        with pytest.raises(ValueError):
            load_provider("nope")

    def test_absent_runtimes_raise_cleanly(self):
        from daft_spark.multimodal.provider import ProviderImportError, load_provider

        for name in ("openai", "lm_studio", "transformers", "vllm"):
            with pytest.raises(ProviderImportError):
                load_provider(name)

    def test_unimplemented_protocol_raises(self):
        from daft_spark.multimodal.provider import DeterministicProvider

        class Thin(DeterministicProvider):
            def get_prompter(self, model=None, **options):
                raise NotImplementedError(
                    f"llm_generate is not currently implemented for the '{self.name}' provider"
                )

        with pytest.raises(NotImplementedError):
            Thin().get_prompter()

    def test_provider_kwarg_wires_through(self, spark):
        from daft_spark.multimodal.llm import classify_text, embed_text, llm_generate

        df = spark.createDataFrame([("hello world",), ("spark graft",)], "text: string")
        out = llm_generate(df, "text", provider="deterministic").collect()
        assert all(r["generation"].startswith("echo:") for r in out)
        emb = embed_text(df, "text", provider="deterministic").collect()
        assert all(len(r["embedding"]) == 16 for r in emb)
        lab = classify_text(df, "text", labels=["greeting", "tech"],
                            provider="deterministic").collect()
        assert all(r["label"] in ("greeting", "tech") for r in lab)
