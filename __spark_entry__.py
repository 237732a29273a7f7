"""Driver contract for the spark-graft builder (PySpark target).

Exposes the `daft_spark` query registry: every implemented operator from
SURVEY.md §2 has a named query in ``queries()`` and (where
SQL-expressible) a DuckDB oracle in ``oracle_sql()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    from daft_spark.context import configure
    from daft_spark.queries import all_queries

    configure(spark)
    return all_queries()["tpch_q1"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from daft_spark.context import configure
    from daft_spark.queries import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in all_queries().items():
        def fn(spark: SparkSession, sf_dir: str, _spec=spec) -> DataFrame:
            configure(spark)
            return _spec.spark_fn(spark, sf_dir)

        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from daft_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
