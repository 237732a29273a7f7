"""daft_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Eventual-Inc/Daft reference,
re-expressed Spark-first (SURVEY.md is the blueprint).

Top-level surface mirrors ``daft``'s: readers, from_* constructors,
col/lit, sql, DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql.functions import col, lit

from daft_spark.context import configure, get_or_create
from daft_spark.dataframe import DataFrame, GroupedDataFrame
from daft_spark.sql import Catalog, Identifier, Session, Table, session, sql, sql_expr

__version__ = "0.1.0"


def _wrap(sdf) -> DataFrame:
    return DataFrame(sdf)


def read_parquet(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_parquet as _rp

    return _wrap(_rp(path, **kw))


def read_csv(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_csv as _rc

    return _wrap(_rc(path, **kw))


def read_json(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_json as _rj

    return _wrap(_rj(path, **kw))


def read_text(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_text as _rt

    return _wrap(_rt(path, **kw))


def read_sql(query, url, **kw) -> DataFrame:
    from daft_spark.io.readers import read_sql as _rs

    return _wrap(_rs(query, url, **kw))


def read_kafka(bootstrap_servers, topic, **kw) -> DataFrame:
    from daft_spark.io.readers import read_kafka as _rk

    return _wrap(_rk(bootstrap_servers, topic, **kw))


def read_warc(path, **kw) -> DataFrame:
    from daft_spark.io.warc import read_warc as _rw

    return _wrap(_rw(path, **kw))


def read_deltalake(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_deltalake as _rd

    return _wrap(_rd(path, **kw))


def read_iceberg(table, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_iceberg as _ri

    return _wrap(_ri(table, **kw))


def read_hudi(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_hudi as _rh

    return _wrap(_rh(path, **kw))


def read_lance(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_lance as _rl

    return _wrap(_rl(path, **kw))


def read_huggingface(repo, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_huggingface as _rhf

    return _wrap(_rhf(repo, **kw))


def read_mcap(path, **kw) -> DataFrame:
    from daft_spark.io.mcap import read_mcap as _rm

    return _wrap(_rm(path, **kw))


def from_pydict(data, **kw) -> DataFrame:
    from daft_spark.io.readers import from_pydict as _fp

    return _wrap(_fp(data, **kw))


def from_pandas(pdf, **kw) -> DataFrame:
    from daft_spark.io.readers import from_pandas as _fp

    return _wrap(_fp(pdf, **kw))


def from_arrow(tbl, **kw) -> DataFrame:
    from daft_spark.io.readers import from_arrow as _fa

    return _wrap(_fa(tbl, **kw))


def from_glob_path(pattern, **kw) -> DataFrame:
    from daft_spark.io.readers import from_glob_path as _fg

    return _wrap(_fg(pattern, **kw))


def range(start, end=None, step: int = 1, partitions=None) -> DataFrame:  # noqa: A001
    """Python-range semantics (reference daft/io/_range.py):
    ``range(5)`` -> 0..4, ``range(2, 10)`` -> 2..9."""
    from daft_spark.io.readers import range_

    if end is None:
        start, end = 0, start
    return _wrap(range_(start, end, step, partitions))


__all__ = [
    "Catalog",
    "Column",
    "DataFrame",
    "GroupedDataFrame",
    "Identifier",
    "Session",
    "Table",
    "session",
    "col",
    "configure",
    "from_arrow",
    "from_glob_path",
    "from_pandas",
    "from_pydict",
    "get_or_create",
    "lit",
    "range",
    "read_csv",
    "read_deltalake",
    "read_hudi",
    "read_huggingface",
    "read_iceberg",
    "read_json",
    "read_kafka",
    "read_lance",
    "read_mcap",
    "read_parquet",
    "read_sql",
    "read_text",
    "read_warc",
    "sql",
    "sql_expr",
]
