"""Writers — parity with the reference's write surface (reference:
``daft/dataframe/dataframe.py:1018-2630``; Rust impls
``src/daft-writers/``). All delegate to ``df.write`` so partitioned
layout, task-parallel writes, and commit protocols are Spark's own.

write_mode mapping (reference dataframe.py:1024-1067):
  append -> mode("append"); overwrite -> mode("overwrite");
  overwrite-partitions -> dynamic partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _writer(df: DataFrame, partition_cols, write_mode: str):
    w = df.write
    if write_mode == "overwrite-partitions":
        w = w.option("partitionOverwriteMode", "dynamic").mode("overwrite")
    else:
        w = w.mode(write_mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    return w


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols=None,
    write_mode: str = "append",
    compression: str = "snappy",
) -> None:
    """reference write_parquet (dataframe.py:1018). ``single_file`` has
    no distributed equivalent — coalesce(1) before calling if needed."""
    _writer(df, partition_cols, write_mode).option("compression", compression).parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    partition_cols=None,
    write_mode: str = "append",
    header: bool = True,
    delimiter: str = ",",
) -> None:
    """reference write_csv (dataframe.py:1113)."""
    (
        _writer(df, partition_cols, write_mode)
        .option("header", header)
        .option("sep", delimiter)
        .csv(path)
    )


def write_json(df: DataFrame, path: str, write_mode: str = "append") -> None:
    """reference write_json (dataframe.py:1229) — line-delimited."""
    _writer(df, None, write_mode).json(path)


def write_sql(df: DataFrame, table: str, url: str, write_mode: str = "append", **options) -> None:
    """reference write_sql (dataframe.py:911) via JDBC."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(write_mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def write_deltalake(df: DataFrame, path: str, write_mode: str = "append") -> None:
    """reference write_deltalake (dataframe.py:1767). Uses the
    delta-spark connector when it is on the classpath; otherwise falls
    back to the pure-Python Delta transaction writer
    (daft_spark.io.delta — full log semantics for non-partitioned
    local tables)."""
    try:
        df.write.format("delta").mode(write_mode).save(path)
    except Exception as e:
        msg = str(e)
        if not ("Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg or "ClassNotFound" in msg):
            raise
        from daft_spark.io.delta import write_deltalake_py

        write_deltalake_py(df, path, mode=write_mode)


def write_iceberg(df: DataFrame, table: str, write_mode: str = "append") -> None:
    """reference write_iceberg (dataframe.py:1330). A catalog table name
    goes through the session's Iceberg catalog (writeTo); a filesystem
    path (absolute, or an existing metadata/ dir) goes through the
    pure-Python v2 commit writer (daft_spark.io.iceberg)."""
    import os

    if os.path.isabs(table) or os.path.isdir(os.path.join(table, "metadata")):
        from daft_spark.io.iceberg import write_iceberg_py

        write_iceberg_py(df, table, mode=write_mode)
        return
    if write_mode == "append":
        df.writeTo(table).append()
    else:
        df.writeTo(table).overwritePartitions()


def write_lance(df: DataFrame, path: str, **_opts) -> None:
    """reference write_lance (dataframe.py:2298). The Lance Spark
    connector is not bundled in this environment."""
    raise NotImplementedError(
        "write_lance requires the Lance Spark connector (com.lancedb:lance-spark)"
    )


def write_sink(df: DataFrame, sink_fn, batch_size: int | None = None) -> None:
    """Custom sink (reference DataSink API, daft/io/sink.py;
    write_sink dataframe.py:2267): sink_fn(iterator_of_rows) runs once
    per partition on executors — the foreachPartition contract. Used for
    turbopuffer/clickhouse/bigtable-style push sinks."""
    df.foreachPartition(sink_fn)
