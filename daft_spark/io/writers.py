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
    """reference write_sql (dataframe.py:911) via JDBC; ``sqlite://``
    URLs take the pure-Python path (io/sqldb.py)."""
    from daft_spark.io.sqldb import db_path_from_url, write_sqlite

    sqlite_path = db_path_from_url(url)
    if sqlite_path is not None:
        write_sqlite(df, table, sqlite_path, mode=write_mode)
        return
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(write_mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def write_deltalake(df: DataFrame, path: str, write_mode: str = "append",
                    partition_by: list[str] | None = None) -> None:
    """reference write_deltalake (dataframe.py:1767). Uses the
    delta-spark connector when it is on the classpath; otherwise falls
    back to the pure-Python Delta transaction writer (daft_spark.io.
    delta — full log + checkpoint + hive-partition semantics for local
    tables)."""
    try:
        w = df.write.format("delta").mode(write_mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(path)
    except Exception as e:
        msg = str(e)
        if not ("Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg or "ClassNotFound" in msg):
            raise
        from daft_spark.io.delta import write_deltalake_py

        write_deltalake_py(df, path, mode=write_mode, partition_by=partition_by)


def write_iceberg(df: DataFrame, table: str, write_mode: str = "append",
                  partition_by: list[str] | None = None,
                  sort_by: list[str] | None = None) -> None:
    """reference write_iceberg (dataframe.py:1330). A catalog table name
    goes through the session's Iceberg catalog (writeTo); a filesystem
    path (absolute, or an existing metadata/ dir) goes through the
    pure-Python v2 commit writer (daft_spark.io.iceberg)."""
    import os

    if os.path.isabs(table) or os.path.isdir(os.path.join(table, "metadata")):
        from daft_spark.io.iceberg import write_iceberg_py

        write_iceberg_py(
            df, table, mode=write_mode, partition_by=partition_by, sort_by=sort_by
        )
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

# ---------------------------------------------------------------------------
# specialty push sinks (reference dataframe.py:2499 write_turbopuffer,
# :2548 write_clickhouse, :2630 write_bigtable). Each is the
# foreachPartition pattern: executors open their own client (never the
# driver's), stream the partition in bounded batches, and close. The
# client libraries are not in this container, so the import is probed
# on the DRIVER first (clean ImportError naming the package) and the
# executor-side code takes a picklable sink factory — which is also the
# test seam (a file-backed fake exercises the batching/rename plumbing).


def _batched_push(df: DataFrame, make_sink, transform_row, batch_size: int) -> None:
    """Executor loop shared by the push sinks: one sink per partition,
    rows transformed then flushed in ``batch_size`` batches."""

    def run(rows) -> None:
        sink = make_sink()
        batch = []
        try:
            for row in rows:
                batch.append(transform_row(row))
                if len(batch) >= batch_size:
                    sink.write_batch(batch)
                    batch = []
            if batch:
                sink.write_batch(batch)
        finally:
            close = getattr(sink, "close", None)
            if close is not None:
                close()

    df.foreachPartition(run)


def write_turbopuffer(
    df: DataFrame,
    namespace: str,
    api_key: str | None = None,
    region: str | None = None,
    distance_metric: str | None = None,
    schema: dict | None = None,
    id_column: str | None = None,
    vector_column: str | None = None,
    client_kwargs: dict | None = None,
    write_kwargs: dict | None = None,
    batch_size: int = 1000,
    sink_factory=None,
) -> None:
    """reference write_turbopuffer (dataframe.py:2499): each row becomes
    a document; ``id_column``/``vector_column`` are renamed to the
    required ``id``/``vector`` fields, every other column is an
    attribute. ``sink_factory`` overrides the client (tests/custom)."""
    if sink_factory is None:
        try:
            import turbopuffer  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "write_turbopuffer requires the 'turbopuffer' package"
            ) from e

        def sink_factory():  # pragma: no cover - needs the real service
            import turbopuffer

            tpuf = turbopuffer.Turbopuffer(
                api_key=api_key, region=region, **(client_kwargs or {})
            )
            ns = tpuf.namespace(namespace)
            kw = dict(write_kwargs or {})
            if distance_metric:
                kw["distance_metric"] = distance_metric
            if schema:
                kw["schema"] = schema

            class _S:
                def write_batch(self, docs):
                    ns.write(upsert_rows=docs, **kw)

            return _S()

    def to_doc(row):
        d = row.asDict(recursive=True)
        if id_column and id_column != "id":
            d["id"] = d.pop(id_column)
        if "id" not in d:
            raise ValueError("write_turbopuffer requires an 'id' column (or id_column)")
        if vector_column and vector_column != "vector":
            d["vector"] = d.pop(vector_column)
        return d

    _batched_push(df, sink_factory, to_doc, batch_size)


def write_clickhouse(
    df: DataFrame,
    table: str,
    *,
    host: str = "localhost",
    port: int | None = None,
    user: str | None = None,
    password: str | None = None,
    database: str | None = None,
    client_kwargs: dict | None = None,
    write_kwargs: dict | None = None,
    batch_size: int = 10000,
    sink_factory=None,
) -> None:
    """reference write_clickhouse (dataframe.py:2548): batched INSERTs
    through clickhouse-connect, one client per partition. (A JDBC path
    also exists: write_sql with a ClickHouse JDBC URL.)"""
    columns = df.columns
    if sink_factory is None:
        try:
            import clickhouse_connect  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "write_clickhouse requires the 'clickhouse-connect' package "
                "(or use write_sql with a ClickHouse JDBC driver)"
            ) from e

        def sink_factory():  # pragma: no cover - needs the real service
            import clickhouse_connect

            client = clickhouse_connect.get_client(
                host=host, port=port, username=user, password=password,
                database=database, **(client_kwargs or {})
            )

            class _S:
                def write_batch(self, rows):
                    client.insert(
                        table, rows, column_names=columns, **(write_kwargs or {})
                    )

                def close(self):
                    client.close()

            return _S()

    _batched_push(df, sink_factory, lambda row: list(row), batch_size)


def write_bigtable(
    df: DataFrame,
    project_id: str,
    instance_id: str,
    table_id: str,
    row_key_column: str,
    column_family_mappings: dict[str, str],
    client_kwargs: dict | None = None,
    write_kwargs: dict | None = None,
    serialize_incompatible_types: bool = True,
    batch_size: int = 1000,
    sink_factory=None,
) -> None:
    """reference write_bigtable (dataframe.py:2630): each row becomes a
    Bigtable mutation keyed by ``row_key_column``; every other column
    must map to a column family. Non-bytes values are JSON-serialized
    when ``serialize_incompatible_types`` (the reference default)."""
    missing = [
        c for c in df.columns if c != row_key_column and c not in column_family_mappings
    ]
    if missing:
        raise ValueError(
            f"columns {missing} have no column_family_mappings entry"
        )
    if sink_factory is None:
        try:
            from google.cloud import bigtable  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "write_bigtable requires the 'google-cloud-bigtable' package"
            ) from e

        def sink_factory():  # pragma: no cover - needs the real service
            from google.cloud import bigtable

            client = bigtable.Client(project=project_id, admin=False, **(client_kwargs or {}))
            tbl = client.instance(instance_id).table(table_id)

            class _S:
                def write_batch(self, muts):
                    rows = []
                    for key, cells in muts:
                        r = tbl.direct_row(key)
                        for (fam, col), val in cells.items():
                            r.set_cell(fam, col, val)
                        rows.append(r)
                    tbl.mutate_rows(rows, **(write_kwargs or {}))

                def close(self):
                    client.close()

            return _S()

    def to_mutation(row):
        import json as _json

        d = row.asDict(recursive=True)
        key = d.pop(row_key_column)
        key = key if isinstance(key, (bytes, str)) else str(key)
        cells = {}
        for col, val in d.items():
            if not isinstance(val, (bytes, str)):
                if not serialize_incompatible_types:
                    raise TypeError(
                        f"column {col!r} value {type(val).__name__} is not "
                        "bytes/str and serialize_incompatible_types=False"
                    )
                val = _json.dumps(val, default=str)
            cells[(column_family_mappings[col], col)] = val
        return (key, cells)

    _batched_push(df, sink_factory, to_mutation, batch_size)
