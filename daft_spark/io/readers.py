"""Readers — the Spark-first equivalents of the reference's ``daft.io``
surface (reference: ``daft/io/__init__.py:21-43``; native readers
``src/daft-parquet/``, ``src/daft-csv/``, ``src/daft-json/``).

Everything delegates to ``spark.read`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning; we only add the pieces
Spark lacks (parquet TIMESTAMP(NANOS) handling, glob-path listings).
"""

from __future__ import annotations

import functools
import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.context import configure, get_or_create

# Canonical testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _session(spark: SparkSession | None) -> SparkSession:
    if spark is None:
        return get_or_create()
    return configure(spark)


@functools.lru_cache(maxsize=1024)  # footer reads are driver-side IO on
# every load_table call; schemas of a given path are treated as stable
def _ns_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized
    reader rejects them (PARQUET_TYPE_ILLEGAL), so we read them as int64
    via ``spark.sql.legacy.parquet.nanosAsLong`` and convert to
    microsecond timestamps. Inspect the first footer only: schemas are
    uniform per dataset (same assumption the reference's schema
    inference makes — ``src/daft-parquet/src/schema_inference.rs``)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
    except Exception:
        return ()
    candidates: list[str] = []
    first = path
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            return ()
        first = files[0]
    try:
        schema = pq.read_schema(first)
    except Exception:
        return ()
    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            candidates.append(field.name)
    return tuple(candidates)


def read_parquet(
    path: str | list[str],
    spark: SparkSession | None = None,
    schema=None,
    string_encoding: str = "utf-8",
    **options,
) -> DataFrame:
    """Parity: ``daft.read_parquet`` (reference: ``daft/io/_parquet.py:24``).

    Column pruning / predicate pushdown / limit pushdown (reference:
    ``src/daft-scan/src/pushdowns.rs:16-36``) are automatic in Spark's
    parquet source — verify via ``.explain``'s PushedFilters/ReadSchema.

    ``string_encoding="raw"`` (reference read_parquet_into_pyarrow's
    escape hatch for parquet whose string columns carry invalid UTF-8)
    returns every string column as BINARY with the original bytes —
    Spark stores strings as raw bytes, so the cast is lossless
    (verified against the reference's invalid_utf8.parquet fixture).
    """
    if string_encoding not in ("utf-8", "raw"):
        raise ValueError("string_encoding must be 'utf-8' or 'raw'")
    spark = _session(spark)
    paths = path if isinstance(path, list) else [path]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    df = reader.parquet(*paths)
    if string_encoding == "raw":
        df = df.select(
            *[
                F.col(f"`{c}`").cast("binary").alias(c) if t == "string" else F.col(f"`{c}`")
                for c, t in df.dtypes
            ]
        )
    # ns-timestamp repair: int64 ns -> TIMESTAMP_NTZ(us). `div` keeps the
    # arithmetic integral and JVM-side.
    for c in _ns_timestamp_columns(paths[0]):
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
            )
    return df


def read_csv(
    path: str | list[str],
    spark: SparkSession | None = None,
    schema=None,
    header: bool = True,
    infer_schema: bool = True,
    delimiter: str = ",",
    **options,
) -> DataFrame:
    """Parity: ``daft.read_csv`` (reference: ``daft/io/_csv.py:24``)."""
    spark = _session(spark)
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    if options:
        reader = reader.options(**options)
    paths = path if isinstance(path, list) else [path]
    return reader.csv(*paths)


def read_json(
    path: str | list[str],
    spark: SparkSession | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Parity: ``daft.read_json`` — line-delimited JSON (reference:
    ``daft/io/_json.py:24``, ``src/daft-json/``)."""
    spark = _session(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    paths = path if isinstance(path, list) else [path]
    return reader.json(*paths)


def read_text(path: str | list[str], spark: SparkSession | None = None) -> DataFrame:
    """Parity: ``daft.read_text`` (reference: ``daft/io/_text.py:12``).
    One row per line, column ``text`` (reference names it ``text``)."""
    spark = _session(spark)
    paths = path if isinstance(path, list) else [path]
    return spark.read.text(*paths).withColumnRenamed("value", "text")


def from_glob_path(pattern: str, spark: SparkSession | None = None) -> DataFrame:
    """Parity: ``daft.from_glob_path`` (reference: ``daft/io/file_path.py``)
    — a listing DataFrame (path, size, num_rows=null). Uses Spark's
    binaryFile source for a distributed listing (no driver-side walk)."""
    spark = _session(spark)
    df = spark.read.format("binaryFile").load(pattern)
    return df.select(
        F.col("path"),
        F.col("length").alias("size"),
        F.lit(None).cast("long").alias("num_rows"),
    )


def from_pydict(data: dict, spark: SparkSession | None = None) -> DataFrame:
    """Parity: ``daft.from_pydict`` (reference: ``daft/convert.py``)."""
    spark = _session(spark)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(data))


def from_pandas(pdf, spark: SparkSession | None = None) -> DataFrame:
    """Parity: ``daft.from_pandas`` (reference: ``daft/convert.py``)."""
    spark = _session(spark)
    return spark.createDataFrame(pdf)


def from_arrow(table, spark: SparkSession | None = None) -> DataFrame:
    """Parity: ``daft.from_arrow`` (reference: ``daft/convert.py``)."""
    spark = _session(spark)
    try:
        return spark.createDataFrame(table)  # Spark 4 accepts pa.Table
    except Exception:
        return spark.createDataFrame(table.to_pandas())


def range_(start: int, end: int | None = None, step: int = 1, partitions: int | None = None,
           spark: SparkSession | None = None) -> DataFrame:
    """Parity: ``daft.range`` (reference: ``daft/io/_range.py``) —
    Python-range semantics: ``range_(5)`` -> 0..4, ``range_(2, 10)`` -> 2..9."""
    spark = _session(spark)
    if end is None:
        start, end = 0, start
    return spark.range(start, end, step, numPartitions=partitions)


def read_sql(query_or_table: str, url: str, spark: SparkSession | None = None,
             partition_col: str | None = None, num_partitions: int | None = None,
             **options) -> DataFrame:
    """Parity: ``daft.read_sql`` (reference: ``daft/io/_sql.py:26``) via JDBC.

    The reference partitions by size (``daft/io/_sql.py``); Spark's JDBC
    source partitions by ``partitionColumn`` bounds — pass
    ``partition_col``/``num_partitions`` for a parallel read.
    ``sqlite://`` URLs take the pure-Python bounds-partitioned path
    (io/sqldb.py) — no JDBC driver needed."""
    spark = _session(spark)
    from daft_spark.io.sqldb import db_path_from_url, read_sqlite

    sqlite_path = db_path_from_url(url)
    if sqlite_path is not None:
        return read_sqlite(
            query_or_table, sqlite_path, spark,
            partition_col=partition_col, num_partitions=num_partitions,
        )
    reader = spark.read.format("jdbc").option("url", url)
    q = query_or_table.strip()
    if q.lower().startswith("select"):
        reader = reader.option("query", q)
    else:
        reader = reader.option("dbtable", q)
    if partition_col is not None:
        reader = reader.option("partitionColumn", partition_col)
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka(bootstrap_servers: str, topic: str, spark: SparkSession | None = None,
               starting_offsets: str = "earliest", ending_offsets: str = "latest",
               **options) -> DataFrame:
    """Parity: ``daft.read_kafka`` — bounded batch read only, exactly like
    the reference ("no streaming/unbounded mode",
    ``daft/io/_kafka.py:571-575``). A ``file://`` bootstrap server reads
    a file-backed topic log (io/kafka_fake.py) with identical offset
    semantics — the testable path in broker-less environments; anything
    else goes through Spark's Kafka source (requires spark-sql-kafka on
    the classpath; raises a clear error otherwise)."""
    spark = _session(spark)
    if bootstrap_servers.startswith("file://"):
        from daft_spark.io.kafka_fake import read_kafka_log

        return read_kafka_log(
            bootstrap_servers[len("file://"):], topic, spark,
            starting_offsets=starting_offsets, ending_offsets=ending_offsets,
        )
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


# ---------------------------------------------------------------------------
# Testdata helpers (TESTDATA.md star schema)
# ---------------------------------------------------------------------------

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table, normalizing ns timestamps."""
    return read_parquet(os.path.join(sf_dir, f"{name}.parquet"), spark=spark)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register the testdata tables as temp views for ``spark.sql``."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
