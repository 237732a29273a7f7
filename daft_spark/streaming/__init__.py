"""Streaming surface.

The reference has NO stateful streaming: its only stream-ish source is
bounded Kafka ("no streaming/unbounded mode",
``daft/io/_kafka.py:571-575``), and its "streaming" is pipelined batch
execution (SURVEY §2.8). Batch parity therefore needs nothing here.

Structured Streaming is Spark's free extension beyond the reference;
these helpers expose the natural upgrade path so the bounded-Kafka
pipelines can become continuous without rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from daft_spark.context import get_or_create


def read_kafka_stream(
    bootstrap_servers: str,
    topic: str,
    spark: SparkSession | None = None,
    starting_offsets: str = "latest",
    **options,
) -> DataFrame:
    """Unbounded counterpart of io.readers.read_kafka — same options,
    readStream instead of read. Requires the spark-sql-kafka package."""
    spark = spark or get_or_create()
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_files_stream(
    path: str,
    file_format: str = "parquet",
    schema=None,
    spark: SparkSession | None = None,
    **options,
) -> DataFrame:
    """Incremental directory ingestion (new-file tailing) — the streaming
    upgrade of read_parquet/read_csv/read_json."""
    spark = spark or get_or_create()
    reader = spark.readStream.format(file_format)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint_path: str,
    trigger_seconds: int | None = None,
):
    """Exactly-once parquet sink with checkpointing."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()
