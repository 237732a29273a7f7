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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# streaming operators — the continuous upgrades of the batch suite.
# Each is a plain DataFrame->DataFrame transform, so it composes with
# any readStream source and writeStream sink; watermarks bound state.


def windowed_counts_stream(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time aggregation with late-data
    handling: rows later than ``watermark`` behind the max seen event
    time are dropped and their window state finalized — the streaming
    upgrade of the batch groupBy-time-bucket aggregations."""
    keys = [F.window(F.col(ts_col), window, slide or window)]
    keys += [F.col(c) for c in (group_cols or [])]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_cols or []),
            "n",
            "sum_value",
        )
    )


def sessionize_stream(
    df: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time session windows (gap-based), the streaming counterpart
    of the batch w_sessionize query (operators/window session logic) —
    F.session_window keeps per-user open sessions as bounded state and
    emits each session once its gap expires past the watermark."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    bounded by the watermark (a key older than the watermark can never
    collide again, so its state is dropped) — the continuous upgrade of
    operators/dedup.exact_dedup. Uses dropDuplicatesWithinWatermark so
    two arrivals with DIFFERENT event times but the same key still
    dedup, the semantics a training-data ingest pipeline wants."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def running_stats_stream(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running count/sum/min/max maintained across micro-batches in
    explicit GroupState — the pattern for stateful logic that windowed
    aggregation can't express. Emits the updated totals for each key
    touched by a micro-batch (output mode: update)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("n", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("min_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("min_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s, mn, mx = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                n += len(vals)
                s += float(vals.sum())
                mn = float(vals.min()) if mn is None else min(mn, float(vals.min()))
                mx = float(vals.max()) if mx is None else max(mx, float(vals.max()))
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            [{"key": key[0], "n": n, "sum_value": s, "min_value": mn, "max_value": mx}]
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_available_now(stream_df: DataFrame, sink_table: str, output_mode: str, timeout: int = 120) -> None:
    """Drain everything currently available through the streaming plan
    into an in-memory sink table, then stop — the deterministic
    'process the backlog now' trigger used by tests and by batch-catchup
    deployments of the continuous pipelines."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout):
            raise TimeoutError(f"stream into {sink_table} did not drain in {timeout}s")
    finally:
        q.stop()


def write_stream_delta(
    df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    app_id: str | None = None,
    partition_by: list[str] | None = None,
    trigger_seconds: int | None = None,
    available_now: bool = False,
):
    """Streaming ingestion into a Delta table with EXACTLY-ONCE appends:
    each micro-batch commits through the pure-Python Delta writer
    stamped with a ``txn`` (appId, batchId) transaction identifier
    (PROTOCOL.md "Transaction Identifiers"), so a replayed batch after
    a crash/restart is recognized in the log and skipped — the same
    idempotence contract delta-spark's streaming sink implements. State
    about processed offsets lives in Spark's own checkpoint; state
    about committed batches lives in the table log; either alone is
    enough to prevent duplicates.

    Returns the started StreamingQuery. At 100 TB this is the standard
    stream-to-lakehouse shape: micro-batch appends are one atomic
    commit each, readers always see full batches, and the table stays
    time-travelable per batch."""
    from daft_spark.io.delta import write_deltalake_py

    app = app_id or f"daft_spark-stream-{os.path.basename(table_path.rstrip('/'))}"
    parts = list(partition_by or [])

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_deltalake_py(
            batch_df, table_path, mode="append",
            partition_by=parts, txn=(app, int(batch_id)),
        )

    w = (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def write_stream_iceberg(
    df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    app_id: str | None = None,
    partition_by: list[str] | None = None,
    trigger_seconds: int | None = None,
    available_now: bool = False,
):
    """Streaming ingestion into an ICEBERG table with EXACTLY-ONCE
    appends — the counterpart of write_stream_delta for the other lake
    format. Delta records idempotence in first-class ``txn`` actions;
    here each micro-batch commit updates the table property
    ``daft-spark.streaming.<app>.max-batch-id`` in the same metadata
    publish as its snapshot (O(1) to read, survives snapshot
    expiration) and also stamps the snapshot summary with
    ``streaming-app-id``/``streaming-batch-id`` (Spark's Iceberg sink
    convention, kept as provenance + legacy fallback); a replayed batch
    after crash/restart is recognized and skipped. Offsets live in
    Spark's checkpoint; committed-batch identity lives in the table
    metadata; either alone prevents duplicates.

    Returns the started StreamingQuery. Same 100 TB shape as the Delta
    sink: one atomic snapshot per micro-batch, readers see whole
    batches, per-batch time travel free."""
    from daft_spark.io.iceberg import (
        last_streaming_batch_iceberg,
        write_iceberg_py,
    )

    app = app_id or f"daft_spark-stream-{os.path.basename(table_path.rstrip('/'))}"
    parts = list(partition_by or [])

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            if last_streaming_batch_iceberg(table_path, app) >= int(batch_id):
                return  # replayed micro-batch, already committed
        except FileNotFoundError:
            pass  # table does not exist yet — first batch creates it
        write_iceberg_py(
            batch_df, table_path, mode="append",
            partition_by=parts or None,
            summary_props={
                "streaming-app-id": app,
                "streaming-batch-id": str(int(batch_id)),
            },
            # idempotence record that SURVIVES snapshot expiration and
            # reads O(1) — updated atomically with the snapshot commit
            set_properties={
                f"daft-spark.streaming.{app}.max-batch-id": str(int(batch_id)),
            },
        )

    w = (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()
