"""IO-format roundtrip queries — exercise the csv/json writers+readers
and the pure-Python WARC and MCAP parsers end-to-end under the driver's
correctness gate (same pattern as lakehouse_q.py: the oracle recomputes
the expected aggregate straight from the source parquet, so a lossy
encode, broken framing, or mis-parsed field shows up as a mismatch).

WARC and MCAP fixtures are BUILT at query time from the source tables
by independent serializer code (byte-level framing per the public
specs), then parsed back by the distributed readers — driver-side
fixture construction is bounded to a few hundred records.
"""

from __future__ import annotations

import os
import shutil
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daft_spark.io.readers import load_table
from daft_spark.queries import register


def _tmp(kind: str, sf_dir: str) -> str:
    return os.path.join(
        f"/tmp/daft_spark_io_{kind}", os.path.basename(sf_dir.rstrip("/"))
    )


@register(
    "io_csv_roundtrip",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id < 800
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events slice -> write_csv (header) -> read_csv with an explicit
    schema -> aggregate. Validates quoting/typing through the full
    writer+reader pair (reference daft/io/_csv.py read_csv,
    dataframe write_csv)."""
    from daft_spark.io.readers import read_csv

    path = _tmp("csv", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.filter(F.col("event_id") < 800).write.option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_csv(path, spark, schema=schema)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "io_json_roundtrip",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE doc_id < 400
    GROUP BY source
    ORDER BY source
    """,
)
def io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents slice (free text incl. newline-hostile content) ->
    line-delimited JSON -> read_json -> aggregate. Validates string
    escaping through the writer+reader pair (reference
    daft/io/_json.py)."""
    from daft_spark.io.readers import read_json

    path = _tmp("json", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source", "n_chars")
    d.filter(F.col("doc_id") < 400).write.json(path)
    back = read_json(path, spark)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("source")
    )


def _build_warc(rows, path: str) -> None:
    """Serialize (doc_id, lang, text) rows as a WARC/1.0 file — framing
    per the public ISO 28500 spec: header block, Content-Length octet
    count, record body, CRLF CRLF separator."""
    with open(path, "wb") as f:
        for doc_id, lang, text in rows:
            body = text.encode("utf-8")
            headers = (
                "WARC/1.0\r\n"
                f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
                "WARC-Type: resource\r\n"
                f"WARC-Target-URI: doc://{lang}/{doc_id}\r\n"
                "WARC-Date: 2024-01-01T00:00:00Z\r\n"
                f"Content-Type: text/plain; lang={lang}\r\n"
                f"Content-Length: {len(body)}\r\n"
                "\r\n"
            )
            f.write(headers.encode("ascii"))
            f.write(body)
            f.write(b"\r\n\r\n")


@register(
    "io_warc_roundtrip",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    WHERE doc_id < 300
    GROUP BY lang
    ORDER BY lang
    """,
)
def io_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents slice -> WARC/1.0 file (independent serializer above)
    -> distributed read_warc (binaryFile + mapInPandas parser) ->
    per-language record counts and content byte totals. The oracle
    recomputes byte lengths from the source text, so a framing bug that
    truncates or merges records mismatches. Reference: daft/io/_warc.py
    read_warc, src/daft-warc/."""
    from daft_spark.io.warc import read_warc

    root = _tmp("warc", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    rows = [(r["doc_id"], r["lang"], r["text"]) for r in d.filter(F.col("doc_id") < 300).collect()]
    # two files so the scan has >1 task
    half = len(rows) // 2
    _build_warc(rows[:half], os.path.join(root, "a.warc"))
    _build_warc(rows[half:], os.path.join(root, "b.warc"))
    back = read_warc(os.path.join(root, "*.warc"), spark)
    return (
        back.withColumn(
            "lang",
            F.regexp_extract(F.col("`WARC-Target-URI`"), r"doc://([a-z]+)/", 1),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("`Content-Length`")).cast("long").alias("total_bytes"),
        )
        .orderBy("lang")
    )


# MCAP record opcodes / framing per the public spec (mcap.dev)
_MAGIC = b"\x89MCAP0\r\n"


def _rec(op: int, content: bytes) -> bytes:
    return bytes([op]) + struct.pack("<Q", len(content)) + content


def _s(v: str) -> bytes:
    b = v.encode()
    return struct.pack("<I", len(b)) + b


def _build_mcap(rows, path: str) -> None:
    """Serialize (event_id, event_type, value) rows as an MCAP file:
    header, one Schema, one Channel per event_type, Message records
    (log_time = event_id), footer."""
    out = bytearray()
    out += _MAGIC
    out += _rec(0x01, _s("") + _s(""))  # Header: profile, library
    out += _rec(0x03, struct.pack("<H", 1) + _s("events") + _s("jsonschema") + struct.pack("<I", 0))
    topics = sorted({t for _, t, _ in rows})
    cid = {}
    for i, t in enumerate(topics, start=1):
        cid[t] = i
        # Channel: id, schema_id, topic, message_encoding, metadata(map len 0)
        out += _rec(
            0x04,
            struct.pack("<HH", i, 1) + _s(f"/{t}") + _s("json") + struct.pack("<I", 0),
        )
    for event_id, event_type, value in rows:
        data = struct.pack("<d", value)
        out += _rec(
            0x05,
            struct.pack("<HIQQ", cid[event_type], 0, event_id, event_id) + data,
        )
    out += _rec(0x0F, b"")  # DataEnd
    out += _rec(0x02, struct.pack("<QQI", 0, 0, 0))  # Footer
    out += _MAGIC
    with open(path, "wb") as f:
        f.write(out)


@register(
    "io_mcap_roundtrip",
    """
    SELECT concat('/', event_type) AS topic,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_log_time
    FROM events
    WHERE event_id < 500
    GROUP BY event_type
    ORDER BY topic
    """,
)
def io_mcap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events slice -> MCAP file (independent serializer above, one
    channel per event_type, log_time = event_id) -> distributed
    read_mcap -> per-topic message counts and log_time sums. Reference:
    daft/io/mcap/_mcap.py read_mcap."""
    from daft_spark.io.mcap import read_mcap

    root = _tmp("mcap", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    rows = [
        (r["event_id"], r["event_type"], r["value"])
        for r in e.filter(F.col("event_id") < 500).collect()
    ]
    half = len(rows) // 2
    _build_mcap(rows[:half], os.path.join(root, "a.mcap"))
    _build_mcap(rows[half:], os.path.join(root, "b.mcap"))
    back = read_mcap(os.path.join(root, "*.mcap"), spark)
    return (
        back.groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("log_time").cast("long").alias("sum_log_time"),
        )
        .orderBy("topic")
    )


@register(
    "io_checkpoint_resume",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_remaining,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
    FROM orders
    WHERE o_orderkey >= 400 AND o_orderkey < 800
    """,
)
def io_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint/skip_existing resume semantics (reference
    skip_existing, daft/dataframe/dataframe.py:3233, ops/
    stage_checkpoint_keys.rs:26): a first run writes keys < 400; the
    resumed run over keys < 800 must process EXACTLY the 400-799 rows —
    the anti-join against the checkpointed output. The oracle restates
    the remaining set straight from the source table."""
    from daft_spark.operators.checkpoint import skip_existing

    path = _tmp("ckpt", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    o.filter(F.col("o_orderkey") < 400).write.parquet(path)
    remaining = skip_existing(o.filter(F.col("o_orderkey") < 800), path, ["o_orderkey"])
    return remaining.agg(
        F.count(F.lit(1)).alias("n_remaining"),
        F.sum("o_orderkey").cast("long").alias("sum_keys"),
    )


@register(
    "io_sql_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
    FROM orders
    WHERE o_orderkey < 900
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def io_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders slice -> write_sql into a real sqlite database ->
    read_sql back as a bounds-partitioned parallel read (4 partitions
    on o_orderkey, each executor task queries only its range) ->
    aggregate. Validates the SQL source/sink plumbing end-to-end over
    an actual database (reference daft/io/_sql.py read_sql,
    dataframe.py:911 write_sql)."""
    from daft_spark.io.readers import read_sql
    from daft_spark.io.writers import write_sql

    db = _tmp("sqldb", sf_dir) + ".db"
    shutil.rmtree(os.path.dirname(db), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    url = f"sqlite://{db}"
    write_sql(o.filter(F.col("o_orderkey") < 900), "orders_slice", url, write_mode="overwrite")
    back = read_sql("orders_slice", url, spark, partition_col="o_orderkey", num_partitions=4)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("long").alias("sum_keys"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "io_kafka_bounded",
    """
    WITH log AS (
      SELECT CAST(event_id % 3 AS INT) AS partition,
             ROW_NUMBER() OVER (PARTITION BY event_id % 3 ORDER BY event_id) - 1
               AS "offset",
             event_id
      FROM events
    )
    SELECT partition,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min("offset") AS BIGINT) AS min_offset,
           CAST(max("offset") AS BIGINT) AS max_offset,
           CAST(sum(event_id) AS BIGINT) AS sum_val
    FROM log WHERE "offset" >= 100 AND "offset" < 250
    GROUP BY partition ORDER BY partition
    """,
)
def io_kafka_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_kafka against a file-backed topic log (io/kafka_fake.py):
    events become a 3-partition topic (partition = event_id % 3,
    offsets = dense per-partition ordinals, multiple offset-named
    segments per partition), then the PUBLIC read_kafka API reads the
    bounded slice [100, 250) per partition via file:// bootstrap
    servers — exercising Kafka-style offset JSON parsing, segment
    pruning by base offset, and the Kafka source output schema. The
    oracle recomputes the same bounded slice from events with a window
    ordinal. Reference: daft/io/_kafka.py:557 (bounded batch read)."""
    import json as _json

    from daft_spark.io.kafka_fake import write_topic_log
    from daft_spark.io.readers import read_kafka

    root = _tmp("kafka", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 3).alias("p"), "event_id", "user_id", "ts"
    )
    write_topic_log(
        root, "events", ev,
        partition_col="p", key_col="user_id", value_col="event_id",
        order_col="event_id", timestamp_col="ts", segment_records=120,
    )
    bounds_lo = _json.dumps({"events": {"0": 100, "1": 100, "2": 100}})
    bounds_hi = _json.dumps({"events": {"0": 250, "1": 250, "2": 250}})
    got = read_kafka(
        f"file://{root}", "events", spark,
        starting_offsets=bounds_lo, ending_offsets=bounds_hi,
    )
    return (
        got.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            F.sum(F.col("value").cast("string").cast("long")).alias("sum_val"),
        )
        .orderBy("partition")
    )


@register(
    "io_from_pydict_family",
    """
    SELECT src, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS total
    FROM (
      SELECT 'pydict' AS src, x AS v FROM (VALUES (1), (2), (3)) t(x)
      UNION ALL SELECT 'pandas', x FROM (VALUES (10), (20)) t(x)
      UNION ALL SELECT 'arrow', x FROM (VALUES (100), (200), (300), (400)) t(x)
      UNION ALL SELECT 'range', x FROM (SELECT unnest(range(0, 50, 7)) AS x)
    ) GROUP BY src ORDER BY src
    """,
)
def io_from_pydict_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory constructors (reference daft/convert.py from_pydict/
    from_pandas/from_arrow + daft.range): each source becomes a frame,
    unioned and aggregated; the oracle restates the same values with
    VALUES/range."""
    import pandas as pd
    import pyarrow as pa

    from daft_spark.io.readers import from_arrow, from_pandas, from_pydict, range_

    a = from_pydict({"v": [1, 2, 3]}, spark=spark).select(
        F.lit("pydict").alias("src"), F.col("v").cast("long").alias("v")
    )
    b = from_pandas(pd.DataFrame({"v": [10, 20]}), spark=spark).select(
        F.lit("pandas").alias("src"), F.col("v").cast("long").alias("v")
    )
    c = from_arrow(pa.table({"v": [100, 200, 300, 400]}), spark=spark).select(
        F.lit("arrow").alias("src"), F.col("v").cast("long").alias("v")
    )
    d = range_(0, 50, 7, spark=spark).select(
        F.lit("range").alias("src"), F.col("id").cast("long").alias("v")
    )
    return (
        a.unionAll(b).unionAll(c).unionAll(d)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .orderBy("src")
    )


@register(
    "io_push_sink_roundtrip",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT id) AS BIGINT) AS n_ids,
           CAST(sum(nk) AS BIGINT) AS sum_nk
    FROM (SELECT c_custkey AS id, c_nationkey AS nk FROM customer
          WHERE c_custkey <= 400)
    """,
)
def io_push_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Push sink executor contract (reference write_turbopuffer,
    dataframe.py:2499; DataSink daft/io/sink.py): the slice streams
    through write_turbopuffer with a FILE-BACKED sink factory — one
    sink per partition on executors, bounded write_batch flushes,
    close() on exhaustion — then the flushed JSONL is read back and
    aggregated; the oracle restates the aggregates from the source
    table. The real client path only swaps the factory."""
    import json as _json
    import uuid as _uuid

    from daft_spark.io.writers import write_turbopuffer

    out_dir = _tmp("push_sink", sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def sink_factory():
        path = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.jsonl")

        class _FileSink:
            def __init__(self):
                self.f = open(path, "w")

            def write_batch(self, docs):
                for d in docs:
                    self.f.write(_json.dumps(d) + "\n")

            def close(self):
                self.f.close()

        return _FileSink()

    src = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select("c_custkey", "c_nationkey")
    )
    write_turbopuffer(
        src, namespace="ns", id_column="c_custkey", batch_size=50,
        sink_factory=sink_factory,
    )
    back = spark.read.json(os.path.join(out_dir, "*.jsonl"))
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("id").alias("n_ids"),
        F.sum("c_nationkey").alias("sum_nk"),
    )


@register(
    "io_hf_mirror",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def io_hf_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_huggingface offline path (reference
    daft/io/huggingface/__init__.py:38): hf://datasets/<org>/<name>
    resolves against a local snapshot mirror
    ($DAFT_SPARK_HF_MIRROR/<org>/<name>/**.parquet — the
    huggingface_hub.snapshot_download layout) and reads the shards as
    ordinary parquet. The fixture mirrors the customer table into
    acme/customers; the oracle aggregates the source."""
    from daft_spark.io.lakehouse import read_huggingface

    mirror = _tmp("hf_mirror", sf_dir)
    root = os.path.join(mirror, "acme", "customers")
    shutil.rmtree(mirror, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    load_table(spark, sf_dir, "customer").write.mode("overwrite").parquet(
        os.path.join(root, "data")
    )
    prev = os.environ.get("DAFT_SPARK_HF_MIRROR")
    os.environ["DAFT_SPARK_HF_MIRROR"] = mirror
    try:
        df = read_huggingface("hf://datasets/acme/customers", spark=spark)
    finally:
        if prev is None:
            os.environ.pop("DAFT_SPARK_HF_MIRROR", None)
        else:
            os.environ["DAFT_SPARK_HF_MIRROR"] = prev
    return (
        df.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@register(
    "io_text_roundtrip",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(count(*) FILTER (text LIKE 'doc:%') AS BIGINT) AS n_prefixed
    FROM (SELECT 'doc:' || CAST(doc_id AS VARCHAR) || '|' || lang AS text
          FROM documents WHERE doc_id < 400)
    """,
)
def io_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_text (reference daft/io/_text.py:12): write deterministic
    lines with Spark's text writer, read back one row per line as the
    ``text`` column, aggregate; the oracle recomputes the same lines
    from the source table."""
    from daft_spark.io.readers import read_text

    out = _tmp("text", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    lines = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(
            F.concat(F.lit("doc:"), F.col("doc_id").cast("string"),
                     F.lit("|"), F.col("lang")).alias("value")
        )
    )
    lines.write.mode("overwrite").text(out)
    back = read_text(out, spark=spark)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.when(F.col("text").startswith("doc:"), 1).otherwise(0))
        .cast("long")
        .alias("n_prefixed"),
    )
