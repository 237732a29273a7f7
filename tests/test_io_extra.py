"""WARC reader (real parser, generated fixture), lakehouse gates,
partitioning transforms."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F


def _make_warc_bytes(n: int = 3) -> bytes:
    out = b""
    for i in range(n):
        body = f"<html>page {i} content</html>".encode()
        headers = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:0000-{i}>\r\n"
            f"WARC-Target-URI: http://example.com/{i}\r\n"
            f"WARC-Date: 2024-01-0{i + 1}T00:00:00Z\r\n"
            f"Content-Type: application/http\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode()
        out += headers + body + b"\r\n\r\n"
    return out


def test_read_warc(spark, tmp_path):
    from daft_spark.io.warc import read_warc

    p1 = tmp_path / "a.warc"
    p1.write_bytes(_make_warc_bytes(3))
    p2 = tmp_path / "b.warc.gz"
    p2.write_bytes(gzip.compress(_make_warc_bytes(2)))

    df = read_warc(str(tmp_path / "*.warc*"), spark=spark)
    rows = sorted(
        (r["warc_target_uri"], r["content_length"], bytes(r["content"]))
        for r in df.collect()
    )
    assert len(rows) == 5
    assert rows[0][0] == "http://example.com/0"
    assert rows[0][2] == b"<html>page 0 content</html>"
    assert {r["warc_type"] for r in df.collect()} == {"response"}


def test_lakehouse_gates(spark, tmp_path):
    from daft_spark.io.lakehouse import read_deltalake, read_hudi, read_mcap

    with pytest.raises((ImportError, Exception)):
        read_deltalake(str(tmp_path / "nope"), spark=spark)
    with pytest.raises((ImportError, Exception)):
        read_hudi(str(tmp_path / "nope"), spark=spark)
    # read_mcap is a real reader now (io/mcap.py) — a missing path is an
    # ordinary analysis error, not a capability gate.
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        read_mcap(str(tmp_path / "x.mcap"), spark=spark).collect()


def test_partitioning_transforms(spark):
    from daft_spark.functions.partitioning import (
        days,
        hours,
        iceberg_bucket,
        iceberg_truncate,
        months,
        years,
    )
    from daft_spark.io.readers import load_table
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events").limit(100)
    out = e.select(
        days("ts").alias("d"),
        hours("ts").alias("h"),
        months("ts").alias("m"),
        years("ts").alias("y"),
        iceberg_bucket("user_id", 8).alias("b"),
        iceberg_truncate(F.col("user_id"), 10, dtype="long").alias("tn"),
        iceberg_truncate(F.col("event_type"), 3).alias("ts3"),
    ).collect()
    r = out[0]
    assert str(r["d"]).startswith("2024-01")
    assert r["m"] == "2024-01" and r["y"] == 2024
    assert 0 <= r["b"] < 8
    assert r["tn"] % 10 == 0
    assert len(r["ts3"]) <= 3
    # bucket must be stable across runs (hash-deterministic)
    again = e.select(iceberg_bucket("user_id", 8).alias("b")).collect()
    assert [x["b"] for x in again] == [x["b"] for x in out]


def test_kafka_file_backed_log_bounds_and_pruning(spark, tmp_path):
    """read_kafka over a file:// topic log: offset bounds are
    inclusive/exclusive per Kafka, segment files outside the bounds are
    pruned by NAME (the broker-seek analogue), and the output schema
    matches Spark's Kafka source."""
    from pyspark.sql import functions as F

    from daft_spark.io.kafka_fake import write_topic_log
    from daft_spark.io.readers import read_kafka

    root = str(tmp_path / "log")
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("v")
    )
    write_topic_log(
        root, "t", df, partition_col="p", key_col=None, value_col="v",
        order_col="v", segment_records=100,
    )
    got = read_kafka(
        f"file://{root}", "t", spark,
        starting_offsets='{"t": {"0": 150, "1": 150}}',
        ending_offsets='{"t": {"0": 250, "1": 250}}',
    )
    assert [f.name for f in got.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]
    rows = got.collect()
    assert len(rows) == 200  # 100 offsets x 2 partitions
    assert all(150 <= r.offset < 250 for r in rows)
    # segment pruning: offsets [150,250) live in segments 100 and 200 only
    segs = {os.path.basename(f) for f in got.inputFiles()}
    assert segs == {
        "segment-00000000000000000100.jsonl",
        "segment-00000000000000000200.jsonl",
    }
    # earliest/latest = full log
    assert read_kafka(f"file://{root}", "t", spark).count() == 1000
    # values round the offset math: partition 0 holds even ids, offset k -> id 2k
    r = got.filter((F.col("partition") == 0) & (F.col("offset") == 150)).collect()
    assert r[0].value == b"300"


def test_kafka_batch_offset_spec_gates(spark, tmp_path):
    """The fake keeps Spark's batch-source contract: startingOffsets
    'latest' and endingOffsets 'earliest' are invalid for batch reads."""
    import pytest
    from pyspark.sql import functions as F

    from daft_spark.io.kafka_fake import write_topic_log
    from daft_spark.io.readers import read_kafka

    root = str(tmp_path / "log")
    df = spark.range(10).select((F.col("id") % 2).alias("p"), F.col("id").alias("v"))
    write_topic_log(root, "t", df, partition_col="p", key_col=None,
                    value_col="v", order_col="v")
    with pytest.raises(ValueError, match="latest"):
        read_kafka(f"file://{root}", "t", spark, starting_offsets="latest")
    with pytest.raises(ValueError, match="earliest"):
        read_kafka(f"file://{root}", "t", spark, ending_offsets="earliest")


def test_kafka_json_sentinel_offsets(spark, tmp_path):
    """ADVICE r6: per-partition JSON offset specs honor Kafka's
    sentinels (-2 earliest / -1 latest), reject the combinations the
    real batch source refuses, and error on partitions missing from
    the spec instead of silently defaulting."""
    import pytest
    from pyspark.sql import functions as F

    from daft_spark.io.kafka_fake import write_topic_log
    from daft_spark.io.readers import read_kafka

    root = str(tmp_path / "log")
    df = spark.range(100).select((F.col("id") % 2).alias("p"), F.col("id").alias("v"))
    write_topic_log(root, "t", df, partition_col="p", key_col=None,
                    value_col="v", order_col="v")
    # -2 start = earliest, -1 end = latest -> full log
    got = read_kafka(
        f"file://{root}", "t", spark,
        starting_offsets='{"t": {"0": -2, "1": -2}}',
        ending_offsets='{"t": {"0": -1, "1": -1}}',
    )
    assert got.count() == 100
    # -1 as a start / -2 as an end are the latest/earliest combinations
    # the batch source rejects
    with pytest.raises(ValueError, match="latest"):
        read_kafka(f"file://{root}", "t", spark,
                   starting_offsets='{"t": {"0": -1, "1": -1}}').count()
    with pytest.raises(ValueError, match="earliest"):
        read_kafka(f"file://{root}", "t", spark,
                   ending_offsets='{"t": {"0": -2, "1": -2}}').count()
    # every topic partition must appear in the JSON spec
    with pytest.raises(ValueError, match="missing partition"):
        read_kafka(f"file://{root}", "t", spark,
                   starting_offsets='{"t": {"0": 5}}').count()
