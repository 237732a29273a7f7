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
        (r["WARC-Target-URI"], r["Content-Length"], bytes(r["warc_content"]))
        for r in df.collect()
    )
    assert len(rows) == 5
    assert rows[0][0] == "http://example.com/0"
    assert rows[0][2] == b"<html>page 0 content</html>"
    assert {r["WARC-Type"] for r in df.collect()} == {"response"}
    # non-mandatory headers land in the warc_headers JSON
    import json as _json

    hdrs = _json.loads(df.collect()[0]["warc_headers"])
    assert hdrs.get("Content-Type") == "application/http"


def test_warc_malformed_content_length_fails_loudly(spark, tmp_path):
    """An unparseable Content-Length must raise, not coerce to 0 — a
    zero-byte payload read desyncs the parser and the rest of the
    stream misparses into garbage records (r10 advice)."""
    from daft_spark.io.warc import read_warc

    good = _make_warc_bytes(1)
    bad = good.replace(b"Content-Length: 27", b"Content-Length: twenty-seven")
    assert bad != good  # the substitution must have hit
    p = tmp_path / "bad.warc"
    p.write_bytes(bad + _make_warc_bytes(2))
    with pytest.raises(Exception, match="malformed Content-Length"):
        read_warc(str(p), spark=spark).collect()


def test_read_real_warc_fixture(spark):
    """The reference's own example.warc(.gz) archives (real Common
    Crawl-style records) parse to the reference's exact schema and
    counts (mirrors /root/reference/tests/io/test_warc.py)."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from daft_spark.io.warc import read_warc

    for name in ("example.warc", "example.warc.gz"):
        p = f"/root/reference/tests/assets/{name}"
        if not _os.path.exists(p):
            pytest.skip("reference fixtures unavailable")
        df = read_warc(p, spark=spark)
        assert df.columns == [
            "WARC-Record-ID", "WARC-Target-URI", "WARC-Type", "WARC-Date",
            "Content-Length", "WARC-Identified-Payload-Type",
            "warc_content", "warc_headers",
        ]
        assert df.count() == 30
        resp = df.filter(F.col("`WARC-Type`") == "response")
        assert resp.count() == 11
        # Content-Type stays inside warc_headers (the jq'."Content-Type"'
        # assertion of the reference test)
        n = sum(
            1 for r in resp.collect()
            if _json.loads(r["warc_headers"]).get("Content-Type")
            == "application/http; msgtype=response"
            and r["Content-Length"] < 10 * 1024 * 1024
        )
        assert n == 11
        # warcinfo records have no target URI (WARC spec shall-not)
        wi = df.filter(F.col("`WARC-Type`") == "warcinfo")
        assert wi.count() == 1
        assert wi.filter(F.col("`WARC-Target-URI`").isNull()).count() == 1
        # record ids parse to bare uuids; dates to real timestamps
        r0 = df.filter(F.col("`WARC-Record-ID`").isNotNull()).first()
        import uuid as _uuid

        _uuid.UUID(r0["WARC-Record-ID"])
        assert df.filter(F.col("`WARC-Date`").isNotNull()).count() == 30
    # the reference ships a 1-row parquet in its read_warc OUTPUT schema
    # (common-crawl-sample.parquet): our reader's columns match it 1:1
    cc = spark.read.parquet("/root/reference/tests/assets/common-crawl-sample.parquet")
    assert cc.columns == df.columns


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


def test_read_deltalake_timestamp_as_of_session_zone(spark, tmp_path, monkeypatch):
    """timestampAsOf must be formatted in the zone the CONNECTOR will
    parse it in (delta-spark parses zone-less strings in
    spark.sql.session.timeZone) with millisecond precision. read_deltalake
    reads the zone AFTER _session()/configure() — which pins the session
    to UTC — so the string and the parse are self-consistent even when
    the caller had set a different zone beforehand (r8 advice: the old
    code formatted a UTC wall-clock string regardless of what the
    connector would parse it as, and dropped sub-second precision)."""
    from daft_spark.io import lakehouse

    captured = {}

    def fake_format_read(spark_, fmt, path, pkg, options, **kw):
        captured.update(options)
        raise ImportError("no connector in this container")

    monkeypatch.setattr(lakehouse, "_format_read", fake_format_read)
    from daft_spark.io.delta import write_deltalake_py

    p = str(tmp_path / "tz")
    write_deltalake_py(spark.range(3).select(F.col("id").alias("k")), p)
    ts = 1700000000123  # 2023-11-14T22:13:20.123Z
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        # a caller-set zone is renormalized to UTC by configure() before
        # the string is built — format and parse agree, millis survive
        spark.conf.set("spark.sql.session.timeZone", "UTC+08:00")
        try:
            lakehouse.read_deltalake(p, spark, timestamp_ms=ts)
        except Exception:
            pass  # fallback may raise on version resolution; options captured
        assert captured["timestampAsOf"] == "2023-11-14 22:13:20.123"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    # the offset-zone branch itself (for sessions daft_spark does not
    # manage): GMT+8 / UTC+08:00 / +05:30 forms all parse
    import datetime as _dt
    import re as _re

    for zone, want in [("GMT+8", 480), ("UTC+08:00", 480), ("+05:30", 330), ("GMT-3", -180)]:
        m = _re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{1,2})(?::?(\d{2}))?", zone)
        assert m, zone
        sign = 1 if m.group(1) == "+" else -1
        mins = sign * (int(m.group(2)) * 60 + int(m.group(3) or 0))
        assert mins == want, zone


def test_read_parquet_invalid_utf8_raw(spark):
    """The reference's invalid_utf8.parquet fixture (a string column
    holding non-UTF-8 bytes): string_encoding='raw' returns the column
    as BINARY with the ORIGINAL bytes, mirroring
    read_parquet_into_pyarrow(string_encoding='raw') — Spark strings
    are raw bytes underneath, so the cast is lossless."""
    p = "/root/reference/tests/assets/parquet-data/invalid_utf8.parquet"
    if not os.path.exists(p):
        pytest.skip("reference fixtures unavailable")
    from daft_spark.io.readers import read_parquet

    df = read_parquet(p, spark=spark, string_encoding="raw")
    assert dict(df.dtypes) == {"invalid_string": "binary"}
    assert bytes(df.collect()[0]["invalid_string"]) == b"\x80\x80\x80"
    with pytest.raises(ValueError, match="string_encoding"):
        read_parquet(p, spark=spark, string_encoding="latin1")
