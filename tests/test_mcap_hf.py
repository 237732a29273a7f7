"""MCAP reader (daft_spark/io/mcap.py) against spec-conformant
synthetic files, and the read_huggingface local-mirror path."""

import os
import struct

import pytest

from daft_spark.io.mcap import MCAP_MAGIC


def _s(text: str) -> bytes:
    b = text.encode()
    return struct.pack("<I", len(b)) + b


def _rec(opcode: int, content: bytes) -> bytes:
    return struct.pack("<BQ", opcode, len(content)) + content


def _schema(sid: int, name: str, encoding: str) -> bytes:
    data = b"{}"
    return _rec(0x03, struct.pack("<H", sid) + _s(name) + _s(encoding) + struct.pack("<I", len(data)) + data)


def _channel(cid: int, sid: int, topic: str, enc: str) -> bytes:
    return _rec(0x04, struct.pack("<HH", cid, sid) + _s(topic) + _s(enc) + struct.pack("<I", 0))


def _message(cid: int, seq: int, log_t: int, pub_t: int, data: bytes) -> bytes:
    return _rec(0x05, struct.pack("<HIQQ", cid, seq, log_t, pub_t) + data)


def _footer() -> bytes:
    return _rec(0x02, struct.pack("<QQI", 0, 0, 0))


def _write_mcap(path: str, body: bytes) -> None:
    with open(path, "wb") as f:
        f.write(MCAP_MAGIC + body + _footer() + MCAP_MAGIC)


@pytest.fixture()
def mcap_file(tmp_path):
    body = (
        _rec(0x01, _s("ros2") + _s("testlib"))  # header
        + _schema(1, "std_msgs/String", "ros2msg")
        + _channel(10, 1, "/chatter", "cdr")
        + _channel(11, 1, "/rosout", "cdr")
        + _message(10, 0, 1000, 999, b"hello")
        + _message(10, 1, 2000, 1999, b"world")
        + _message(11, 0, 1500, 1499, b"log-line")
    )
    p = str(tmp_path / "a.mcap")
    _write_mcap(p, body)
    return p


def test_read_mcap_messages(spark, mcap_file):
    from daft_spark.io.mcap import read_mcap

    rows = {(r.topic, r.sequence): r for r in read_mcap(mcap_file, spark).collect()}
    assert len(rows) == 3
    r = rows[("/chatter", 1)]
    assert bytes(r.data) == b"world"
    assert r.log_time == 2000 and r.publish_time == 1999
    assert r.schema_name == "std_msgs/String"
    assert r.message_encoding == "cdr"
    assert r.channel_id == 10


def test_read_mcap_uncompressed_chunk(spark, tmp_path):
    """Messages inside an uncompressed Chunk record parse identically."""
    from daft_spark.io.mcap import read_mcap

    inner = (
        _schema(1, "sensor_msgs/Imu", "ros2msg")
        + _channel(5, 1, "/imu", "cdr")
        + _message(5, 7, 42, 41, b"\x01\x02")
    )
    chunk = _rec(
        0x06,
        struct.pack("<QQQI", 42, 42, len(inner), 0) + _s("") + struct.pack("<Q", len(inner)) + inner,
    )
    p = str(tmp_path / "c.mcap")
    _write_mcap(p, chunk)
    rows = read_mcap(p, spark).collect()
    assert len(rows) == 1
    assert rows[0].topic == "/imu" and rows[0].sequence == 7


def test_read_mcap_bad_magic(spark, tmp_path):
    from daft_spark.io.mcap import read_mcap

    p = str(tmp_path / "bad.mcap")
    with open(p, "wb") as f:
        f.write(b"NOTMCAP!" + b"\x00" * 16)
    with pytest.raises(Exception, match="bad magic"):
        read_mcap(p, spark).collect()


def test_read_huggingface_mirror(spark, tmp_path, monkeypatch):
    from daft_spark.io.lakehouse import read_huggingface

    root = tmp_path / "org" / "dataset"
    os.makedirs(root)
    spark.range(0, 50).write.mode("overwrite").parquet(str(root / "default"))
    monkeypatch.setenv("DAFT_SPARK_HF_MIRROR", str(tmp_path))
    out = read_huggingface("hf://datasets/org/dataset", spark)
    assert out.count() == 50
    with pytest.raises(FileNotFoundError, match="no parquet shards"):
        read_huggingface("hf://datasets/org/missing", spark)


def test_read_huggingface_no_network_error(spark, monkeypatch):
    from daft_spark.io.lakehouse import read_huggingface

    monkeypatch.delenv("DAFT_SPARK_HF_MIRROR", raising=False)
    with pytest.raises(NotImplementedError, match="huggingface.co/api/datasets/org/x"):
        read_huggingface("hf://datasets/org/x", spark)


def test_huggingface_mirror_write_read_roundtrip(spark, tmp_path, monkeypatch):
    """write_huggingface -> read_huggingface through the offline mirror
    (the snapshot_download layout): air-gapped roundtrip, shards as
    ordinary parquet."""
    import daft_spark
    from daft_spark.io.lakehouse import read_huggingface

    monkeypatch.setenv("DAFT_SPARK_HF_MIRROR", str(tmp_path))
    df = daft_spark.from_pydict({"k": [1, 2, 3], "v": ["a", "b", "c"]}, spark=spark)
    df.write_huggingface("hf://datasets/acme/tiny")
    back = read_huggingface("hf://datasets/acme/tiny", spark=spark)
    assert back.count() == 3
    assert {r["k"] for r in back.collect()} == {1, 2, 3}
