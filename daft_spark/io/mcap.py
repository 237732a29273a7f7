"""MCAP reader — parity with ``daft.read_mcap`` (reference:
``daft/io/mcap/_mcap.py:97``), built from the public MCAP spec
(https://mcap.dev/spec): magic ``\\x89MCAP0\\r\\n``, then records of
``opcode u8 | length u64le | content``, closed by a footer + magic.

Spark-first, same shape as io/warc.py: ``binaryFile`` lists+loads the
.mcap files distributed (one task per file) and a pure-Python record
parser runs in ``mapInPandas``. One output row per Message record,
joined driver-free with its Channel/Schema metadata (both are tiny
in-file dictionaries).

Supported: uncompressed top-level records and uncompressed ("" /
"none") Chunk records; zstd/lz4 chunks decompress when the matching
python package is importable, else raise naming the codec. Message
indexes/summary sections are skipped (readers may ignore them per
spec).

For 100 TB robot-log lakes: files are the unit of parallelism (MCAP is
chunk-indexed but not splittable without reading the summary; the
reference reads per-file too).
"""

from __future__ import annotations

import io
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from daft_spark.context import configure, get_or_create

MCAP_MAGIC = b"\x89MCAP0\r\n"

_OP_HEADER = 0x01
_OP_FOOTER = 0x02
_OP_SCHEMA = 0x03
_OP_CHANNEL = 0x04
_OP_MESSAGE = 0x05
_OP_CHUNK = 0x06
_OP_DATA_END = 0x0F

MCAP_SCHEMA = (
    "channel_id int, topic string, schema_name string, "
    "message_encoding string, sequence long, log_time long, "
    "publish_time long, data binary, source_file string"
)


def _read_string(buf: io.BytesIO) -> str:
    (n,) = struct.unpack("<I", buf.read(4))
    return buf.read(n).decode("utf-8", "replace")


def _decompress_chunk(compression: str, payload: bytes) -> bytes:
    if compression in ("", "none"):
        return payload
    if compression == "zstd":
        try:
            import zstandard
        except ImportError as e:
            raise ImportError("zstd-compressed MCAP chunk needs the 'zstandard' package") from e
        return zstandard.ZstdDecompressor().decompress(payload)
    if compression == "lz4":
        try:
            import lz4.frame
        except ImportError as e:
            raise ImportError("lz4-compressed MCAP chunk needs the 'lz4' package") from e
        return lz4.frame.decompress(payload)
    raise ValueError(f"unknown MCAP chunk compression {compression!r}")


def _parse_records(raw: bytes, schemas: dict, channels: dict, source: str):
    """Yield message rows from a records byte-string (top level or the
    decompressed interior of a Chunk — the spec uses the same record
    framing for both)."""
    buf = io.BytesIO(raw)
    while True:
        head = buf.read(9)
        if len(head) < 9:
            return
        opcode = head[0]
        (length,) = struct.unpack("<Q", head[1:9])
        content = buf.read(length)
        if opcode == _OP_SCHEMA:
            b = io.BytesIO(content)
            (sid,) = struct.unpack("<H", b.read(2))
            schemas[sid] = {"name": _read_string(b), "encoding": _read_string(b)}
        elif opcode == _OP_CHANNEL:
            b = io.BytesIO(content)
            cid, schema_id = struct.unpack("<HH", b.read(4))
            channels[cid] = {
                "schema_id": schema_id,
                "topic": _read_string(b),
                "message_encoding": _read_string(b),
            }
        elif opcode == _OP_MESSAGE:
            cid, seq, log_t, pub_t = struct.unpack("<HIQQ", content[:22])
            ch = channels.get(cid, {})
            sc = schemas.get(ch.get("schema_id"), {})
            yield {
                "channel_id": cid,
                "topic": ch.get("topic"),
                "schema_name": sc.get("name"),
                "message_encoding": ch.get("message_encoding"),
                "sequence": seq,
                "log_time": log_t,
                "publish_time": pub_t,
                "data": content[22:],
                "source_file": source,
            }
        elif opcode == _OP_CHUNK:
            b = io.BytesIO(content)
            b.read(28)  # start/end time u64 x2, uncompressed_size u64, crc u32
            compression = _read_string(b)
            (records_size,) = struct.unpack("<Q", b.read(8))
            inner = _decompress_chunk(compression, b.read(records_size))
            yield from _parse_records(inner, schemas, channels, source)
        elif opcode in (_OP_FOOTER, _OP_DATA_END):
            return  # summary/footer section: indexes only, per spec skippable
        # all other opcodes (indexes, statistics, attachments) are skipped


def _parse_mcap_file(raw: bytes, source: str):
    if raw[:8] != MCAP_MAGIC:
        raise ValueError(f"{source}: not an MCAP file (bad magic)")
    yield from _parse_records(raw[8:], {}, {}, source)


def read_mcap(path: str, spark: SparkSession | None = None) -> DataFrame:
    """One row per MCAP Message record across all matched files, with
    its Channel topic/encoding and Schema name resolved in-file."""
    spark = configure(spark) if spark is not None else get_or_create()
    files = spark.read.format("binaryFile").load(path)
    cols = [f.split(" ")[0] for f in MCAP_SCHEMA.split(", ")]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_mcap_file(bytes(blob), p))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, MCAP_SCHEMA)
