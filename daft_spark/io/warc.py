"""WARC reader — parity with ``daft.read_warc`` (reference:
``daft/io/_warc.py:24``, native reader ``src/daft-warc/``).

Spark-first: ``binaryFile`` source lists+loads the .warc files
distributed (one task per file, like the reference's per-file scan
tasks), and a pandas ``mapInPandas`` stage parses records with a pure-
Python WARC parser (WARC/1.x framing: header block, Content-Length
body, CRLF CRLF record separator). Output schema mirrors the
reference's: one row per WARC record with the standard header fields +
the raw content bytes.

For 100 TB crawls: files are the unit of parallelism (no intra-file
split — WARC is not splittable without an index, same constraint the
reference has); gzip .warc.gz members are handled per-file.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from daft_spark.context import configure, get_or_create

# The reference's exact read_warc schema (daft/io/_warc.py:74-82): five
# mandatory metadata columns + the optional identified-payload-type, the
# raw record bytes, and the REMAINING headers as a JSON string. Uuid
# maps to string (Spark has no uuid type); the ns-UTC WARC-Date maps to
# Spark timestamp.
WARC_SCHEMA = (
    "`WARC-Record-ID` string, `WARC-Target-URI` string, `WARC-Type` string, "
    "`WARC-Date` timestamp, `Content-Length` long, "
    "`WARC-Identified-Payload-Type` string, warc_content binary, "
    "warc_headers string"
)

_EXTRACTED = {
    "Content-Length", "WARC-Record-ID", "WARC-Target-URI", "WARC-Type",
    "WARC-Date", "WARC-Identified-Payload-Type",
}


def _record_uuid(value: str | None) -> str | None:
    """'<urn:uuid:X>' -> 'X' when X parses as a UUID, else None — the
    reference parser's exact rule (src/daft-warc/src/lib.rs:387-394)."""
    import uuid as _uuid

    if not value or not (value.startswith("<") and value.endswith(">")):
        return None
    inner = value[10:-1]
    try:
        return str(_uuid.UUID(inner))
    except ValueError:
        return None


def _rfc3339(value: str | None):
    import datetime as _dt

    if not value:
        return None
    try:
        dt = _dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt


def _parse_warc_stream(stream: io.BufferedReader, source: str):
    """Yield dict rows from a WARC byte stream. Header keys keep their
    original casing; the six extracted fields match exactly (canonical
    WARC casing, as the reference parser does) and everything else
    lands in the warc_headers JSON in encounter order."""
    import json as _json

    while True:
        # skip blank lines between records
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # not a record boundary — skip garbage until next record
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("ascii", "replace")] = v.strip().decode(
                    "utf-8", "replace"
                )
        try:
            length = int(headers.get("Content-Length", "0"))
        except ValueError as exc:
            # A malformed Content-Length cannot be coerced to 0: the
            # parser would read zero payload bytes and desync, silently
            # misparsing the REST of the stream into garbage records.
            # Fail loudly instead (r10 advice).
            raise ValueError(
                f"malformed Content-Length "
                f"{headers.get('Content-Length')!r} in WARC record "
                f"{headers.get('WARC-Record-ID')!r}"
            ) from exc
        content = stream.read(length)
        rest = {k: v for k, v in headers.items() if k not in _EXTRACTED}
        yield {
            "WARC-Record-ID": _record_uuid(headers.get("WARC-Record-ID")),
            "WARC-Type": headers.get("WARC-Type"),
            "WARC-Target-URI": headers.get("WARC-Target-URI"),
            "WARC-Date": _rfc3339(headers.get("WARC-Date")),
            "Content-Length": length,
            "WARC-Identified-Payload-Type": headers.get(
                "WARC-Identified-Payload-Type"
            ),
            "warc_content": content,
            "warc_headers": _json.dumps(rest),
        }


def read_warc(path: str, spark: SparkSession | None = None) -> DataFrame:
    """One row per WARC record across all matched files."""
    spark = configure(spark) if spark is not None else get_or_create()
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob)
                if p.endswith(".gz") or raw[:2] == b"\x1f\x8b":
                    raw = gzip.decompress(raw)
                rows.extend(_parse_warc_stream(io.BufferedReader(io.BytesIO(raw)), p))
            yield pd.DataFrame(
                rows,
                columns=[
                    "WARC-Record-ID",
                    "WARC-Target-URI",
                    "WARC-Type",
                    "WARC-Date",
                    "Content-Length",
                    "WARC-Identified-Payload-Type",
                    "warc_content",
                    "warc_headers",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
