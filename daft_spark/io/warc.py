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

WARC_SCHEMA = (
    "warc_record_id string, warc_type string, warc_target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "source_file string, content binary"
)


def _parse_warc_stream(stream: io.BufferedReader, source: str):
    """Yield dict rows from a WARC byte stream."""
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
                headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                    "utf-8", "replace"
                )
        length = int(headers.get("content-length", "0"))
        content = stream.read(length)
        yield {
            "warc_record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "warc_target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "source_file": source,
            "content": content,
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
                    "warc_record_id",
                    "warc_type",
                    "warc_target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "source_file",
                    "content",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
