"""File helpers — parity with the reference's file functions
(reference: ``daft/functions/file_.py:12-134``: file, file_path,
file_size, file_exists, guess_mime_type; File dtype
``src/daft-schema/src/dtype.rs:149``).

File references are plain path strings (or the FILE_TYPE struct in
daft_spark.types); metadata probes run executor-side as pandas UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MIME_BY_EXT = {
    ".txt": "text/plain", ".csv": "text/csv", ".json": "application/json",
    ".parquet": "application/vnd.apache.parquet", ".html": "text/html",
    ".jpg": "image/jpeg", ".jpeg": "image/jpeg", ".png": "image/png",
    ".gif": "image/gif", ".webp": "image/webp", ".mp4": "video/mp4",
    ".avi": "video/x-msvideo", ".mp3": "audio/mpeg", ".wav": "audio/x-wav",
    ".flac": "audio/flac", ".pdf": "application/pdf", ".gz": "application/gzip",
    ".warc": "application/warc",
}


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def file_path(col) -> Column:
    """Identity accessor on a path column / FILE struct."""
    c = _c(col)
    return c.getField("path") if "struct" in str(c) else c


def guess_mime_type(col) -> Column:
    """Extension-based mime guess (reference guess_mime_type) — pure
    expression, deterministic."""
    c = F.lower(_c(col))
    out = F.lit(None).cast("string")
    for ext, mime in _MIME_BY_EXT.items():
        out = F.when(c.endswith(ext), mime).otherwise(out)
    return out


def file_size(col) -> Column:
    """Size in bytes of a local/file:// path (executor-side stat);
    null for missing files."""

    @pandas_udf("long")
    def _sz(paths: pd.Series) -> pd.Series:
        import os

        out = []
        for p in paths:
            if p is None:
                out.append(None)
                continue
            q = p[7:] if p.startswith("file://") else p
            try:
                out.append(os.path.getsize(q))
            except OSError:
                out.append(None)
        return pd.Series(out, dtype="object")

    return _sz(_c(col))


def file_exists(col) -> Column:
    @pandas_udf("boolean")
    def _ex(paths: pd.Series) -> pd.Series:
        import os

        return pd.Series(
            [os.path.exists(p[7:] if p.startswith("file://") else p) if p else None for p in paths]
        )

    return _ex(_c(col))
