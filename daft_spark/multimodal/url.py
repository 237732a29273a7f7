"""URL download/upload — the key multimodal ingestion primitive
(reference: ``daft/functions/url.py:44-149`` download/upload/parse_url;
``src/daft-functions-uri/``, IO backends ``src/daft-io/``).

Spark-first: an Arrow-batched pandas UDF doing storage IO per batch on
executors — bandwidth scales with the cluster, nothing touches the
driver. Local file:// and http(s):// via stdlib; on a real cluster
s3a/abfss/gs paths come free through the Hadoop FS connectors instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def download(col: Column | str, on_error: str = "raise", max_bytes: int | None = None) -> Column:
    """URL/path -> binary content (reference url.download, url.py:44).
    on_error='null' turns failures into nulls (the reference's
    on_error option)."""
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("binary")
    def _dl(urls: pd.Series) -> pd.Series:
        import urllib.request

        out = []
        for u in urls:
            if u is None:
                out.append(None)
                continue
            try:
                if u.startswith(("http://", "https://")):
                    with urllib.request.urlopen(u, timeout=30) as r:  # noqa: S310
                        data = r.read(max_bytes) if max_bytes else r.read()
                else:
                    path = u[7:] if u.startswith("file://") else u
                    with open(path, "rb") as f:
                        data = f.read(max_bytes) if max_bytes else f.read()
                out.append(data)
            except Exception:
                if on_error == "raise":
                    raise
                out.append(None)
        return pd.Series(out, dtype=object)

    return _dl(c)


def upload(content_col: Column | str, path_col: Column | str, on_error: str = "raise") -> Column:
    """binary -> write to target path, returns the path (reference
    url.upload, url.py:97). Executor-side, partition-parallel."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    p = F.col(path_col) if isinstance(path_col, str) else path_col

    @pandas_udf("string")
    def _ul(data: pd.Series, paths: pd.Series) -> pd.Series:
        import os

        out = []
        for blob, path in zip(data, paths):
            if blob is None or path is None:
                out.append(None)
                continue
            try:
                target = path[7:] if path.startswith("file://") else path
                os.makedirs(os.path.dirname(target), exist_ok=True)
                with open(target, "wb") as f:
                    f.write(blob)
                out.append(path)
            except Exception:
                if on_error == "raise":
                    raise
                out.append(None)
        return pd.Series(out)

    return _ul(c, p)
