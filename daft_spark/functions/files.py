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


def file(col) -> Column:
    """Typed file reference (reference file_.py file): struct(path,
    size, mime) — composable with the download/decode stages."""
    c = _c(col)
    return F.struct(c.alias("path"), file_size(c).alias("size"),
                    guess_mime_type(c).alias("mime"))


def _typed_file(col, kind: str) -> Column:
    c = _c(col)
    return F.struct(c.alias("path"), file_size(c).alias("size"),
                    guess_mime_type(c).alias("mime"), F.lit(kind).alias("kind"))


def image_file(col) -> Column:
    """reference image_file_.py image_file."""
    return _typed_file(col, "image")


def audio_file(col) -> Column:
    """reference audio.py audio_file."""
    return _typed_file(col, "audio")


def video_file(col) -> Column:
    """reference video.py video_file."""
    return _typed_file(col, "video")


def image_file_metadata(col) -> Column:
    """reference image_file_.py image_file_metadata — the typed-file
    struct's metadata fields (size + mime; pixel dims need a codec)."""
    return F.struct(file_size(_c(col)).alias("size"),
                    guess_mime_type(_c(col)).alias("mime"))


def hdf5_file(col, verify: bool = False, io_config=None) -> Column:
    """reference file_.py:80 hdf5_file — typed HDF5 file reference.
    The struct plumbing is real; content verification needs h5py
    (absent from this container), so verify=True is gated."""
    if verify:
        try:
            import h5py  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "hdf5_file(verify=True) requires the h5py package"
            ) from e
    return _typed_file(col, "hdf5")


def _hdf5_gate(name: str):
    try:
        import h5py  # noqa: F401
    except ImportError as e:
        raise ImportError(
            f"{name} requires the h5py package (reference functions/hdf5.py "
            "reads HDF5 groups/attributes through h5py)"
        ) from e


def hdf5_keys(col, group: str = "/") -> Column:
    """reference hdf5.py:36 hdf5_keys — object names under a group.
    h5py-gated: no HDF5 runtime exists in this container."""
    _hdf5_gate("hdf5_keys")
    raise NotImplementedError("unreachable without h5py")  # pragma: no cover


def hdf5_metadata(col, group: str = "/") -> Column:
    """reference hdf5.py:81 hdf5_metadata — per-object metadata
    (kind/shape/dtype) under a group. h5py-gated."""
    _hdf5_gate("hdf5_metadata")
    raise NotImplementedError("unreachable without h5py")  # pragma: no cover


def hdf5_attrs(col, h5path: str = "/") -> Column:
    """reference hdf5.py:114 hdf5_attrs — attribute dict at a path.
    h5py-gated."""
    _hdf5_gate("hdf5_attrs")
    raise NotImplementedError("unreachable without h5py")  # pragma: no cover
