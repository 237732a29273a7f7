"""Partitioning transform helpers — parity with the reference's
``daft/functions/partitioning.py:8-121`` (days/hours/months/years,
iceberg_bucket, iceberg_truncate) used for partitioned writes and
Iceberg-style layouts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def days(col: Column | str) -> Column:
    """Timestamp -> date partition value (reference partitioning.days)."""
    return _c(col).cast("date")


def hours(col: Column | str) -> Column:
    return F.date_trunc("hour", _c(col))


def months(col: Column | str) -> Column:
    return F.date_format(_c(col), "yyyy-MM")


def years(col: Column | str) -> Column:
    return F.year(_c(col))


def iceberg_bucket(col: Column | str, n: int) -> Column:
    """Iceberg bucket transform (reference iceberg_bucket): murmur3 hash
    mod n — Spark's partitioning ``bucket`` transform implements the
    Iceberg spec; usable in writeTo().partitionedBy(). For a plain
    column expression, the pmod(hash) equivalent below matches the
    positive-bucket contract."""
    return F.pmod(F.hash(_c(col)), F.lit(n))


def iceberg_truncate(col: Column | str, width: int, dtype: str = "string") -> Column:
    """Iceberg truncate transform (reference iceberg_truncate):
    numbers -> value - pmod(value, width); strings -> width-char prefix.
    Pass dtype='long'/'int' for the numeric contract."""
    c = _c(col)
    if dtype in ("long", "int", "bigint", "integer"):
        return c - F.pmod(c, F.lit(width))
    return F.substring(c, 1, width)
