"""Horizontal (cross-column) functions — parity with the reference's
``daft/functions/columnar.py:9-137`` (columns_sum/columns_mean/
columns_avg/columns_min/columns_max): row-wise reductions across a set
of columns, null-skipping like the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cols(cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def columns_sum(*cols) -> Column:
    """Row-wise sum, nulls treated as 0 unless all null -> null."""
    cs = _cols(cols)
    arr = F.array(*cs)
    valid = F.filter(arr, lambda x: x.isNotNull())
    return F.when(
        F.size(valid) > 0,
        F.aggregate(valid, F.lit(0.0), lambda acc, x: acc + x.cast("double")),
    )


def columns_mean(*cols) -> Column:
    """Row-wise mean over the non-null columns."""
    cs = _cols(cols)
    arr = F.array(*cs)
    valid = F.filter(arr, lambda x: x.isNotNull())
    return F.when(
        F.size(valid) > 0,
        F.aggregate(valid, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        / F.size(valid),
    )


columns_avg = columns_mean


def columns_min(*cols) -> Column:
    """Row-wise min, null-skipping (least() skips nulls)."""
    return F.least(*_cols(cols))


def columns_max(*cols) -> Column:
    return F.greatest(*_cols(cols))
