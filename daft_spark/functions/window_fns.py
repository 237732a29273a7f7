"""Window function names — parity with ``daft/functions/window.py:14-371``
(row_number, rank, dense_rank, lag, lead, first_value, last_value,
over). All delegate to pyspark.sql.functions; ``over`` accepts the
daft_spark.window.Window builder or a raw pyspark WindowSpec.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_number() -> Column:
    return F.row_number()


def rank() -> Column:
    return F.rank()


def dense_rank() -> Column:
    return F.dense_rank()


def lag(col, offset: int = 1, default=None) -> Column:
    return F.lag(col, offset, default)


def lead(col, offset: int = 1, default=None) -> Column:
    return F.lead(col, offset, default)


def first_value(col, ignore_nulls: bool = False) -> Column:
    return F.first(col, ignorenulls=ignore_nulls)


def last_value(col, ignore_nulls: bool = False) -> Column:
    return F.last(col, ignorenulls=ignore_nulls)


def over(expr: Column, window) -> Column:
    from daft_spark.window import Window as DWindow

    spec = window.spec if isinstance(window, DWindow) else window
    return expr.over(spec)
