"""Window spec — parity with ``daft.Window`` (reference:
``daft/window.py:12``: partition_by/order_by/rows_between/range_between)
as a thin builder over ``pyspark.sql.Window``; window functions live in
``pyspark.sql.functions`` (row_number/rank/dense_rank/lag/lead/first/
last — reference ``daft/functions/window.py:14-371``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import Window as SparkWindow
from pyspark.sql import functions as F

unbounded_preceding = SparkWindow.unboundedPreceding
unbounded_following = SparkWindow.unboundedFollowing
current_row = SparkWindow.currentRow


class Window:
    """daft.Window-style builder; ``spec`` yields the pyspark WindowSpec."""

    def __init__(self):
        self._partition_by: list = []
        self._order_by: list = []
        self._frame: tuple | None = None
        self._range: bool = False

    def partition_by(self, *cols) -> "Window":
        w = self._copy()
        w._partition_by = list(cols)
        return w

    def order_by(self, *cols, desc: bool | list[bool] = False) -> "Window":
        w = self._copy()
        descs = desc if isinstance(desc, (list, tuple)) else [desc] * len(cols)
        out = []
        for c, d in zip(cols, descs):
            col = F.col(c) if isinstance(c, str) else c
            # daft ordering defaults: asc->nulls last, desc->nulls first
            out.append(col.desc_nulls_first() if d else col.asc_nulls_last())
        w._order_by = out
        return w

    def rows_between(self, start, end) -> "Window":
        w = self._copy()
        w._frame, w._range = (start, end), False
        return w

    def range_between(self, start, end) -> "Window":
        w = self._copy()
        w._frame, w._range = (start, end), True
        return w

    def _copy(self) -> "Window":
        w = Window()
        w._partition_by = list(self._partition_by)
        w._order_by = list(self._order_by)
        w._frame, w._range = self._frame, self._range
        return w

    @property
    def spec(self):
        s = SparkWindow.partitionBy(*self._partition_by)
        if self._order_by:
            s = s.orderBy(*self._order_by)
        if self._frame is not None:
            lo, hi = self._frame
            s = s.rangeBetween(lo, hi) if self._range else s.rowsBetween(lo, hi)
        return s


def over(expr: Column, window: Window) -> Column:
    """reference daft/functions/window.py over(): expr.over(window)."""
    return expr.over(window.spec)
