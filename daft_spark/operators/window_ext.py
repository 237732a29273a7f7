"""Window extensions beyond built-in Spark windows.

``min_periods`` parity: the reference's ``WindowSpec.min_periods``
(reference: ``src/daft-dsl/src/expr/window.rs:92-105``) emits null until
the frame holds at least N non-null rows — wrapped here as
``when(count(x).over(w) >= n, agg.over(w))`` per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def with_min_periods(agg_col: Column, count_col: Column, window, n: int) -> Column:
    """Null out a windowed aggregate until >= n non-null rows in frame."""
    return F.when(F.count(count_col).over(window) >= n, agg_col.over(window))
