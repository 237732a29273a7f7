"""Range joins — point-in-interval and interval-overlap joins as
BINNED EQUI-JOINS. Vanilla Spark plans a range predicate as a
BroadcastNestedLoopJoin (quadratic corpus x corpus at scale); the
standard fix is a grid: quantize the range dimension into fixed-width
bins, replicate each interval onto every bin it covers (keys-only
explode), join on the bin id (a plain shuffled/broadcast equi-join),
and re-check the exact predicate as a residual filter.

Correctness without a dedup pass:
- point-in-interval: a point lives in exactly ONE bin, so each
  qualifying (point, interval) pair is produced exactly once — no
  distinct needed.
- interval-overlap: both sides replicate, so a pair can meet in many
  bins; each pair is OWNED by the single bin containing
  max(a.start, b.start) (the overlap's left edge), and the residual
  keeps only the meeting in the owning bin — exactly-once without a
  distinct.

Pick ``bin_size`` near the typical interval length: replication
factor = interval_length / bin_size + 1, while too-large bins put
many non-matching rows in each bin for the residual to discard. Both
costs are linear and local — nothing is ever corpus x corpus.
(This is the same technique Databricks exposes as RANGE_JOIN bin
hints; Spark OSS has no built-in equivalent.)

Reference surface: the reference has no range join (its as-of join at
daft/dataframe/dataframe.py:3964 is the nearest relative); this is
the engine's scale extension, SURVEY §2.1's custom-operator column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "interval_overlap_join"]


def _bin(col, bin_size: float):
    return F.floor(col.cast("double") / F.lit(float(bin_size))).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: float,
    inclusive: str = "both",
) -> DataFrame:
    """All (point row, interval row) pairs with the point inside
    [start, end] (``inclusive``: 'both'|'left'|'right'|'neither').
    Output columns = points' columns then intervals' columns (names
    must not collide). Each qualifying pair appears exactly once."""
    if bin_size <= 0:
        raise ValueError("bin_size must be > 0")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"colliding columns: {sorted(overlap)}")
    iv = intervals.select(
        "*",
        F.explode(
            F.sequence(
                _bin(F.col(start_col), bin_size), _bin(F.col(end_col), bin_size)
            )
        ).alias("__bin"),
    )
    pt = points.select("*", _bin(F.col(point_col), bin_size).alias("__bin"))
    p = F.col(point_col)
    lo = p >= F.col(start_col) if inclusive in ("both", "left") else p > F.col(start_col)
    hi = p <= F.col(end_col) if inclusive in ("both", "right") else p < F.col(end_col)
    return (
        pt.join(iv, "__bin")
        .filter(lo & hi)
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_size: float,
) -> DataFrame:
    """All (left row, right row) pairs whose closed intervals overlap
    (l_start <= r_end AND r_start <= l_end). Each pair appears exactly
    once: the pair is emitted only in the bin containing the overlap's
    left edge max(l_start, r_start)."""
    if bin_size <= 0:
        raise ValueError("bin_size must be > 0")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"colliding columns: {sorted(overlap)}")
    l = left.select(
        "*",
        F.explode(
            F.sequence(
                _bin(F.col(left_start), bin_size), _bin(F.col(left_end), bin_size)
            )
        ).alias("__bin"),
    )
    r = right.select(
        "*",
        F.explode(
            F.sequence(
                _bin(F.col(right_start), bin_size), _bin(F.col(right_end), bin_size)
            )
        ).alias("__bin"),
    )
    meet = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    owner = _bin(F.greatest(F.col(left_start), F.col(right_start)), bin_size)
    return (
        l.join(r, "__bin")
        .filter(meet & (F.col("__bin") == owner))
        .drop("__bin")
    )
