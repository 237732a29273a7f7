"""Aggregation helpers that Spark lacks as built-ins.

Parity targets from the reference's ``AggExpr`` enum
(reference: ``src/daft-dsl/src/expr/mod.rs:395-501``): Product,
Count(mode), Concat (string_agg), plus deterministic collect helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def product(col: Column | str) -> Column:
    """Product aggregate (reference AggExpr::Product, mod.rs:406) via
    exp(sum(ln|x|)) with sign/zero bookkeeping — stays JVM-side, gets
    partial aggregation for free (a naive UDAF would not).
    Nulls are ignored, like the other aggregates."""
    c = _c(col)
    has_zero = F.max(F.when(c == 0, 1).otherwise(0)) == 1
    neg_parity = F.sum(F.when(c < 0, 1).otherwise(0)) % 2
    magnitude = F.exp(F.sum(F.when(c != 0, F.log(F.abs(c)))))
    signed = magnitude * F.when(neg_parity == 1, -1.0).otherwise(1.0)
    return F.when(F.count(c) == 0, F.lit(None).cast("double")).otherwise(
        F.when(has_zero, 0.0).otherwise(signed)
    )


def count_all() -> Column:
    """CountMode::All — counts rows incl. nulls (reference
    src/daft-core/src/count_mode.rs)."""
    return F.count(F.lit(1))


def count_valid(col: Column | str) -> Column:
    """CountMode::Valid — non-null count (Spark's default count)."""
    return F.count(_c(col))


def count_null(col: Column | str) -> Column:
    """CountMode::Null — null count."""
    return F.sum(F.when(_c(col).isNull(), 1).otherwise(0)).cast("long")


def string_agg(col: Column | str, delimiter: str = ",") -> Column:
    """AggExpr::Concat (string_agg, mod.rs:454) — deterministic: elements
    sorted before joining."""
    return F.array_join(F.array_sort(F.collect_list(_c(col))), delimiter)


def collect_sorted(col: Column | str) -> Column:
    """collect_list with deterministic (sorted) element order."""
    return F.array_sort(F.collect_list(_c(col)))


def collect_set_sorted(col: Column | str) -> Column:
    """collect_set with deterministic order (AggExpr::Set, mod.rs:451)."""
    return F.array_sort(F.collect_set(_c(col)))
