"""Deterministic corpus-subsetting operators: stratified quota
sampling and token-budget data mixing — the selection stages of an
LLM training-data pipeline (pick N documents per language, fill a
per-source token budget for the target mixture).

Both use a DETERMINISTIC pseudo-random order — ``md5(id)`` — instead
of ``rand()``: the selection is then reproducible across runs,
partitionings, and engines (DuckDB computes the identical md5), which
is what makes these exactly oracle-checkable and what a production
pipeline wants anyway (re-running the mix must pick the same
documents). ``rand(seed)`` is partitioning-dependent in Spark, so it
is NOT reproducible at scale.

100 TB posture: both are one window function over (strata, hash) —
a single shuffle on the strata key; skewed strata are AQE's problem
(the same shape as any groupBy). No driver collection, no sampling
pass. Reference surface: the reference exposes ``DataFrame.sample``
and shard-based subsetting (ops/sample.rs, shard.rs); quota and
budget selection are the pipeline-level counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_sample", "token_budget_select"]


def _det_order(id_col: str):
    """Deterministic shuffle key: md5 of the id's string form (ties
    broken by the id itself for total order)."""
    return [F.md5(F.col(id_col).cast("string")), F.col(id_col)]


def stratified_sample(
    df: DataFrame, strata_cols: list[str], n_per_stratum: int, id_col: str
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer when the
    stratum is smaller), chosen by the deterministic md5 order."""
    w = Window.partitionBy(*strata_cols).orderBy(*_det_order(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def token_budget_select(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    budget: int,
    id_col: str,
) -> DataFrame:
    """Greedy budget fill: walk each group in the deterministic md5
    order and keep rows while the RUNNING total of ``weight_col``
    (e.g. a token count) stays within ``budget`` — the data-mixing
    step that assembles a target corpus composition. Returns the kept
    rows with their running total as ``__cum``."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*_det_order(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("__cum", F.sum(weight_col).over(w)).filter(
        F.col("__cum") <= budget
    )
