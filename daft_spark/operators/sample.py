"""Sampling beyond Spark's fraction-based sample.

Parity: the reference supports size-based sampling
(reference: ``ops/sample.rs:15`` — fraction OR size, with/without
replacement, seeded; ``streaming_sink/sample.rs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_fraction(df: DataFrame, fraction: float, with_replacement: bool = False,
                    seed: int | None = None) -> DataFrame:
    return df.sample(with_replacement, fraction, seed)


def sample_size(df: DataFrame, n: int, seed: int | None = None,
                exact: bool = True) -> DataFrame:
    """~n uniformly sampled rows. Strategy: count once, over-sample by
    10% at the implied fraction, trim to exactly n (ordered by a seeded
    hash for determinism). One count job + one sample pass — no driver
    materialization of data rows."""
    total = df.count()
    if total <= n:
        return df
    frac = min(1.0, (n / total) * 1.1 + (10.0 / total))
    s = df.sample(False, frac, seed)
    if not exact:
        return s
    # deterministic trim: order by seeded hash of all columns
    h = F.xxhash64(F.lit(seed if seed is not None else 0), *[F.col(c) for c in df.columns])
    return s.orderBy(h).limit(n)
