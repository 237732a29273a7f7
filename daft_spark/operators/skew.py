"""Skew mitigation — salted joins for hot keys.

AQE's skew-join splitting (enabled in context.py) handles most skew at
runtime; salting is the explicit fallback for pathological hot keys
(one key >> everything else) where even split partitions overwhelm a
task. Standard technique: replicate the build side across N salts,
scatter the probe side randomly, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    num_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with salt-scattered left side and salt-replicated right
    side: the hot key's rows spread over ``num_salts`` tasks instead of
    one. Supports inner/left joins (right side is the replicated one —
    put the smaller/dimension side there). Cost: right side inflated
    x num_salts; use only when a key is hot enough to dominate a stage.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    left_s = left.withColumn("__salt", (F.rand(seed) * num_salts).cast("int"))
    right_s = right.withColumn("__salt", F.explode(salts))
    out = left_s.join(right_s, keys + ["__salt"], how)
    return out.drop("__salt")
