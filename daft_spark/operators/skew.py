"""Skew mitigation — salted joins for hot keys.

AQE's skew-join splitting (enabled in context.py) handles most skew at
runtime; salting is the explicit fallback for pathological hot keys
(one key >> everything else) where even split partitions overwhelm a
task. Standard technique: replicate the build side across N salts,
scatter the probe side randomly, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def key_skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top_k: int = 10,
    approx: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Pre-shuffle KEY-DISTRIBUTION AUDIT — run it on a join/groupBy
    key before committing a 100 TB shuffle to it: the top-k heaviest
    keys (rank, key, key_rows) with the global distribution attached
    to every row (n_keys, n_rows, max_key_rows, p50/p99 of per-key
    row counts, skew_ratio = max/mean). A skew_ratio in the tens says
    AQE skew-split will sweat; in the hundreds says salt or re-key
    (salted_join above).

    Scale: ONE map-side-combining groupBy over the key (the same
    exchange the audited operation would do, minus the payload; the
    only exchange of key-grain rows in the plan — asserted in
    tests/test_plans.py), a 1-row global aggregate broadcast onto the
    top-k, and the top-k via orderBy+limit (TakeOrderedAndProject —
    no global sort).

    Percentiles: the DEFAULT ``approx=True`` uses percentile_approx
    (Greenwald-Khanna, bounded ~``accuracy`` buffer entries per
    aggregation buffer) — the right mode for the audit's own target,
    billion-key joins, where Spark's exact ``percentile`` would buffer
    EVERY per-key count in one aggregation buffer (fine to ~1e8 keys,
    OOM beyond; r10 verdict task 3). GK guarantees a rank error
    <= n_keys/accuracy, so at the default accuracy the reported p50
    sits within +-0.01% of the true rank. Pass ``approx=False`` for
    exact percentiles (the oracle path; corpus-audit scale only)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_rows"))
    if approx:
        p50 = F.percentile_approx("key_rows", 0.5, accuracy).cast("double")
        p99 = F.percentile_approx("key_rows", 0.99, accuracy).cast("double")
    else:
        p50 = F.percentile("key_rows", 0.5)
        p99 = F.percentile("key_rows", 0.99)
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("key_rows").alias("n_rows"),
        F.max("key_rows").alias("max_key_rows"),
        p50.alias("p50_key_rows"),
        p99.alias("p99_key_rows"),
        F.round(
            F.max("key_rows") / (F.sum("key_rows") / F.count(F.lit(1))), 6
        ).alias("skew_ratio"),
    )
    top = (
        counts.select(key_str.alias("key"), "key_rows")
        .orderBy(F.col("key_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("key_rows").desc(), F.col("key").asc())
    ranked = top.withColumn("rank", F.row_number().over(w).cast("int"))
    return ranked.crossJoin(F.broadcast(summary)).select(
        "rank", "key", "key_rows", "n_keys", "n_rows", "max_key_rows",
        "p50_key_rows", "p99_key_rows", "skew_ratio",
    )
