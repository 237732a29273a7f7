"""As-of join — backward / forward / nearest, with optional ``by`` keys.

Parity target: ``DataFrame.join_asof`` (reference:
``daft/dataframe/dataframe.py:3964-4006``; strategies
``src/daft-core/src/join.rs:158-162``; native impl
``src/daft-local-execution/src/join/asof_join.rs``). ``nearest`` breaks
ties toward the forward match (reference: ``dataframe.py:3989``).

Spark-first design (no per-row Python): the classic union-marker +
window composition —

1. Pack the right side's payload columns into one struct, tag right
   rows 0 and left rows 1, ``unionByName`` the two sides.
2. One window per strategy over ``(by..., t, tag)``:
   backward = ``last(payload, ignorenulls=True)`` over
   ``(-inf, current)``; forward = the mirror with negated time.
3. Keep left rows, unpack the struct.

Cost model at scale: exactly ONE shuffle on the ``by`` keys (the window
partition), no join explosion, no driver materialization — each
partition is then a linear merge, the same asymptotics as the
reference's sorted-merge as-of kernel.

Without ``by`` keys the naive plan would be a single-partition global
window (a serial scale-killer). This module instead RANGE-BUCKETS the
time axis: rows land in ``num_buckets`` equal-width time buckets, the
window runs partitioned by bucket (parallel), and each bucket's match is
stitched with a "carry" — the latest right payload from all earlier
buckets, computed from a tiny per-bucket summary (<= num_buckets rows)
and broadcast back. Net: two key-only shuffles, no single-partition
stage, identical results to the global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STRATEGIES = ("backward", "forward", "nearest")


def _with_time_key(df: DataFrame, on: str, name: str) -> DataFrame:
    """Normalize the as-of key to int64 for uniform window arithmetic."""
    dtype = dict(df.dtypes)[on]
    c = F.col(on)
    if dtype.startswith("timestamp"):
        key = F.unix_micros(c.cast("timestamp"))
    elif dtype == "date":
        key = F.datediff(c, F.lit("1970-01-01").cast("date")).cast("long")
    else:
        key = c.cast("long") if dtype in ("int", "bigint", "smallint", "tinyint") else c.cast("double")
    return df.withColumn(name, key)


def _directional(
    union_df: DataFrame,
    by: list[str],
    sign: int,
    payload: str,
    out: str,
    num_buckets: int | None = None,
) -> DataFrame:
    """Attach the backward (sign=+1) or forward (sign=-1) match struct.

    With ``by`` keys: one window partitioned on them. Without ``by``
    keys and with ``num_buckets``: the range-bucketed global path (see
    module docstring) — never a single-partition window."""
    order = [(F.col("__asof_t") * sign).asc(), F.col("__asof_tag").asc()]
    if by or not num_buckets or num_buckets <= 1:
        w = (
            Window.partitionBy(*by).orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return union_df.withColumn(out, F.last(payload, ignorenulls=True).over(w))

    u = union_df
    t = F.col("__asof_t") * sign  # direction-normalized axis (asc = match order)
    bounds = u.agg(F.min(t).alias("__lo"), F.max(t).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(num_buckets)
    bkt = (
        F.when(F.col("__hi") <= F.col("__lo"), F.lit(1))
        .otherwise(F.least(F.lit(num_buckets),
                           (F.floor((t - F.col("__lo")) / width) + 1).cast("int")))
        .cast("int")
    )
    u = u.crossJoin(F.broadcast(bounds)).withColumn("__bkt", bkt).drop("__lo", "__hi")
    w_in = (
        Window.partitionBy("__bkt").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__in", F.last(payload, ignorenulls=True).over(w_in))
    # Carry: per-bucket latest right payload (tiny: <= num_buckets rows),
    # then running-last over the bucket spine so empty buckets inherit.
    per_bucket = (
        u.filter(F.col("__asof_tag") == 0)
        .groupBy("__bkt")
        .agg(F.max_by(F.col(payload), t).alias("__blast"))
    )
    spine = u.sparkSession.range(1, num_buckets + 1).select(
        F.col("id").cast("int").alias("__bkt")
    )
    w_carry = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        spine.join(per_bucket, "__bkt", "left")
        .withColumn("__carry", F.last("__blast", ignorenulls=True).over(w_carry))
        .select("__bkt", "__carry")
    )
    return (
        u.join(F.broadcast(carry), "__bkt", "left")
        .withColumn(out, F.coalesce(F.col("__in"), F.col("__carry")))
        .drop("__in", "__carry", "__bkt")
    )


def _right_plan_bytes(right: DataFrame) -> int:
    """Catalyst's size estimate for the right plan (used to decide the
    broadcast fast path). -1 when unavailable."""
    try:
        return int(
            right._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return -1


def _broadcast_asof(
    l: DataFrame,
    r: DataFrame,
    by: list[str],
    strategy: str,
) -> DataFrame:
    """Broadcast-range fast path: the right side collapses to ONE
    sorted array of (t, payload) per ``by`` group, broadcast to every
    left task — the LEFT side (the fact table at scale) is never
    shuffled at all. Matching is pure JVM: ``filter`` the array on the
    time predicate and take the boundary element (``try_element_at``
    handles the no-match case). Linear in the group's right rows per
    left row, which is exactly when broadcast is the right plan anyway
    (dimension-sized right). Mirrors the reference's probe-side
    build-table strategy for small as-of inputs
    (src/daft-local-execution/src/join/asof_join.rs)."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("__asof_t").alias("t"),
                                F.col("__asof_payload").alias("p"))),
        lambda a, b: F.when(a["t"] < b["t"], -1)
        .when(a["t"] > b["t"], 1)
        .otherwise(0),
    ).alias("__asof_arr")
    rg = r.groupBy(*by).agg(ordered) if by else r.groupBy().agg(ordered)
    j = (
        l.join(F.broadcast(rg), by, "left")
        if by
        else l.crossJoin(F.broadcast(rg))
    )
    lt = F.col("__asof_t")
    arr = F.col("__asof_arr")
    bwd = F.try_element_at(F.filter(arr, lambda x: x["t"] <= lt), F.lit(-1))
    fwd = F.try_element_at(F.filter(arr, lambda x: x["t"] >= lt), F.lit(1))
    if strategy == "backward":
        match = bwd
    elif strategy == "forward":
        match = fwd
    else:  # nearest: closer side, ties prefer forward (reference tie rule)
        pick_bwd = fwd.isNull() | (
            bwd.isNotNull() & ((lt - bwd["t"]) < (fwd["t"] - lt))
        )
        match = F.when(pick_bwd, bwd).otherwise(fwd)
    return j.withColumn("__match", match["p"]).drop("__asof_arr")


def join_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    strategy: str = "backward",
    right_on: str | None = None,
    suffix: str = "_right",
    num_buckets: int | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the single best right match.

    backward: latest right with ``r.on <= l.on``;
    forward:  earliest right with ``r.on >= l.on``;
    nearest:  min ``|r.on - l.on|``, ties prefer the forward match.
    Right rows with a null key never match; left rows always survive.

    Without ``by`` keys the global ordering is range-bucketed into
    ``num_buckets`` (default 2x parallelism) parallel window partitions
    with boundary stitching — pass ``num_buckets=1`` to force the serial
    single-window plan.

    ``broadcast``: force (True) or forbid (False) the broadcast-range
    fast path — right side collapsed to per-group sorted arrays and
    broadcast, so the left side is NEVER shuffled. Default None
    auto-enables it only for ``nearest`` with a right plan Catalyst
    estimates under ``spark.daft.asofBroadcastThreshold`` bytes
    (default 256 MB). A/B at sf10 (probes/ASOF_AB.json, hash-verified
    identical results): backward/forward window 1.1s vs broadcast 1.8s
    (the array build dominates — window keeps those), nearest window
    7.0s vs broadcast 4.2s (one broadcast array replaces TWO
    directional window passes — broadcast wins). Re-verified r14
    (probes/ASOF_BACKWARD_AB_r14.json): backward-by window 0.9s vs
    broadcast 1.4s forced at sf10 — the registered row's remaining
    gap is presentation orderBy + driver collect of the full click
    stream (6.4s of the 7.3s row), not the join plan (the raw operator
    beats DuckDB's whole query, 0.9s vs 1.5s).
    """
    if strategy not in _STRATEGIES:
        raise ValueError(f"strategy must be one of {_STRATEGIES}, got {strategy!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    right_on = right_on or on
    if broadcast is None:
        if strategy != "nearest":
            broadcast = False
        else:
            try:
                thresh = int(
                    left.sparkSession.conf.get(
                        "spark.daft.asofBroadcastThreshold", str(256 * 1024 * 1024)
                    )
                )
            except ValueError:
                thresh = 256 * 1024 * 1024
            size = _right_plan_bytes(right)
            broadcast = 0 < size <= thresh
    if not by and num_buckets is None:
        num_buckets = max(2, left.sparkSession.sparkContext.defaultParallelism * 2)

    left_cols = left.columns
    # Right payload: everything except by/on keys, deconflicted names.
    r_payload_cols = [c for c in right.columns if c not in by and c != right_on]
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in r_payload_cols
    }

    l = _with_time_key(left, on, "__asof_t").withColumn("__asof_tag", F.lit(1))
    r = _with_time_key(right.filter(F.col(right_on).isNotNull()), right_on, "__asof_t")
    r = r.select(
        *[F.col(c) for c in by],
        "__asof_t",
        F.lit(0).alias("__asof_tag"),
        F.struct(
            F.col("__asof_t").alias("__asof_rt"),
            *[F.col(c).alias(out_names[c]) for c in r_payload_cols],
        ).alias("__asof_payload"),
    )
    if broadcast:
        matched = _broadcast_asof(l, r, by, strategy)
        return matched.select(
            *[F.col(c) for c in left_cols],
            *[
                F.col(f"__match.{out_names[c]}").alias(out_names[c])
                for c in r_payload_cols
            ],
        )

    u = l.unionByName(r, allowMissingColumns=True)

    if strategy in ("backward", "forward"):
        sign = 1 if strategy == "backward" else -1
        u = _directional(u, by, sign, "__asof_payload", "__match", num_buckets)
        matched = u.filter(F.col("__asof_tag") == 1)
    else:  # nearest: take both directions, pick the closer (tie -> forward)
        u = _directional(u, by, 1, "__asof_payload", "__bwd", num_buckets)
        u = _directional(u, by, -1, "__asof_payload", "__fwd", num_buckets)
        matched = u.filter(F.col("__asof_tag") == 1)
        bwd_d = F.col("__asof_t") - F.col("__bwd.__asof_rt")
        fwd_d = F.col("__fwd.__asof_rt") - F.col("__asof_t")
        pick_bwd = F.col("__fwd").isNull() | (F.col("__bwd").isNotNull() & (bwd_d < fwd_d))
        matched = matched.withColumn(
            "__match", F.when(pick_bwd, F.col("__bwd")).otherwise(F.col("__fwd"))
        )

    result = matched.select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"__match.{out_names[c]}").alias(out_names[c]) for c in r_payload_cols],
    )
    return result
