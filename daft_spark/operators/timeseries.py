"""Time-series operators over event streams: EWMA and time-weighted
averages — the per-entity smoothing/averaging primitives of metrics
pipelines, expressed as closed-form window aggregations (no recursion,
no UDF, one shuffle on the entity key).

EWMA's recurrence y_0 = x_0, y_t = a*x_t + (1-a)*y_{t-1} unrolls to
the closed form y_t = sum_i z_i (1-a)^(t-i) with z_0 = x_0 and
z_i = a*x_i (adjust=False, position-indexed — the pandas ewm
convention). A naive window of that sum re-touches every prefix row
per output row (O(n^2)); instead both engines compute
s_t = sum_i z_i / (1-a)^i as ONE running window sum and
scale by (1-a)^t — O(n) with two pows per row. The scaled running sum
grows as (1-a)^(-i), so sequences are REBASED in fixed-size blocks
(``block``): within a block the exponent is bounded (no overflow), and
each block's carry-in is the previous block's exact EWMA value damped
by (1-a)^steps — still exact, still one window pass per block level.

For the bounded per-key series the driver fixture has (and any metrics
window in practice) a single block suffices; the block machinery is the
overflow guard that makes the closed form safe for million-event keys.

Reference surface: the reference's expression library ships
cumulative/window aggregations (src/daft-functions/ cumulative ops);
EWMA/TWAP are their canonical composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    value_col: str,
    order_col: str | list[str],
    by: list[str] | None = None,
    alpha: float = 0.3,
    out_col: str = "ewma",
    block: int = 512,
) -> DataFrame:
    """Position-indexed EWMA (pandas ewm(alpha=..., adjust=False)
    semantics) per ``by`` group ordered by ``order_col``. Null values
    carry the previous EWMA forward (no weight consumed) — the pandas
    ignore-na=False convention is NOT applied to keep the closed form
    exact; nulls are simply excluded from indexing."""
    import math

    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    if block < 2:
        raise ValueError("block must be >= 2")
    # overflow guard: within a block the scaled sum carries up to
    # beta^-(block-1); cap so it stays well under DBL_MAX for any alpha
    beta_cap = int(140 / max(-math.log10(1.0 - alpha), 1e-9))
    block = max(2, min(block, beta_cap))
    keys = by or []
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    d = df.filter(F.col(value_col).isNotNull())
    wo = Window.partitionBy(*keys).orderBy(*order)
    d = d.withColumn("__i", F.row_number().over(wo) - 1)
    d = d.withColumn("__blk", (F.col("__i") / block).cast("long"))
    d = d.withColumn("__j", F.col("__i") % block)
    beta = 1.0 - alpha
    # adjust=False unrolls to y_t = sum_i z_i beta^(t-i) with z_0 = x_0
    # (weight 1 — the recurrence seeds y_0 = x_0) and z_i = alpha*x_i
    # for i >= 1. within-block: running sum of z_j / beta^j, scaled
    # back by beta^j.
    x = F.col(value_col).cast("double")
    z = F.when(F.col("__i") == 0, x).otherwise(F.lit(alpha) * x)
    wblk = (
        Window.partitionBy(*keys, "__blk")
        .orderBy("__j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("__z", z)
    d = d.withColumn(
        "__within",
        F.pow(F.lit(beta), F.col("__j"))
        * F.sum(F.col("__z") / F.pow(F.lit(beta), F.col("__j"))).over(wblk),
    )
    # block carry: the last within-block value of each block, damped
    # into the next block: carry_{b} = (prev carry damped block steps
    # + prev block's within-sum at its last row) * beta^(j+1) ... the
    # per-row carry contribution is carry_b * beta^(j+1) where carry_b
    # folds ALL previous blocks. Computed with a second cumulative pass
    # over block summaries (tiny: n/block rows).
    last = d.groupBy(*keys, "__blk").agg(
        F.max(F.struct("__j", "__within")).alias("__l")
    ).select(
        *keys, "__blk",
        F.col("__l.__j").alias("__lastj"), F.col("__l.__within").alias("__lw"),
    )
    wcarry = (
        Window.partitionBy(*keys)
        .orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry into block b = sum over prior blocks p of lw_p damped by
    # the number of steps from p's last row to b's row j:
    # steps = (b*block + j) - (p*block + lastj_p). Split the exponent:
    # beta^(b*block + j) * sum_p lw_p / beta^(p*block + lastj_p).
    last = last.withColumn(
        "__inv", F.col("__lw") / F.pow(F.lit(beta),
                                       F.col("__blk") * block + F.col("__lastj"))
    ).withColumn("__carry_inv", F.sum("__inv").over(wcarry))
    d = d.join(
        last.select(*keys, "__blk", "__carry_inv"), [*keys, "__blk"], "left"
    )
    carry = (
        F.coalesce(F.col("__carry_inv"), F.lit(0.0))
        * F.pow(F.lit(beta), F.col("__blk") * block + F.col("__j"))
    )
    return d.withColumn(out_col, F.col("__within") + carry).drop(
        "__i", "__blk", "__j", "__z", "__within", "__carry_inv"
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    by: list[str] | None = None,
    out_col: str = "twap",
    tiebreak: str | None = None,
) -> DataFrame:  # ts_col must be numeric (epoch seconds); cast upstream
    """Per-group TIME-weighted average (TWAP): each value holds from
    its timestamp to the next event's (last value gets zero weight —
    the standard left-Riemann convention). One group: (group, twap,
    first_ts, last_ts, n_events). Groups with one event fall back to
    that value. Pass ``tiebreak`` (a unique column) when timestamps
    can collide — tied rows' hold intervals depend on order, so the
    result is only deterministic with a total order. One shuffle on
    the key; lag/lead stay in the window."""
    keys = by or []
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    wo = Window.partitionBy(*keys).orderBy(*order)
    d = df.filter(F.col(value_col).isNotNull()).withColumn(
        "__dt",
        (
            F.lead(F.col(ts_col).cast("double")).over(wo)
            - F.col(ts_col).cast("double")
        ),
    )
    # Fallback (single event, or sum(dt)=0 when every timestamp ties):
    # the FIRST value in (ts, tiebreak, value) order. min(struct) is
    # order-deterministic across partitionings — a bare F.first() is
    # not, and the sum(dt)=0 case reaches it with >1 candidate row.
    first_val = F.min(
        F.struct(
            *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order)],
            F.col(value_col).cast("double").alias("__v"),
        )
    ).getField("__v")
    agg = d.groupBy(*keys).agg(
        (
            F.coalesce(
                F.sum(F.col(value_col) * F.col("__dt")) / F.sum("__dt"),
                first_val,
            )
        ).alias(out_col),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg


def ewma_windowed(
    df: DataFrame,
    value_col: str,
    order_col: str | list[str],
    by: list[str] | None = None,
    k: int = 32,
    scale: int = 100,
    out_col: str = "ewma",
) -> DataFrame:
    """ENGINE-EXACT truncated EWMA with alpha = 1/2: the recurrence
    truncated to the last ``k`` observations (truncation error 2^-k —
    below double resolution at k=32), computed ENTIRELY in integer
    arithmetic so the result is bit-identical in any engine regardless
    of summation order (float window sums are NOT: DuckDB aggregates
    windows over a segment tree, Spark sequentially — same math,
    different rounding; measured as driver-strictness flips in the
    alpha=0.3 float formulation).

    Derivation: with dyadic alpha, y_t * 2^L (L = min(t+1, k)) is an
    INTEGER combination of the last L quantized values: position p
    (oldest-first) carries coefficient 2^p, plus one extra +x_oldest —
    the window's oldest value is always the restarted recurrence's
    seed, so the weights sum to exactly 1.
    ``scale`` quantizes values (exact when inputs have fixed decimals;
    documented approximation otherwise). Magnitude bound: the window
    weights sum to exactly 2^L (L <= k), so the integer accumulator is
    bounded by max|x|*scale * 2^k and needs max|x|*scale < 2^(63-k) to
    fit a long — k=32/scale=100 covers |x| <= ~2.1e7. Quantized inputs
    past that bound raise at runtime (a silent wrap would corrupt
    every window containing the row)."""
    if k < 1 or k > 53:
        raise ValueError("k must be in [1, 53]")
    keys = by or []
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    wf = Window.partitionBy(*keys).orderBy(*order).rowsBetween(-(k - 1), 0)
    xi_bound = 1 << (63 - k)  # |xi| >= this overflows sum(|xi|*2^p)
    xi = F.round(F.col(value_col) * scale).cast("long")
    d = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn(
            "__xi",
            F.when(F.abs(xi) < F.lit(xi_bound), xi).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"ewma_windowed: |value*scale| must be < "
                            f"2^{63 - k} (= {xi_bound}) to fit the "
                            f"k={k} integer accumulator; got "
                        ),
                        xi.cast("string"),
                    )
                ).cast("long")
            ),
        )
        .withColumn("__vals", F.collect_list("__xi").over(wf))
    )
    L = F.size("__vals")
    s = F.aggregate(
        F.zip_with(
            F.col("__vals"),
            F.sequence(F.lit(0), L - 1),
            # 2^p via double pow, exact for p <= 52, cast back to long
            lambda x, p: x * F.pow(F.lit(2.0), p).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    # the oldest kept value is ALWAYS the window's seed (y = x_oldest,
    # recurrence restarted within the window): its weight is
    # 2^-(L-1) = twice the non-seed 2^-L coefficient, so the weights
    # sum to exactly 1 — the renormalized truncation
    seed_extra = F.element_at(F.col("__vals"), 1)
    y = (s + seed_extra) / F.pow(F.lit(2.0), L) / F.lit(float(scale))
    return d.withColumn(out_col, y).drop("__xi", "__vals")
