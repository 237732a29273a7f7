"""Event-sequence analytics: ordered funnels and retention cohorts —
the two queries every product-analytics workload runs over an event
stream (the reference's users run them over the same event tables its
time-series/window operators serve; this engine expresses them as
plain aggregations so Catalyst plans them like any other groupBy).

Scale design (100 TB posture): both operators reduce the event stream
per user with map-side-combining conditional aggregations — the only
exchanges are keyed on user_id (then on the tiny cohort/stage grain).
No window over the raw stream, no per-user event materialization, no
driver loops: an n-step funnel is n narrow hash-agg passes over an
ever-shrinking survivor set, retention is two aggs total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "retention_cohorts", "top_event_paths", "resample_gapfill", "profile_columns"]


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """ORDERED FUNNEL: for each user, the earliest time they completed
    each step STRICTLY AFTER completing the previous one (the standard
    product-analytics conversion query: view -> click -> purchase).
    Returns one row per user who completed step 1, with one timestamp
    column per step (``t1..tn``, NULL once the funnel breaks) and the
    deepest ``stage_reached``.

    Semantics: t1 = min ts of steps[0]; t_{i+1} = min ts of steps[i+1]
    with ts > t_i — the unambiguous "first qualifying chain" funnel
    (re-orderings of later events cannot resurrect a broken step, and
    every t_i is a real event time). Repeated step names are allowed
    (e.g. click -> click counts a second distinct click after the
    first). ``within_seconds`` adds the standard CONVERSION WINDOW:
    each step must also land within that many seconds of the
    PREVIOUS step (per-hop window, the product-analytics default) —
    a later qualifying event outside the window breaks the funnel for
    that user, matching the first-qualifying-chain semantics.

    Scale: step i is one conditional min() aggregation over events
    pre-filtered to that step's type, joined to the step-(i-1)
    survivors on user_id — each pass shrinks the frame and every
    aggregation combines map-side. No window over the event stream,
    no collect_list of per-user histories (funnels over power users
    with 10^7 events would OOM an in-row list; this shape never
    builds one)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = df.select(
        F.col(user_col), F.col(ts_col).alias("__ts"), F.col(event_col).alias("__e")
    )
    cur = (
        ev.filter(F.col("__e") == steps[0])
        .groupBy(user_col)
        .agg(F.min("__ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        cond = F.col("__ts") > F.col("__prev")
        if within_seconds is not None:
            cond = cond & (
                F.unix_timestamp(F.col("__ts"))
                <= F.unix_timestamp(F.col("__prev")) + int(within_seconds)
            )
        nxt = (
            ev.filter(F.col("__e") == step)
            .join(cur.select(user_col, F.col(f"t{i-1}").alias("__prev")), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    stage = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage = F.when(F.col(f"t{i}").isNotNull(), i).otherwise(stage)
    # stage_reached must be the deepest CONTIGUOUS step; since t_i is
    # only computed from t_{i-1} survivors, t_i isNotNull implies all
    # earlier steps — the last non-null wins.
    cols = [F.col(user_col)] + [F.col(f"t{i}") for i in range(1, len(steps) + 1)]
    return cur.select(*cols, stage.cast("int").alias("stage_reached"))


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """RETENTION COHORTS: users are cohorted by the period of their
    FIRST event, and counted in every later period they returned —
    the classic triangle ``(cohort_period, period_n, n_active,
    retention)`` with retention = n_active / cohort size (period 0
    row is the cohort size itself, retention 1.0 by construction).

    Period arithmetic is integer epoch-second math — floor((t -
    t_first)/period) — not calendar truncation, so it is replayable
    bit-exactly in any engine and has no timezone/week-start
    ambiguity. ``cohort_period`` is the cohort's period start as an
    epoch-second long (cast to timestamp downstream if wanted).

    Scale: one groupBy(user) for first-event times (map-side
    combined), one broadcast-friendly join back keyed on user, one
    groupBy((cohort, period)) with count_distinct, one tiny self-join
    on the cohort grain for the denominator — the event payload never
    shuffles (only (user, epoch) pairs)."""
    if period_seconds < 1:
        raise ValueError("period_seconds must be >= 1")
    p = F.lit(int(period_seconds)).cast("long")
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.unix_timestamp(F.col(ts_col)).alias("__t"),
    )
    first = ev.groupBy("__u").agg(F.min("__t").alias("__t0"))
    cohorted = ev.join(first, "__u").select(
        "__u",
        (F.floor(F.col("__t0") / p) * p).alias("cohort_period"),
        F.floor((F.col("__t") - F.col("__t0")) / p).cast("int").alias("period_n"),
    )
    active = cohorted.groupBy("cohort_period", "period_n").agg(
        F.count_distinct("__u").alias("n_active")
    )
    size = (
        cohorted.filter(F.col("period_n") == 0)
        .groupBy("cohort_period")
        .agg(F.count_distinct("__u").alias("__size"))
    )
    return (
        active.join(size, "cohort_period")
        .select(
            "cohort_period",
            "period_n",
            "n_active",
            F.round(F.col("n_active") / F.col("__size"), 6).alias("retention"),
        )
        .orderBy("cohort_period", "period_n")
    )


def top_event_paths(
    df: DataFrame,
    length: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
) -> DataFrame:
    """TOP USER PATHS: the most frequent ``length``-event sequences
    users actually perform (the path-analysis counterpart of the
    funnel — funnels check a HYPOTHESIZED sequence, this surfaces the
    observed ones). Events order per user by (ts, event_type) — the
    deterministic tiebreak for simultaneous events — and every
    window of ``length`` consecutive events becomes one path string
    'a>b>c'. Returns (path, n_occurrences, n_users) top-k by
    occurrences with a lexicographic tiebreak.

    Scale: one shuffle on user_id for the per-user window (the same
    shape as any sessionization), then a map-side-combining count and
    a TakeOrderedAndProject top-k — no global sort, no per-user
    event-list materialization."""
    from pyspark.sql import Window

    if length < 2 or k < 1:
        raise ValueError("length must be >= 2 and k >= 1")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(event_col))
    steps = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, length)
    ]
    paths = df.select(
        F.col(user_col),
        F.when(
            steps[-1].isNotNull(), F.concat_ws(">", *steps)
        ).alias("path"),
    ).filter(F.col("path").isNotNull())
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(user_col).alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(k)
    )


def resample_gapfill(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    period_seconds: int = 24 * 3600,
) -> DataFrame:
    """RESAMPLE + GAP-FILL: per entity, bucket a time series into
    fixed ``period_seconds`` periods (sum + count per bucket), emit
    EVERY period between the entity's first and last event — gaps
    included — and forward-fill each empty bucket's value with the
    last observed bucket sum (the standard dashboarding/feature-store
    densification). Returns (user, period_start epoch-seconds long,
    n_events, period_sum, filled_sum, is_gap).

    The dense period axis is generated IN-ROW per entity (sequence()
    over the entity's own [first, last] span — no driver-side
    calendar, no cross joins with a global axis, so a 100 TB stream
    with million-period entities explodes keys-only (user, period)
    rows). The forward fill is one last_value(ignorenulls) window per
    entity — the same single shuffle the bucketing already paid.
    Integer epoch arithmetic end-to-end (engine-exact, no calendar
    ambiguity)."""
    if period_seconds < 1:
        raise ValueError("period_seconds must be >= 1")
    p = F.lit(int(period_seconds)).cast("long")
    ev = df.select(
        F.col(user_col).alias("__u"),
        (F.floor(F.unix_timestamp(F.col(ts_col)) / p) * p).alias("__pd"),
        F.col(value_col).cast("double").alias("__v"),
    )
    buckets = ev.groupBy("__u", "__pd").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("__v").alias("period_sum")
    )
    span = buckets.groupBy("__u").agg(
        F.min("__pd").alias("__lo"), F.max("__pd").alias("__hi")
    )
    axis = span.select(
        "__u", F.explode(F.sequence(F.col("__lo"), F.col("__hi"), p)).alias("__pd")
    )
    from pyspark.sql import Window

    dense = axis.join(buckets, ["__u", "__pd"], "left")
    w = (
        Window.partitionBy("__u")
        .orderBy("__pd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col("__u").alias(user_col),
        F.col("__pd").alias("period_start"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("period_sum"),
        F.last("period_sum", ignorenulls=True).over(w).alias("filled_sum"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def profile_columns(
    df: DataFrame, cols: list[str], approx_distinct: bool = False
) -> DataFrame:
    """COLUMN PROFILE — the data-quality audit every ingest runs:
    one row per column with (column, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value) — min/max rendered as strings
    so heterogeneous columns share one schema. All statistics
    compute in ONE aggregation pass over the table (a single
    map-side-combining job regardless of column count), then melt
    in-row to the per-column layout.

    ``approx_distinct=True`` swaps exact count_distinct (a shuffle
    per high-cardinality column at 100 TB) for HLL
    approx_count_distinct — the scale default for wide audits; the
    exact mode is kept for oracle checks. Caveat: floating-point
    min/max stringification is engine-specific at extreme magnitudes
    (Java flips to scientific notation at 1e7) — profile doubles
    with explicit rounding upstream if the output must be
    cross-engine stable."""
    if not cols:
        raise ValueError("cols must be non-empty")
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx_distinct
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    melted = row.select(
        "__n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("__s"),
    )
    return melted.select(
        F.col("__s.column").alias("column"),
        F.col("__n").alias("n_rows"),
        F.col("__s.n_nulls").alias("n_nulls"),
        F.round(F.col("__s.n_nulls") / F.col("__n"), 6).alias("null_frac"),
        F.col("__s.n_distinct").alias("n_distinct"),
        F.col("__s.min_value").alias("min_value"),
        F.col("__s.max_value").alias("max_value"),
    )


def last_touch_attribution(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    lookback_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: credit each conversion event to the
    most recent touch event (by the same user) within the lookback
    window, or to ``'unattributed'`` — the standard marketing/product
    revenue-attribution rollup. One row per channel:
    (channel, n_conversions, revenue, avg_latency_sec); latency is the
    whole-second epoch gap touch -> conversion (NULL for
    unattributed).

    Scale shape: NO join — one window over (user, ts, id) carries the
    last touch forward as a struct (``last(..., ignorenulls)`` over an
    unbounded-preceding frame keeps ts/type consistent in one
    column), then a channel-keyed rollup. The event stream shuffles
    once on user_id — exactly the sessionization exchange — and the
    payload is five narrow columns; at 100 TB the alternative
    per-conversion range join re-shuffles conversions AND touches.
    Ties: the window orders by (ts, id) — total and engine-portable;
    window membership compares whole-second epochs (integer math, the
    funnel-family convention)."""
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    from pyspark.sql import Window

    ev = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(event_col).alias("__e"),
        F.col(value_col).alias("__v"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("__ts", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("__e").isin(list(touch_types)),
        F.struct(
            F.unix_timestamp("__ts").alias("sec"),
            F.col("__e").alias("typ"),
        ),
    )
    t = ev.withColumn("__lt", F.last(touch, ignorenulls=True).over(w))
    conv = t.filter(F.col("__e") == conversion_type).select(
        F.col("__v"),
        (F.unix_timestamp("__ts") - F.col("__lt.sec")).alias("__lat"),
        F.when(
            F.col("__lt").isNotNull()
            & (
                F.col("__lt.sec")
                >= F.unix_timestamp("__ts") - F.lit(int(lookback_seconds))
            ),
            F.col("__lt.typ"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("channel"),
    )
    return conv.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum("__v"), 6).alias("revenue"),
        F.round(
            F.avg(F.when(F.col("channel") != "unattributed", F.col("__lat"))),
            6,
        ).alias("avg_latency_sec"),
    )
