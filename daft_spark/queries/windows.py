"""Window-function suite over events — covers every WindowExpr variant
from the reference (``src/daft-dsl/src/expr/mod.rs:503-533``: Agg,
RowNumber, Rank, DenseRank, Offset(lag/lead), FirstValue, LastValue)
and both frame kinds (ROWS / RANGE,
``src/daft-dsl/src/expr/window.rs:21-35``) plus the four physical
specializations (partition-only, partition+order, dynamic frame,
order-only — ``src/daft-local-execution/src/sinks/window_*.rs``).

Null-ordering is pinned explicitly on BOTH sides (Spark defaults differ
from DuckDB: Spark asc=nulls-first, DuckDB asc=nulls-last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.queries import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "w_row_number",
    """
    SELECT event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events ORDER BY event_id
    """,
)
def w_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select("event_id", F.row_number().over(w).alias("rn")).orderBy("event_id")


@register(
    "w_rank_dense",
    """
    SELECT event_id,
           rank()       OVER (PARTITION BY event_type ORDER BY value DESC NULLS LAST, event_id) AS rnk,
           dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC NULLS LAST) AS drnk
    FROM events ORDER BY event_id
    """,
)
def w_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w1 = Window.partitionBy("event_type").orderBy(
        F.col("value").desc_nulls_last(), F.col("event_id")
    )
    w2 = Window.partitionBy("event_type").orderBy(F.col("value").desc_nulls_last())
    return e.select(
        "event_id",
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
    ).orderBy("event_id")


@register(
    "w_lag_lead",
    """
    SELECT event_id,
           lag(value)     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value, 2, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next2_value
    FROM events ORDER BY event_id
    """,
)
def w_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset window exprs (reference unifies lag/lead as Offset —
    src/daft-dsl/src/expr/mod.rs:513)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value", 2, -1.0).over(w).alias("next2_value"),
    ).orderBy("event_id")


@register(
    "w_running_agg",
    """
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_sum,
           ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / count(value) OVER w, 6) AS run_avg,
           count(value) OVER w AS run_cnt,
           min(value) OVER w AS run_min,
           max(value) OVER w AS run_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def w_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates, ROWS frame (reference: tests/window/test_running_agg.py)."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Exact decimal accumulation: Spark's and DuckDB's double window-sum
    # algorithms differ (sequential vs segment-tree), so raw doubles land
    # on opposite sides of decimal rounding ties. value has 2 decimals →
    # DECIMAL(18,2) sums are exact; the double casts are then identical.
    sum_dec = F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    return e.select(
        "event_id",
        sum_dec.alias("run_sum"),
        F.round(sum_dec / F.count("value").over(w), 6).alias("run_avg"),
        F.count("value").over(w).alias("run_cnt"),
        F.min("value").over(w).alias("run_min"),
        F.max("value").over(w).alias("run_max"),
    ).orderBy("event_id")


@register(
    "w_sliding_rows",
    """
    SELECT event_id,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS win_sum
    FROM events ORDER BY event_id
    """,
)
def w_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (reference WindowBoundary::Offset)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 1)
    return e.select("event_id", F.sum("value").over(w).alias("win_sum")).orderBy("event_id")


@register(
    "w_range_frame",
    """
    SELECT event_id,
           sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS sum_10min
    FROM events ORDER BY event_id
    """,
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time: trailing 10-minute sum per user
    (reference WindowBoundary::RangeOffset —
    src/daft-dsl/src/expr/window.rs:33)."""
    e = _events(spark, sf_dir).withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return e.select("event_id", F.sum("value").over(w).alias("sum_10min")).orderBy("event_id")


@register(
    "w_first_last",
    """
    SELECT event_id,
           first_value(value IGNORE NULLS) OVER w AS first_val,
           last_value(value IGNORE NULLS)  OVER w AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def w_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FirstValue/LastValue with ignore_nulls (reference
    src/daft-dsl/src/expr/mod.rs:524-531)."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        F.first("value", ignorenulls=True).over(w).alias("first_val"),
        F.last("value", ignorenulls=True).over(w).alias("last_val"),
    ).orderBy("event_id")


@register(
    "w_min_periods",
    """
    SELECT event_id,
           CASE WHEN count(value) OVER w >= 5
                THEN ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                           / count(value) OVER w, 6) END AS avg_5p
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def w_min_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_periods=5 running mean (reference WindowSpec.min_periods —
    src/daft-dsl/src/expr/window.rs:103)."""
    from daft_spark.operators.window_ext import with_min_periods

    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Exact decimal sum / count instead of avg: see w_running_agg note.
    avg_expr = F.round(
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("value").over(w),
        6,
    )
    return e.select(
        "event_id",
        with_min_periods(avg_expr, F.col("value"), w, 5, windowed=True).alias("avg_5p"),
    ).orderBy("event_id")


@register(
    "w_partition_only",
    """
    SELECT event_id,
           sum(value)   OVER (PARTITION BY user_id) AS user_total,
           count(*)     OVER (PARTITION BY user_id) AS user_events,
           avg(value)   OVER (PARTITION BY user_id, event_type) AS user_type_avg
    FROM events ORDER BY event_id
    """,
)
def w_partition_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-only windows (reference sinks/window_partition_only.rs)."""
    e = _events(spark, sf_dir)
    w1 = Window.partitionBy("user_id")
    w2 = Window.partitionBy("user_id", "event_type")
    return e.select(
        "event_id",
        F.sum("value").over(w1).alias("user_total"),
        F.count(F.lit(1)).over(w1).alias("user_events"),
        F.avg("value").over(w2).alias("user_type_avg"),
    ).orderBy("event_id")


@register(
    "w_order_only_global",
    """
    SELECT event_id,
           sum(value) OVER (ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS global_run_sum,
           row_number() OVER (ORDER BY ts, event_id) AS global_rn
    FROM events ORDER BY event_id
    """,
)
def w_order_only_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-only global running window (reference
    sinks/window_order_by_only.rs) — computed with the range-bucketed
    two-pass plan (operators/window_ext.py:global_running): parallel
    per-bucket windows + tiny broadcast offsets, never a
    single-partition window."""
    from daft_spark.operators.window_ext import global_running

    e = _events(spark, sf_dir)
    out = global_running(
        e,
        axis=F.unix_micros(F.col("ts").cast("timestamp")),
        order_cols=["ts", "event_id"],
        value_col="value",
    )
    return out.select("event_id", "global_run_sum", "global_rn").orderBy("event_id")


@register(
    "w_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps)
    SELECT user_id, session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization — lag-gap boundary detection + running session
    counter (30-min inactivity gap). The standard batch formulation of
    session windows; a core training-data pipeline shape."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_session = F.when(prev.isNull() | ((ts_us - prev) > 1_800_000_000), 1).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_session).over(run).alias("session_id"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_id")
    )


@register(
    "w_spark_extras",
    """
    SELECT event_id,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value NULLS FIRST, event_id) AS pr,
           cume_dist()    OVER (PARTITION BY event_type ORDER BY value NULLS FIRST, event_id) AS cd,
           ntile(4)       OVER (PARTITION BY event_type ORDER BY value NULLS FIRST, event_id) AS quartile
    FROM events ORDER BY event_id
    """,
)
def w_spark_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist/ntile — free Spark superset beyond the
    reference's WindowExpr enum (SURVEY §2.5)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id")
    )
    return e.select(
        "event_id",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("event_id")
