"""As-of join queries over the events table, oracled by DuckDB's native
ASOF JOIN (backward/forward) and a LATERAL nearest-match query.

Left stream: 'click' events; right stream: 'purchase' events; as-of on
``ts`` by ``user_id`` — the canonical "state at event time" lookup
(reference fixtures: tests/dataframe/test_asof_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.operators.asof_join import join_asof
from daft_spark.queries import register


def _streams(spark: SparkSession, sf_dir: str):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return clicks, buys


def _out(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "click_value",
        "purchase_value",
    ).orderBy("event_id")


_ORACLE_COMMON = """
    WITH clicks AS (
      SELECT event_id, user_id, ts, value AS click_value
      FROM events WHERE event_type = 'click'
    ), buys AS (
      SELECT user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
"""


@register(
    "asof_backward_by",
    _ORACLE_COMMON
    + """
    SELECT c.event_id, c.user_id,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us,
           c.click_value, b.purchase_value
    FROM clicks c
    ASOF LEFT JOIN buys b
      ON c.user_id = b.user_id AND c.ts >= b.ts
    ORDER BY c.event_id
    """,
)
def asof_backward_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest purchase at/before each click, per user (strategy=backward)."""
    clicks, buys = _streams(spark, sf_dir)
    return _out(join_asof(clicks, buys, on="ts", by="user_id", strategy="backward"))


@register(
    "asof_forward_by",
    _ORACLE_COMMON
    + """
    SELECT c.event_id, c.user_id,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us,
           c.click_value, b.purchase_value
    FROM clicks c
    ASOF LEFT JOIN buys b
      ON c.user_id = b.user_id AND c.ts <= b.ts
    ORDER BY c.event_id
    """,
)
def asof_forward_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next purchase at/after each click, per user (strategy=forward)."""
    clicks, buys = _streams(spark, sf_dir)
    return _out(join_asof(clicks, buys, on="ts", by="user_id", strategy="forward"))


@register(
    "asof_nearest_by",
    _ORACLE_COMMON
    + """
    SELECT c.event_id, c.user_id,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us,
           c.click_value, n.purchase_value
    FROM clicks c
    LEFT JOIN LATERAL (
      SELECT b.purchase_value
      FROM buys b
      WHERE b.user_id = c.user_id
      ORDER BY abs(epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))),
               (b.ts < c.ts)  -- tie -> prefer forward (reference dataframe.py:3989)
      LIMIT 1
    ) n ON TRUE
    ORDER BY c.event_id
    """,
)
def asof_nearest_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest purchase in time per click (ties prefer forward)."""
    clicks, buys = _streams(spark, sf_dir)
    return _out(join_asof(clicks, buys, on="ts", by="user_id", strategy="nearest"))


@register(
    "asof_backward_global",
    _ORACLE_COMMON
    + """
    SELECT c.event_id,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us,
           c.click_value, b.purchase_value
    FROM clicks c
    ASOF LEFT JOIN buys b ON c.ts >= b.ts
    ORDER BY c.event_id
    """,
)
def asof_backward_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of without by-keys (global ordered merge). Correct but serial —
    the scale path is the by-keyed variant."""
    clicks, buys = _streams(spark, sf_dir)
    joined = join_asof(
        clicks.drop("user_id"), buys.drop("user_id"), on="ts", strategy="backward"
    )
    return joined.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "click_value",
        "purchase_value",
    ).orderBy("event_id")
