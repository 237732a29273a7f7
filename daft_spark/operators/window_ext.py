"""Window extensions beyond built-in Spark windows.

``min_periods`` parity: the reference's ``WindowSpec.min_periods``
(reference: ``src/daft-dsl/src/expr/window.rs:92-105``) emits null until
the frame holds at least N non-null rows — wrapped here as
``when(count(x).over(w) >= n, agg.over(w))`` per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_min_periods(
    agg_col: Column, count_col: Column, window, n: int, *, windowed: bool = False
) -> Column:
    """Null out a windowed aggregate until >= n non-null rows in frame.

    ``windowed=True`` means ``agg_col`` is already a fully-built windowed
    expression (e.g. a rounded quotient of windowed aggs) and must not
    get another ``.over``.
    """
    expr = agg_col if windowed else agg_col.over(window)
    return F.when(F.count(count_col).over(window) >= n, expr)


def global_running(
    df: DataFrame,
    axis: Column,
    order_cols: list,
    value_col: str,
    run_col: str = "global_run_sum",
    rn_col: str = "global_rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Global ORDER-BY-only running sum + row_number WITHOUT the
    single-partition window (reference sinks/window_order_by_only.rs is
    inherently serial; this is the scale-safe re-expression).

    Two-pass range-bucket plan: ``axis`` (a numeric/time expression of
    the FIRST order column, so equal keys share a bucket) is cut into
    ``num_buckets`` equal-width buckets; running agg + row_number run
    partitioned by bucket (parallel); per-bucket totals (<= num_buckets
    rows) provide cumulative offsets via a tiny spine window, broadcast
    back. Null semantics match SQL: the running sum is null until the
    first non-null value.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(2, spark.sparkContext.defaultParallelism * 2)
    d = df.withColumn("__gx", axis.cast("double"))
    bounds = d.agg(F.min("__gx").alias("__lo"), F.max("__gx").alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(num_buckets)
    # Null axis rows get explicit bucket 0: they sort FIRST under
    # Spark's asc-nulls-first default, and an explicit id keeps them out
    # of the real buckets' offsets and safe from null-key join drops.
    bkt = (
        F.when(F.col("__gx").isNull(), F.lit(0))
        .when(F.col("__hi") <= F.col("__lo"), F.lit(1))
        .otherwise(F.least(F.lit(num_buckets),
                           (F.floor((F.col("__gx") - F.col("__lo")) / width) + 1).cast("int")))
        .cast("int")
    )
    d = d.crossJoin(F.broadcast(bounds)).withColumn("__bkt", bkt).drop("__lo", "__hi", "__gx")
    w_in = (
        Window.partitionBy("__bkt").orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__run_in", F.sum(value_col).over(w_in)).withColumn(
        "__rn_in", F.row_number().over(Window.partitionBy("__bkt").orderBy(*order_cols))
    )
    per = d.groupBy("__bkt").agg(
        F.count(F.lit(1)).alias("__cnt"), F.sum(value_col).alias("__s")
    )
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off_cnt"),
        F.sum("__s").over(w_off).alias("__off_sum"),
    )
    run_in, off_sum = F.col("__run_in"), F.col("__off_sum")
    return (
        d.join(F.broadcast(offs), "__bkt")
        .withColumn(
            run_col,
            F.when(run_in.isNull(), off_sum)
            .when(off_sum.isNull(), run_in)
            .otherwise(run_in + off_sum),
        )
        .withColumn(rn_col, (F.col("__rn_in") + F.col("__off_cnt")).cast("int"))
        .drop("__bkt", "__run_in", "__rn_in", "__off_cnt", "__off_sum")
    )
