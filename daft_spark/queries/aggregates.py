"""Aggregation suite — the reference's AggExpr inventory
(``src/daft-dsl/src/expr/mod.rs:395-501``): count modes, product,
bool_and/or, any_value, collect/set/string_agg, stddev/var ddof,
median/percentiles, skew, approx aggs (bound-checked), rollup/cube,
plus the UDF aggregation paths (applyInPandas / pandas_udf GROUPED_AGG).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.functions.aggs import (
    count_all,
    count_null,
    count_valid,
    product,
    string_agg,
)
from daft_spark.io.readers import load_table
from daft_spark.queries import register


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@register(
    "agg_count_modes",
    """
    SELECT event_type,
           count(*) AS cnt_all,
           count(value) AS cnt_valid,
           CAST(count(*) - count(value) AS BIGINT) AS cnt_null,
           count(DISTINCT user_id) AS cnt_distinct_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_count_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count All/Valid/Null modes (reference: count_mode.rs) + count_distinct."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            count_all().alias("cnt_all"),
            count_valid("value").alias("cnt_valid"),
            count_null("value").alias("cnt_null"),
            F.count_distinct(F.col("user_id")).alias("cnt_distinct_users"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_stats",
    """
    SELECT event_type,
           avg(value) AS mean_v,
           stddev_samp(value) AS std_samp,
           stddev_pop(value) AS std_pop,
           var_samp(value) AS var_s,
           var_pop(value) AS var_p,
           min(value) AS min_v, max(value) AS max_v,
           median(value) AS med_v
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stddev/var with ddof 0 and 1 (reference: Stddev(ddof)/Var(ddof),
    mod.rs:427-430) + exact median (mod.rs:457)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.avg("value").alias("mean_v"),
            F.stddev_samp("value").alias("std_samp"),
            F.stddev_pop("value").alias("std_pop"),
            F.var_samp("value").alias("var_s"),
            F.var_pop("value").alias("var_p"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.median("value").alias("med_v"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (reference: AggExpr::Percentile, mod.rs:424)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_skew",
    """
    WITH m AS (
      SELECT event_type, avg(value) AS mu,
             count(value) AS n
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           (sum(pow(e.value - m.mu, 3)) / m.n) / pow(sum(pow(e.value - m.mu, 2)) / m.n, 1.5) AS skew_v
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, m.n ORDER BY e.event_type
    """,
)
def agg_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness (reference: AggExpr::Skew, mod.rs:460). Spark's skewness
    is the population moment ratio m3 / m2^1.5 — the oracle recomputes
    that formula explicitly (DuckDB's skewness() applies the sample
    bias correction, a different statistic)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(F.skewness("value").alias("skew_v")).orderBy("event_type")


@register(
    "agg_product_bool",
    """
    SELECT l_returnflag,
           product(1.0 + l_tax) AS prod_tax,
           bool_and(l_quantity > 0) AS all_pos_qty,
           bool_or(l_discount > 0.09) AS any_big_disc
    FROM lineitem WHERE l_orderkey < 50
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_product_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product (exp-sum-log w/ sign+zero handling — AggExpr::Product
    mod.rs:406) and BoolAnd/BoolOr (mod.rs:439-442)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return (
        l.groupBy("l_returnflag")
        .agg(
            product(1.0 + F.col("l_tax")).alias("prod_tax"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_any_value",
    """
    SELECT user_id, CAST(user_id % 7 AS BIGINT) AS bucket
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """any_value (reference: AggExpr::AnyValue, mod.rs:445) — checked on
    a per-group-constant expression so the result is deterministic."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(F.any_value(F.col("user_id") % 7, True).alias("bucket"))
        .orderBy("user_id")
    )


@register(
    "agg_string_collect",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List/Set/Concat agg family (reference mod.rs:448-454) — emitted as
    a sorted CSV so the comparison is order-insensitive-proof."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_csv"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_approx_bounds",
    "SELECT true AS acd_ok, true AS apct_ok",
)
def agg_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL — reference src/hyperloglog/) and
    percentile_approx (sketch — reference src/daft-sketch/) checked as
    within-tolerance booleans against their exact counterparts, since
    sketch values are engine-specific."""
    e = _events(spark, sf_dir)
    agg = e.agg(
        F.approx_count_distinct("event_id").alias("acd"),
        F.count_distinct("event_id").alias("cd"),
        F.percentile_approx("value", 0.5, 10000).alias("apct"),
        F.percentile("value", 0.5).alias("pct"),
    )
    return agg.select(
        (F.abs(F.col("acd") - F.col("cd")) <= 0.05 * F.col("cd")).alias("acd_ok"),
        (F.abs(F.col("apct") - F.col("pct")) <= 0.05 * F.abs(F.col("pct"))).alias("apct_ok"),
    )


@register(
    "agg_null_group_keys",
    """
    SELECT vbucket, count(*) AS n, sum(value) AS s
    FROM (SELECT CASE WHEN value IS NULL THEN NULL
                      ELSE CAST(floor(value / 50) AS BIGINT) END AS vbucket,
                 value
          FROM events)
    GROUP BY vbucket
    ORDER BY vbucket NULLS FIRST
    """,
)
def agg_null_group_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL as a group key: both engines must keep the null group as one
    group (SQL semantics; some engines drop it) — the reference's
    hash-agg groups nulls too."""
    e = _events(spark, sf_dir)
    vb = F.when(
        F.col("value").isNull(), F.lit(None).cast("long")
    ).otherwise(F.floor(F.col("value") / 50).cast("long"))
    return (
        e.select(vb.alias("vbucket"), "value")
        .groupBy("vbucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .orderBy(F.col("vbucket").asc_nulls_first())
    )


@register(
    "agg_hll_sketch",
    "SELECT true AS merged_ok",
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch build + merge + estimate (reference:
    AggExpr::ApproxSketch/MergeSketch mod.rs:415-418, HLL impl
    src/hyperloglog/ -> Spark 3.5+ hll_sketch_agg/hll_union_agg).
    Bound-check: merged per-type sketches estimate the global distinct
    within 5%."""
    e = _events(spark, sf_dir)
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.agg(F.count_distinct("user_id").alias("cd"))
    return merged.crossJoin(exact).select(
        (F.abs(F.col("est") - F.col("cd")) <= 0.05 * F.col("cd")).alias("merged_ok")
    )


@register(
    "agg_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — the reference supports single-level SQL ROLLUP only
    (src/daft-sql/src/planner.rs:496-519); Spark's is native and general."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n",
        )
        .orderBy("rf", "ls")
    )


@register(
    "agg_cube",
    """
    SELECT coalesce(event_type, 'ALL') AS et,
           coalesce(CAST(user_id % 3 AS BIGINT), -1) AS ubucket,
           sum(value) AS sum_v
    FROM events GROUP BY CUBE (event_type, CAST(user_id % 3 AS BIGINT))
    ORDER BY et, ubucket
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — free Spark superset (the reference has no cube; SURVEY §2.3)."""
    e = _events(spark, sf_dir).withColumn("ubucket", (F.col("user_id") % 3).cast("long"))
    return (
        e.cube("event_type", "ubucket")
        .agg(F.sum("value").alias("sum_v"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("et"),
            F.coalesce("ubucket", F.lit(-1)).alias("ubucket"),
            "sum_v",
        )
        .orderBy("et", "ubucket")
    )


@register(
    "agg_map_groups_zscore",
    """
    SELECT event_id,
           CASE WHEN stddev_pop(value) OVER (PARTITION BY user_id) > 0
                THEN (value - avg(value) OVER (PARTITION BY user_id))
                     / stddev_pop(value) OVER (PARTITION BY user_id)
           END AS zscore
    FROM events WHERE value IS NOT NULL
    ORDER BY event_id
    """,
)
def agg_map_groups_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-group Python UDF via applyInPandas (reference:
    AggExpr::MapGroups mod.rs:463, GroupedDataFrame.map_groups
    dataframe.py:6495) — per-user z-score, oracled by equivalent window SQL.

    Arrow-batched; each group is one pandas frame — the exact contract
    of the reference's map_groups."""
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        if std and std > 0:
            z = (pdf["value"] - pdf["value"].mean()) / std
        else:
            z = pd.Series([None] * len(pdf), dtype="float64")
        return pd.DataFrame({"event_id": pdf["event_id"], "zscore": z})

    return (
        e.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, zscore double")
        .orderBy("event_id")
    )


@register(
    "agg_udaf_weighted_mean",
    """
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT) * (event_id % 10 + 1)) AS DOUBLE)
             / (100.0 * sum(event_id % 10 + 1)) AS wmean
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def agg_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF with MAP-SIDE PARTIAL AGGREGATION via two_stage_udaf
    (reference AggFnMap/Combine/Reduce contract,
    src/daft-dsl/src/expr/mod.rs:474-501; daft.udf.udaf surface,
    daft/udf/udaf.py:16) — weighted mean with deterministic weights.
    Each Arrow batch pre-aggregates to one (user, sum_vw, sum_w) state
    row before the shuffle; the reducer merges states. States are exact
    int64 (value has 2 decimals -> value*100 is integral), so the final
    double division is bit-identical to DuckDB's regardless of
    accumulation order."""
    from daft_spark.udf import two_stage_udaf

    def map_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        iv = (pdf["value"] * 100).round().astype("int64")
        w = (pdf["event_id"] % 10 + 1).astype("int64")
        g = pd.DataFrame({"user_id": pdf["user_id"], "vw": iv * w, "w": w}).groupby(
            "user_id", as_index=False
        )
        return g.sum()

    def reduce_final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": [key[0]], "wmean": [float(pdf["vw"].sum()) / (100.0 * pdf["w"].sum())]}
        )

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "user_id", "event_id", "value"
    )
    agg = two_stage_udaf(
        keys=["user_id"],
        partial_schema="user_id bigint, vw bigint, w bigint",
        output_schema="user_id bigint, wmean double",
        map_partial=map_partial,
        reduce_final=reduce_final,
    )
    return agg(e).orderBy("user_id")


@register(
    "agg_summarize",
    """
    SELECT 'value' AS col_name,
           count(value) AS cnt,
           CAST(count(*) - count(value) AS BIGINT) AS nulls,
           avg(value) AS mean_v, min(value) AS min_v, max(value) AS max_v
    FROM events
    UNION ALL
    SELECT 'user_id', count(user_id),
           CAST(count(*) - count(user_id) AS BIGINT),
           avg(user_id), min(user_id), max(user_id)
    FROM events
    ORDER BY col_name
    """,
)
def agg_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe/summarize — per-column stats table (reference:
    ops/summarize.rs:9, dataframe.py:2870)."""
    e = _events(spark, sf_dir)

    def stats(col):
        return e.select(
            F.lit(col).alias("col_name"),
            F.count(col).alias("cnt"),
            (F.count(F.lit(1)) - F.count(col)).alias("nulls"),
            F.avg(col).cast("double").alias("mean_v"),
            F.min(col).cast("double").alias("min_v"),
            F.max(col).cast("double").alias("max_v"),
        )

    return stats("value").unionAll(stats("user_id")).orderBy("col_name")


@register(
    "agg_mode_deterministic",
    """
    WITH c AS (
      SELECT lang, source, count(*) AS n
      FROM documents GROUP BY lang, source),
    r AS (
      SELECT lang, source, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, source DESC) AS rn
      FROM c)
    SELECT lang, source AS mode_source, CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rn = 1 ORDER BY lang
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most frequent source per
    language with ties broken toward the LARGEST source value — built
    as count-then-max_by(struct(n, source)) because both engines'
    native mode() pick an arbitrary row on ties (Spark's mode() is
    explicitly non-deterministic there). Two map-side-combining
    aggregations, no window; the oracle replays the identical
    tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.groupBy("lang")
        .agg(
            F.max_by("source", F.struct(F.col("n"), F.col("source"))).alias(
                "mode_source"
            ),
            F.max("n").alias("mode_count"),
        )
        .orderBy("lang")
    )


@register(
    "agg_count_min_sketch",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS true_count,
           TRUE AS estimate_ge_true, TRUE AS estimate_within_eps
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    comparable=False,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) built as
    DataFrame aggregations (operators/cms.py — the sketch table IS a
    (j, bucket, cnt) DataFrame; no driver sketch object, no UDF).
    Invariants from the paper, checked per event_type against exact
    counts: estimate >= true (one-sided error) and
    estimate <= true + eps*N w.p. 1-delta (eps=0.001 -> width 2719,
    depth 5; N=10k at sf0.01, slack ~10, so the bound is
    non-vacuous). The corpus shuffles only (j, bucket) keys with
    map-side combine; point queries broadcast-join the KB-size
    sketch."""
    from daft_spark.operators.cms import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events").select("event_type")
    eps, delta = 0.001, 0.01
    sketch = cms_build(ev, "event_type", eps=eps, delta=delta).persist()
    true = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    est = cms_estimate(
        sketch, ev.select("event_type").distinct(), "event_type",
        eps=eps, delta=delta,
    )
    n_total = ev.count()
    return (
        true.join(est, "event_type")
        .select(
            "event_type",
            "true_count",
            (F.col("estimate") >= F.col("true_count")).alias(
                "estimate_ge_true"
            ),
            (
                F.col("estimate")
                <= F.col("true_count") + F.lit(eps * n_total)
            ).alias("estimate_within_eps"),
        )
        .orderBy("event_type")
    )
