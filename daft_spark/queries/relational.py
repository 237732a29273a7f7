"""Relational-core operator queries: distinct, set ops, explode,
pivot/unpivot, sample, limit/offset, cross join, null-safe join,
monotonically_increasing_id — SURVEY §2.1's inventory
(reference: ``src/daft-logical-plan/src/logical_plan.rs:35-66``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.queries import register


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@register(
    "rel_distinct",
    "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
)
def rel_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct on a projection (reference: ops/distinct.rs:13,
    sinks/dedup.rs). Spark hash-dedups map-side first — partial agg."""
    return (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    )


# Halves carry a rounded-value bucket so EXCEPT/INTERSECT are
# non-vacuous: (user_id, event_type) alone appears in both halves at
# sf>=0.01, which would make rel_except trivially empty.
_HALVES = """
    WITH a AS (SELECT user_id, event_type, CAST(round(value) AS BIGINT) AS vb
               FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
         b AS (SELECT user_id, event_type, CAST(round(value) AS BIGINT) AS vb
               FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL)
"""


def _halves(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    vb = F.round(F.col("value")).cast("long").alias("vb")
    a = e.filter(F.col("event_id") % 2 == 0).select("user_id", "event_type", vb)
    b = e.filter(F.col("event_id") % 2 == 1).select("user_id", "event_type", vb)
    return a, b


@register(
    "rel_union_all",
    _HALVES + "SELECT user_id, event_type, vb FROM (SELECT * FROM a UNION ALL SELECT * FROM b)",
)
def rel_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (reference: ops/concat.rs:15 — Concat)."""
    a, b = _halves(spark, sf_dir)
    return a.unionAll(b)


@register(
    "rel_union_distinct",
    _HALVES + "SELECT user_id, event_type, vb FROM (SELECT * FROM a UNION SELECT * FROM b)",
)
def rel_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (reference: ops/set_operations.rs:264)."""
    a, b = _halves(spark, sf_dir)
    return a.union(b).distinct()


@register("rel_intersect", _HALVES + "SELECT * FROM a INTERSECT SELECT * FROM b")
def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) (reference: ops/set_operations.rs:106)."""
    a, b = _halves(spark, sf_dir)
    return a.intersect(b)


@register("rel_intersect_all", _HALVES + "SELECT * FROM a INTERSECT ALL SELECT * FROM b")
def rel_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.intersectAll(b)


@register("rel_except", _HALVES + "SELECT * FROM a EXCEPT SELECT * FROM b")
def rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT distinct (reference: ops/set_operations.rs:417)."""
    a, b = _halves(spark, sf_dir)
    return a.subtract(b)


@register("rel_except_all", _HALVES + "SELECT * FROM a EXCEPT ALL SELECT * FROM b")
def rel_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.exceptAll(b)


@register(
    "rel_union_by_name",
    """
    SELECT user_id, n_events, total FROM (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, NULL::DOUBLE AS total
      FROM events GROUP BY user_id
      UNION ALL BY NAME
      SELECT sum(value) AS total, user_id, NULL::BIGINT AS n_events
      FROM events GROUP BY user_id)
    """,
)
def rel_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union BY NAME with missing columns (reference: union(by_name=True),
    daft union supports ALL/DISTINCT and BY NAME — ops/set_operations.rs)."""
    e = _events(spark, sf_dir)
    a = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    b = e.groupBy("user_id").agg(F.sum("value").alias("total"))
    return a.unionByName(b, allowMissingColumns=True).select("user_id", "n_events", "total")


@register(
    "rel_explode",
    """
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 100
    """,
)
def rel_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode a list column (reference: ops/explode.rs:20)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "rel_explode_outer",
    """
    SELECT doc_id, u.word
    FROM (SELECT doc_id,
                 CASE WHEN n_chars < 60 THEN [] ELSE string_split(text, ' ') END AS words
          FROM documents WHERE doc_id < 200) t
    LEFT JOIN LATERAL (SELECT unnest(t.words) AS word) u ON TRUE
    """,
)
def rel_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps rows whose list is empty/null (reference:
    explode ``ignore_empty_and_null`` flag — daft/functions/list.py:382)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.when(F.col("n_chars") < 60, F.array().cast("array<string>")).otherwise(
        F.split("text", " ")
    )
    return d.select("doc_id", F.explode_outer(words).alias("word"))


@register(
    "rel_explode_multi",
    """
    SELECT doc_id,
           t.words[i + 1] AS word,
           CAST(t.lens[i + 1] AS INT) AS wlen,
           CAST(i AS INT) AS pos
    FROM (SELECT doc_id,
                 string_split(text, ' ') AS words,
                 [length(w) FOR w IN string_split(text, ' ')] AS lens
          FROM documents WHERE doc_id < 100) t,
         LATERAL (SELECT unnest(range(len(t.words))) AS i) u
    ORDER BY doc_id, pos
    """,
)
def rel_explode_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lockstep multi-column explode + index_column (reference
    dataframe.py:4239-4256: equal-length lists zip, position tracked).
    Exercises the posexplode(arrays_zip) path fixed this round."""
    from daft_spark.dataframe import DataFrame as DSDataFrame

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d = d.select(
        "doc_id",
        F.split("text", " ").alias("word"),
        F.transform(F.split("text", " "), lambda w: F.length(w)).alias("wlen"),
    )
    out = DSDataFrame(d).explode("word", "wlen", index_column="pos")
    return out.to_spark().orderBy("doc_id", "pos")


@register(
    "rel_pivot",
    """
    SELECT user_id,
           sum(CASE WHEN event_type = 'click' THEN value END) AS click,
           sum(CASE WHEN event_type = 'view' THEN value END) AS view,
           sum(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           sum(CASE WHEN event_type = 'signup' THEN value END) AS signup,
           sum(CASE WHEN event_type = 'error' THEN value END) AS error
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide (reference: ops/pivot.rs:18, sinks/pivot.rs).
    Explicit value list avoids the extra distinct-values job — the same
    reason the reference requires pivot values up front."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.sum("value"))
        .orderBy("user_id")
    )


@register(
    "rel_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, val FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey < 100)
    """,
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide->long (reference: ops/unpivot.rs:18)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        [F.col("l_quantity").alias("quantity"), F.col("l_extendedprice").alias("price"),
         F.col("l_tax").alias("tax")],
        "measure",
        "val",
    )


@register(
    "rel_topn",
    """
    SELECT event_id, user_id, value FROM events
    WHERE value IS NOT NULL
    ORDER BY value DESC, event_id LIMIT 25
    """,
)
def rel_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopN — Catalyst fuses sort+limit into TakeOrderedAndProject
    (reference: ops/top_n.rs:26, sinks/top_n.rs)."""
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return (
        e.select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(25)
    )


@register(
    "rel_limit_offset",
    """
    SELECT event_id, user_id FROM events ORDER BY event_id LIMIT 50 OFFSET 100
    """,
)
def rel_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Limit + Offset (reference: ops/limit.rs, ops/offset.rs; offset
    rewritten away by rules/rewrite_offset.rs — Spark has native offset)."""
    e = _events(spark, sf_dir)
    return e.select("event_id", "user_id").orderBy("event_id").offset(100).limit(50)


@register(
    "rel_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
)
def rel_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (reference: join/cross_join.rs)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "rel_join_null_safe",
    """
    WITH a AS (SELECT user_id, CASE WHEN value < 50 THEN NULL ELSE round(value) END AS vkey
               FROM events WHERE event_type = 'click'),
         b AS (SELECT user_id, CASE WHEN value < 50 THEN NULL ELSE round(value) END AS vkey
               FROM events WHERE event_type = 'view')
    SELECT a.user_id, a.vkey, count(*) AS n
    FROM a JOIN b ON a.user_id = b.user_id AND a.vkey IS NOT DISTINCT FROM b.vkey
    GROUP BY a.user_id, a.vkey ORDER BY a.user_id, a.vkey NULLS FIRST
    """,
)
def rel_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join — eqNullSafe == the reference's `<=>`
    (reference: src/daft-core/src/operator.rs:10, misc.py:123)."""
    e = _events(spark, sf_dir)
    vkey = F.when(F.col("value") < 50, F.lit(None)).otherwise(F.round(F.col("value")))
    a = e.filter(F.col("event_type") == "click").select("user_id", vkey.alias("vkey"))
    b = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user"), vkey.alias("b_vkey")
    )
    return (
        a.join(b, (F.col("user_id") == F.col("b_user")) & F.col("vkey").eqNullSafe(F.col("b_vkey")))
        .groupBy("user_id", "vkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("user_id", F.col("vkey").asc_nulls_first())
    )


@register(
    "rel_monotonic_id",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_distinct_ids
    FROM events
    """,
    comparable=False,
)
def rel_monotonic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """monotonically_increasing_id: 64-bit partition-in-upper-bits ID —
    same bit-split design as the reference
    (ops/monotonically_increasing_id.rs:14). Values are
    partitioning-dependent, so the oracle checks the invariant:
    one distinct id per row."""
    e = _events(spark, sf_dir).withColumn("mid", F.monotonically_increasing_id())
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("mid")).alias("n_distinct_ids"),
    )


@register(
    "rel_sample_seeded",
    """
    SELECT TRUE AS count_in_bounds, TRUE AS deterministic_same,
           TRUE AS same_size, TRUE AS subset_ok
    """,
    comparable=False,
)
def rel_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (reference: ops/sample.rs:15,
    streaming_sink/sample.rs — fraction, seed). The RNG is
    engine-specific, so the oracle checks INVARIANTS as booleans:
    sampled rows are a subset of the source, the sample size is within
    ±6σ binomial bounds of fraction·N, and the same seed reproduces the
    identical multiset (determinism)."""
    e = _events(spark, sf_dir).select("event_id")
    frac = 0.1
    s1 = e.sample(withReplacement=False, fraction=frac, seed=42)
    s2 = e.sample(withReplacement=False, fraction=frac, seed=42)
    viol = s1.join(e, "event_id", "left_anti").agg(F.count("*").alias("v"))
    n1 = s1.agg(F.count("*").alias("n1"))
    n2 = s2.agg(F.count("*").alias("n2"))
    diff = s1.exceptAll(s2).agg(F.count("*").alias("d"))
    ntot = e.agg(F.count("*").alias("n"))
    mu = F.col("n") * F.lit(frac)
    sigma = F.sqrt(F.col("n") * F.lit(frac * (1.0 - frac)))
    return (
        viol.crossJoin(n1).crossJoin(n2).crossJoin(diff).crossJoin(ntot)
        .select(
            ((F.col("n1") >= mu - 6 * sigma) & (F.col("n1") <= mu + 6 * sigma))
            .alias("count_in_bounds"),
            (F.col("d") == 0).alias("deterministic_same"),
            (F.col("n1") == F.col("n2")).alias("same_size"),
            (F.col("v") == 0).alias("subset_ok"),
        )
    )


@register(
    "rel_generator_source",
    """
    SELECT CAST(p.range AS INT) AS part, CAST(j.range AS INT) AS row_idx,
           CAST(p.range * 100 + j.range AS BIGINT) AS val
    FROM range(4) p, range(25) j
    ORDER BY part, row_idx
    """,
)
def rel_generator_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (reference ScanOperator / read_generator
    — daft/io/_generator.py:22): a deterministic generator source whose
    output the oracle reproduces with range()."""
    from daft_spark.io.custom_source import read_generator

    def gen(partition: int):
        for j in range(25):
            yield (partition, j, partition * 100 + j)

    df = read_generator(
        gen, "part int, row_idx int, val long", num_partitions=4, spark=spark
    )
    return df.orderBy("part", "row_idx")


@register(
    "rel_shard",
    """
    SELECT CAST(user_id % 4 AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n
    FROM events WHERE user_id % 4 = 1 GROUP BY shard
    """,
)
def rel_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard for distributed training readers (reference: ops/shard.rs:13,
    rules/push_down_shard.rs): deterministic key-hash filter
    world_size=4, rank=1."""
    from daft_spark.operators.shard import shard

    e = _events(spark, sf_dir)
    return (
        shard(e, world_size=4, rank=1, key=F.col("user_id"), strategy="mod")
        .groupBy((F.col("user_id") % 4).cast("long").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "rel_repartition_colocate",
    """
    SELECT CAST(1 AS BIGINT) AS max_partitions_per_key,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_keys,
           CAST(1 AS BIGINT) AS multi_partition
    FROM customer
    """,
    comparable=False,
)
def rel_repartition_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repartition/IntoPartitions invariant (reference repartition ops,
    ops/repartition.rs): hash-repartitioning on a key must put every
    occurrence of a key into exactly ONE partition (co-location — the
    property bucketed joins rely on) while still spreading keys over
    multiple partitions (parallelism retained). Verified through
    spark_partition_id on the post-shuffle frame; the oracle restates
    the invariants as constants plus the key count from the source."""
    c = load_table(spark, sf_dir, "customer").repartition(16, F.col("c_nationkey"))
    per_key = (
        c.withColumn("pid", F.spark_partition_id())
        .groupBy("c_nationkey")
        .agg(F.countDistinct("pid").alias("np"), F.first("pid").alias("pid0"))
    )
    return per_key.agg(
        F.max("np").cast("long").alias("max_partitions_per_key"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        (F.countDistinct("pid0") >= 2).cast("long").alias("multi_partition"),
    )


@register(
    "rel_join_right_outer",
    """
    WITH custs AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0),
         ords AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                         round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS spend
                  FROM orders GROUP BY o_custkey)
    SELECT c.c_custkey, c.c_name,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.spend, 0.0) AS spend
    FROM ords o RIGHT JOIN custs c ON o.o_custkey = c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def rel_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (reference join type enum, ops/join.rs:176):
    every kept customer survives, unmatched ones with null-coalesced
    aggregates — the right side drives the result."""
    custs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
    )
    return (
        ords.join(custs, ords["o_custkey"] == custs["c_custkey"], "right")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "rel_join_full_outer",
    """
    WITH a AS (SELECT CAST(user_id % 50 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_click
               FROM events WHERE event_type = 'click' AND user_id % 2 = 0 GROUP BY 1),
         b AS (SELECT CAST(user_id % 50 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_view
               FROM events WHERE event_type = 'view' AND user_id % 3 = 0 GROUP BY 1)
    SELECT coalesce(a.k, b.k) AS k,
           coalesce(a.n_click, 0) AS n_click,
           coalesce(b.n_view, 0) AS n_view
    FROM a FULL OUTER JOIN b ON a.k = b.k
    ORDER BY k
    """,
)
def rel_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: keys present on either side survive with
    null-coalesced counts from the missing side."""
    e = load_table(spark, sf_dir, "events")
    a = (
        e.filter((F.col("event_type") == "click") & (F.col("user_id") % 2 == 0))
        .groupBy((F.col("user_id") % 50).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    b = (
        e.filter((F.col("event_type") == "view") & (F.col("user_id") % 3 == 0))
        .groupBy((F.col("user_id") % 50).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_view"))
    )
    return (
        a.join(b, a["k"] == b["k"], "outer")
        .select(
            F.coalesce(a["k"], b["k"]).alias("k"),
            F.coalesce(F.col("n_click"), F.lit(0)).alias("n_click"),
            F.coalesce(F.col("n_view"), F.lit(0)).alias("n_view"),
        )
        .orderBy("k")
    )


@register(
    "rel_join_hints",
    """
    SELECT n_name, CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def rel_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join STRATEGY HINTS (reference join strategies: broadcast/
    sort-merge/hash, ops/join.rs): the same query planned under an
    explicit broadcast hint AND an explicit merge (SMJ) hint must agree
    — the result is the broadcast-planned frame, and the function
    asserts both the plan shapes (BroadcastHashJoin vs SortMergeJoin)
    and that the two strategies return identical aggregates."""
    c = load_table(spark, sf_dir, "customer").select("c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def agg(joined):
        return (
            joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n")).orderBy("n_name")
        )

    bcast = agg(c.join(n.hint("broadcast"), c["c_nationkey"] == n["n_nationkey"]))
    merged = agg(c.join(n.hint("merge"), c["c_nationkey"] == n["n_nationkey"]))
    bplan = bcast._jdf.queryExecution().executedPlan().toString()
    mplan = merged._jdf.queryExecution().executedPlan().toString()
    if "BroadcastHashJoin" not in bplan:
        raise AssertionError("broadcast hint did not produce a broadcast join")
    if "SortMergeJoin" not in mplan:
        raise AssertionError("merge hint did not produce a sort-merge join")
    if [tuple(r) for r in bcast.collect()] != [tuple(r) for r in merged.collect()]:
        raise AssertionError("hinted strategies disagree")
    return bcast


@register(
    "rel_key_skew_report",
    """
    WITH counts AS (
      SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS key_rows
      FROM events GROUP BY user_id),
    summary AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(key_rows) AS BIGINT) AS n_rows,
             CAST(max(key_rows) AS BIGINT) AS max_key_rows,
             quantile_cont(key_rows, 0.5) AS p50_key_rows,
             quantile_cont(key_rows, 0.99) AS p99_key_rows,
             round(max(key_rows) / (CAST(sum(key_rows) AS DOUBLE) / count(*)), 6)
               AS skew_ratio
      FROM counts),
    top AS (
      SELECT key, CAST(key_rows AS BIGINT) AS key_rows,
             CAST(row_number() OVER (ORDER BY key_rows DESC, key ASC) AS INT)
               AS rank
      FROM counts ORDER BY key_rows DESC, key ASC LIMIT 10)
    SELECT rank, key, key_rows, n_keys, n_rows, max_key_rows,
           p50_key_rows, p99_key_rows, skew_ratio
    FROM top CROSS JOIN summary ORDER BY rank
    """,
)
def rel_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle key-distribution audit (operators/skew.py
    key_skew_report — the diagnostic you run on a join key before
    committing a 100 TB shuffle to it): top-10 heaviest events.user_id
    keys with the exact global distribution (key count, row count, max,
    exact p50/p99 of per-key counts, max/mean skew ratio) attached.
    The oracle replays counts, both exact percentiles, the ratio, and
    the deterministic top-k ordering. approx=False is the oracle-exact
    path; the scale default (approx=True, percentile_approx) is the
    rel_key_skew_report_approx row below."""
    from daft_spark.operators.skew import key_skew_report

    return key_skew_report(
        load_table(spark, sf_dir, "events"), "user_id", top_k=10,
        approx=False,
    ).orderBy("rank")


@register(
    "rel_key_skew_report_approx",
    """
    WITH counts AS (
      SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS key_rows
      FROM events GROUP BY user_id),
    summary AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(key_rows) AS BIGINT) AS n_rows,
             CAST(max(key_rows) AS BIGINT) AS max_key_rows,
             round(max(key_rows) / (CAST(sum(key_rows) AS DOUBLE) / count(*)), 6)
               AS skew_ratio
      FROM counts),
    top AS (
      SELECT key, CAST(key_rows AS BIGINT) AS key_rows,
             CAST(row_number() OVER (ORDER BY key_rows DESC, key ASC) AS INT)
               AS rank
      FROM counts ORDER BY key_rows DESC, key ASC LIMIT 10)
    SELECT rank, key, key_rows, n_keys, n_rows, max_key_rows, skew_ratio,
           TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
    FROM top CROSS JOIN summary ORDER BY rank
    """,
    comparable=False,
)
def rel_key_skew_report_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit's SCALE default: approx=True percentile_approx
    (Greenwald-Khanna) instead of Spark's exact percentile, which
    buffers every per-key count in one aggregation buffer (OOM past
    ~1e8 keys — r10 verdict task 3). Everything except the two
    percentile columns stays EXACT and is value-oracled; the approx
    percentiles are checked by their GK contract — the reported value
    must be an actual per-key count whose rank sits within
    n_keys/accuracy + 1 of the target rank (booleans, oracle TRUE)."""
    from daft_spark.operators.skew import key_skew_report

    ev = load_table(spark, sf_dir, "events")
    rep = key_skew_report(ev, "user_id", top_k=10)  # approx default
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("key_rows"))
    one = rep.select("p50_key_rows", "p99_key_rows", "n_keys").limit(1)
    tol = F.ceil(F.col("n_keys") / 10000) + F.lit(1)

    def rank_ok(p: float, val_col: str):
        target = F.ceil(F.lit(p) * F.col("n_keys"))
        le = F.sum((F.col("key_rows") <= F.col(val_col)).cast("long"))
        lt = F.sum((F.col("key_rows") < F.col(val_col)).cast("long"))
        return (le >= target - tol) & (lt < target + tol)

    checks = (
        counts.crossJoin(F.broadcast(one))
        .groupBy("n_keys", "p50_key_rows", "p99_key_rows")
        .agg(
            rank_ok(0.5, "p50_key_rows").alias("p50_rank_ok"),
            rank_ok(0.99, "p99_key_rows").alias("p99_rank_ok"),
        )
        .select("p50_rank_ok", "p99_rank_ok")
    )
    return (
        rep.drop("p50_key_rows", "p99_key_rows")
        .crossJoin(F.broadcast(checks))
        .orderBy("rank")
    )


@register(
    "rel_range_join",
    """
    SELECT c.c_custkey, s.s_suppkey,
           c.c_acctbal AS point, s.s_acctbal - 10 AS lo, s.s_acctbal + 10 AS hi
    FROM customer c JOIN supplier s
      ON c.c_acctbal BETWEEN s.s_acctbal - 10 AND s.s_acctbal + 10
    ORDER BY c_custkey, s_suppkey
    """,
)
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval RANGE JOIN (operators/range_join.py): every
    (customer, supplier) pair with c_acctbal inside s_acctbal +- 10,
    via the binned grid (intervals replicate to covered bins keys-only,
    the join is a plain equi-join on the bin id, the exact BETWEEN is
    the residual) — never a BroadcastNestedLoopJoin (plan-asserted in
    tests/test_plans.py). Each qualifying pair appears exactly once
    because a point lives in exactly one bin. The oracle is the
    brute-force BETWEEN join — grid completeness and the exactly-once
    property are both value-checked."""
    from daft_spark.operators.range_join import point_in_interval_join

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 10).alias("lo"),
        (F.col("s_acctbal") + 10).alias("hi"),
    )
    out = point_in_interval_join(cust, supp, "c_acctbal", "lo", "hi", bin_size=20.0)
    return out.select(
        "c_custkey", "s_suppkey", F.col("c_acctbal").alias("point"), "lo", "hi"
    ).orderBy("c_custkey", "s_suppkey")


@register(
    "rel_interval_overlap",
    """
    SELECT c.c_custkey, s.s_suppkey
    FROM customer c JOIN supplier s
      ON c.c_acctbal - 5 <= s.s_acctbal + 5
     AND s.s_acctbal - 5 <= c.c_acctbal + 5
    ORDER BY c_custkey, s_suppkey
    """,
)
def rel_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (operators/range_join.py): customer and
    supplier +-5 account-balance windows that intersect. Both sides
    replicate onto the grid; a pair is emitted ONLY in the bin owning
    the overlap's left edge, so the result is exactly-once without a
    distinct. Oracle = the brute-force overlap predicate."""
    from daft_spark.operators.range_join import interval_overlap_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal") - 5).alias("c_lo"),
        (F.col("c_acctbal") + 5).alias("c_hi"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 5).alias("s_lo"),
        (F.col("s_acctbal") + 5).alias("s_hi"),
    )
    out = interval_overlap_join(
        cust, supp, "c_lo", "c_hi", "s_lo", "s_hi", bin_size=10.0
    )
    return out.select("c_custkey", "s_suppkey").orderBy("c_custkey", "s_suppkey")


_MD5_U52 = """list_sum(list_transform(range(1, 14), i ->
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), i, 1)) - 1)
               * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52"""


@register(
    "rel_reservoir_sample",
    f"""
    WITH u AS (
      SELECT lang, doc_id, {_MD5_U52.format(salt='rs')} AS x
      FROM documents
    ),
    r AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rn
      FROM u
    )
    SELECT lang, doc_id FROM r WHERE rn <= 5 ORDER BY lang, doc_id
    """,
)
def rel_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group uniform k-sample (operators/sampling.py
    reservoir_sample): the 5 docs per language with the smallest
    md5-uniform u(id || salt) — reproducible across runs, engines,
    and partitionings, unlike df.sample/rand(seed). The oracle
    recomputes the identical 52-bit md5 fraction and window; a single
    different pick mismatches."""
    from daft_spark.operators.sampling import reservoir_sample

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    return reservoir_sample(d, ["lang"], k=5, id_col="doc_id", salt="rs").orderBy(
        "lang", "doc_id"
    )


@register(
    "rel_weighted_sample",
    f"""
    WITH u AS (
      SELECT lang, doc_id, n_chars, {_MD5_U52.format(salt='ws')} AS x
      FROM documents
    ),
    r AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ln(x + 2.0 ** (-53)) / CAST(n_chars AS DOUBLE) DESC,
                        doc_id) AS rn
      FROM u
    )
    SELECT lang, doc_id FROM r WHERE rn <= 5 ORDER BY lang, doc_id
    """,
)
def rel_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED per-group k-sample — the
    Efraimidis–Spirakis A-ES reservoir order (keep the k largest
    u^(1/w), ranked via ln(u)/w for monotone stability; operators/
    sampling.py reservoir_sample(weight_col=...)): inclusion odds
    proportional to n_chars, reproducible like the uniform variant.
    The oracle replays the md5 uniform, the A-ES key, and the window
    rank. (ln() is libm-dependent at 1 ulp — order flips would need
    two keys within 1 ulp of each other, measure-zero on organic
    data; the +2^-53 offset guards the u=0 edge identically in both
    engines.)"""
    from daft_spark.operators.sampling import reservoir_sample

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return reservoir_sample(
        d, ["lang"], k=5, id_col="doc_id", salt="ws", weight_col="n_chars"
    ).select("lang", "doc_id").orderBy("lang", "doc_id")


@register(
    "rel_funnel_steps",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage_reached
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    ORDER BY s1.user_id
    """,
)
def rel_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase over the
    event stream (operators/funnel.py funnel_steps): per user, the
    earliest completion of each step strictly after the previous one,
    plus the deepest stage reached. Expressed as n shrinking
    conditional-min aggregations (no window over the stream, no
    per-user event lists) — the oracle replays the identical chain."""
    from daft_spark.operators.funnel import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(
        ev, ["view", "click", "purchase"], "user_id", "ts", "event_type"
    ).orderBy("user_id")


@register(
    "rel_retention_cohorts",
    """
    WITH ev AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
    first AS (
      SELECT user_id, min(t) AS t0 FROM ev GROUP BY user_id),
    cohorted AS (
      SELECT ev.user_id,
             CAST(floor(t0 / 604800) * 604800 AS BIGINT) AS cohort_period,
             CAST(floor((t - t0) / 604800) AS INT) AS period_n
      FROM ev JOIN first USING (user_id)),
    active AS (
      SELECT cohort_period, period_n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
      FROM cohorted GROUP BY cohort_period, period_n),
    size AS (
      SELECT cohort_period, count(DISTINCT user_id) AS sz
      FROM cohorted WHERE period_n = 0 GROUP BY cohort_period)
    SELECT a.cohort_period, a.period_n, a.n_active,
           round(a.n_active / s.sz, 6) AS retention
    FROM active a JOIN size s USING (cohort_period)
    ORDER BY a.cohort_period, a.period_n
    """,
)
def rel_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle (operators/funnel.py
    retention_cohorts): cohort = 7-day period of the user's first
    event (integer epoch math — no calendar/timezone ambiguity),
    n_active + retention per (cohort, periods-since-first). Two
    keyed aggregations and a cohort-grain join; the event payload
    never shuffles. The oracle replays the identical epoch
    arithmetic."""
    from daft_spark.operators.funnel import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev, "user_id", "ts", period_seconds=604800)


@register(
    "rel_funnel_window",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND floor(epoch(e.ts)) <= floor(epoch(s1.t1)) + 172800
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND floor(epoch(e.ts)) <= floor(epoch(s2.t2)) + 172800
      GROUP BY e.user_id)
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage_reached
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    ORDER BY s1.user_id
    """,
)
def rel_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversion-window funnel: view -> click -> purchase with
    each hop required within 48 h of the previous step (operators/
    funnel.py funnel_steps(within_seconds=172800) — per-hop windows,
    the product-analytics default). Epoch-second integer arithmetic
    keeps the window check engine-exact; the oracle replays the
    identical chain."""
    from daft_spark.operators.funnel import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(
        ev, ["view", "click", "purchase"], "user_id", "ts", "event_type",
        within_seconds=172800,
    ).orderBy("user_id")


@register(
    "rel_event_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)),
    p AS (
      SELECT user_id, event_type || '>' || e2 || '>' || e3 AS path
      FROM seq WHERE e3 IS NOT NULL)
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_occurrences DESC, path ASC LIMIT 15
    """,
)
def rel_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 observed 3-event user paths (operators/funnel.py
    top_event_paths): per-user (ts, event_type)-ordered lead windows
    assemble 'a>b>c' path strings, counted with map-side combine and
    topped with TakeOrderedAndProject. The oracle replays the window,
    the concatenation, and the deterministic tiebreak."""
    from daft_spark.operators.funnel import top_event_paths

    ev = load_table(spark, sf_dir, "events")
    return top_event_paths(ev, length=3, k=15)


@register(
    "rel_pagerank",
    """
    WITH raw AS (
      SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    e AS (
      SELECT src, dst FROM raw
      UNION
      SELECT dst AS src, src AS dst FROM raw),
    nodes AS (
      SELECT DISTINCT src AS node FROM e
      UNION SELECT DISTINCT dst FROM e),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS rank FROM nodes),
    i1 AS (
      SELECT nd.node,
             (1 - 0.85) / (SELECT n FROM n)
             + 0.85 * (coalesce(f.inflow, 0)
                       + (SELECT coalesce(sum(r.rank), 0) FROM r0 r
                          LEFT JOIN deg ON r.node = deg.src
                          WHERE deg.src IS NULL) / (SELECT n FROM n)) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.d) AS inflow
        FROM e JOIN r0 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) f ON nd.node = f.node),
    i2 AS (
      SELECT nd.node,
             (1 - 0.85) / (SELECT n FROM n)
             + 0.85 * (coalesce(f.inflow, 0)
                       + (SELECT coalesce(sum(r.rank), 0) FROM i1 r
                          LEFT JOIN deg ON r.node = deg.src
                          WHERE deg.src IS NULL) / (SELECT n FROM n)) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.d) AS inflow
        FROM e JOIN i1 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) f ON nd.node = f.node),
    i3 AS (
      SELECT nd.node,
             (1 - 0.85) / (SELECT n FROM n)
             + 0.85 * (coalesce(f.inflow, 0)
                       + (SELECT coalesce(sum(r.rank), 0) FROM i2 r
                          LEFT JOIN deg ON r.node = deg.src
                          WHERE deg.src IS NULL) / (SELECT n FROM n)) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.d) AS inflow
        FROM e JOIN i2 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) f ON nd.node = f.node)
    SELECT node, rank FROM i3 ORDER BY node
    """,
)
def rel_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85, dangling mass
    redistributed) over the customer-supplier interaction graph
    (operators/cluster.py pagerank; undirected edges from
    orders x lineitem). A fixed iteration count keeps the loop a pure
    function of the edge list, so the oracle replays all three rounds
    as chained CTEs — in-flows, dangling scalars, and the final
    distribution (floats compared at 1e-6). The Spark loop truncates
    lineage per round (localCheckpoint), the connected_components
    discipline."""
    from daft_spark.operators.cluster import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, iters=3, damping=0.85).orderBy("node")


@register(
    "rel_resample_gapfill",
    """
    WITH ev AS (
      SELECT user_id,
             CAST(floor(floor(epoch(ts)) / 21600) * 21600 AS BIGINT) AS pd,
             value FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT user_id, pd, CAST(count(*) AS BIGINT) AS n_events,
             sum(value) AS period_sum
      FROM ev GROUP BY user_id, pd),
    span AS (
      SELECT user_id, min(pd) AS lo, max(pd) AS hi FROM b GROUP BY user_id),
    axis AS (
      SELECT user_id, unnest(range(lo, hi + 21600, 21600)) AS pd FROM span),
    dense AS (
      SELECT a.user_id, a.pd, b.n_events, b.period_sum
      FROM axis a LEFT JOIN b ON a.user_id = b.user_id AND a.pd = b.pd)
    SELECT user_id, pd AS period_start,
           coalesce(n_events, 0) AS n_events,
           period_sum,
           last_value(period_sum IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY pd
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
           n_events IS NULL AS is_gap
    FROM dense ORDER BY user_id, period_start
    """,
)
def rel_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour resampling of per-user purchase values with gap-filled
    dense periods and forward-filled sums (operators/funnel.py
    resample_gapfill): the dense axis generates in-row from each
    user's own span (sequence + explode — keys only), the forward
    fill is one last_value(ignorenulls) window. Integer epoch
    arithmetic; the oracle replays buckets, axis, and fill exactly."""
    from daft_spark.operators.funnel import resample_gapfill

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return resample_gapfill(
        ev, "user_id", "ts", "value", period_seconds=21600
    ).orderBy("user_id", "period_start")


@register(
    "rel_profile_columns",
    """
    WITH s AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_status,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
             CAST(min(o_orderstatus) AS VARCHAR) AS min_status,
             CAST(max(o_orderstatus) AS VARCHAR) AS max_status,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_cust,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
             CAST(min(o_custkey) AS VARCHAR) AS min_cust,
             CAST(max(o_custkey) AS VARCHAR) AS max_cust,
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_prio,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_prio,
             CAST(min(o_orderpriority) AS VARCHAR) AS min_prio,
             CAST(max(o_orderpriority) AS VARCHAR) AS max_prio
      FROM orders)
    SELECT 'o_orderstatus' AS col_name, n AS n_rows, nulls_status AS n_nulls,
           round(nulls_status / n, 6) AS null_frac, nd_status AS n_distinct,
           min_status AS min_value, max_status AS max_value FROM s
    UNION ALL
    SELECT 'o_custkey', n, nulls_cust, round(nulls_cust / n, 6), nd_cust,
           min_cust, max_cust FROM s
    UNION ALL
    SELECT 'o_orderpriority', n, nulls_prio, round(nulls_prio / n, 6), nd_prio,
           min_prio, max_prio FROM s
    ORDER BY col_name
    """,
)
def rel_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders (operators/funnel.py
    profile_columns): nulls, exact distinct counts, stringified
    min/max per column from a SINGLE aggregation job, melted in-row.
    The oracle recomputes each statistic per column. (approx_distinct
    =True is the 100 TB default — HLL instead of one exact distinct
    shuffle per column — kept off here for the exact oracle.)"""
    from daft_spark.operators.funnel import profile_columns

    o = load_table(spark, sf_dir, "orders")
    return profile_columns(
        o, ["o_orderstatus", "o_custkey", "o_orderpriority"]
    ).withColumnRenamed("column", "col_name").orderBy("col_name")


@register(
    "pipeline_grouped_split",
    """
    WITH u AS (
      SELECT source,
             list_sum(list_transform(range(1, 14), i ->
               (strpos('0123456789abcdef',
                       substr(md5(source || 'gs'), i, 1)) - 1)
               * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 AS x
      FROM (SELECT DISTINCT source FROM documents)),
    a AS (
      SELECT source,
             CASE WHEN x < 0.8 THEN 'train'
                  WHEN x < 0.9 THEN 'val' ELSE 'test' END AS split
      FROM u)
    SELECT a.split, CAST(count(DISTINCT d.source) AS BIGINT) AS n_groups,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars
    FROM documents d JOIN a ON d.source = a.source
    GROUP BY a.split ORDER BY a.split
    """,
)
def pipeline_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE split (operators/sampling.py grouped_split): the
    80/10/10 assignment keys the md5 uniform on SOURCE, so a source's
    documents can never straddle train and test — the contamination
    mode row-hash splits can't prevent. Output: per-split group/row/
    char totals; the oracle replays the group-keyed md5 assignment
    bit-exactly (a row-keyed split would mismatch immediately)."""
    from daft_spark.operators.sampling import grouped_split

    d = load_table(spark, sf_dir, "documents")
    s = grouped_split(
        d, {"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="source", salt="gs",
    )
    return (
        s.groupBy("split")
        .agg(
            F.count_distinct("source").alias("n_groups"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


@register(
    "rel_ewma",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS xi,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL),
    v AS (
      SELECT user_id, event_id, rn,
             array_agg(xi) OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS vals
      FROM e)
    SELECT user_id, event_id,
           (list_sum(list_transform(range(1, len(vals) + 1),
                    p -> vals[p] * (CAST(1 AS BIGINT) << (p - 1))))
                  + vals[1])
                 / 2.0 ** len(vals) / 100 AS ewma
    FROM v ORDER BY user_id, event_id
    """,
)
def rel_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated EWMA of event values (operators/timeseries.py
    ewma_windowed — alpha=1/2, last-32 window): y_t * 2^L is an exact
    INTEGER combination of the last L quantized values, so both
    engines produce bit-identical doubles regardless of their window
    summation order (DuckDB's segment-tree vs Spark's sequential fold
    flipped round-6 digits in the float closed-form at driver
    strictness — the general float operator stays available as
    ``ewma``, recurrence-tested in pytest). The oracle replays the
    quantization, coefficients, seed adjustment, and scaling
    term-for-term."""
    from daft_spark.operators.timeseries import ewma_windowed

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = ewma_windowed(
        ev, "value", ["ts", "event_id"], by=["user_id"], k=32, scale=100
    )
    # no engine-side round(): the doubles are bit-identical by
    # construction (integer S, power-of-two scaling, one /100), and
    # Spark's HALF_UP vs DuckDB's round diverge on exact .5 boundaries
    return out.select("user_id", "event_id", "ewma").orderBy(
        "user_id", "event_id"
    )


@register(
    "rel_twap",
    """
    WITH e AS (
      SELECT user_id, value, epoch(ts) AS tsec, event_id
      FROM events WHERE value IS NOT NULL),
    d AS (
      SELECT user_id, value, tsec, event_id,
             lead(tsec) OVER (PARTITION BY user_id
                              ORDER BY tsec, event_id) - tsec AS dt
      FROM e)
    SELECT user_id,
           round(coalesce(sum(value * dt) / sum(dt),
                          first(value ORDER BY tsec, event_id)), 6) AS twap,
           round(min(tsec), 6) AS first_ts,
           round(max(tsec), 6) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_events
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def rel_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average of event values (operators/
    timeseries.py time_weighted_avg): each value holds until the next
    event (left-Riemann), single-event users fall back to the value.
    Epoch arithmetic at microsecond precision; the oracle replays
    hold intervals, weights, and the fallback exactly."""
    from daft_spark.operators.timeseries import time_weighted_avg

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "value",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6)).alias(
            "tsec"
        ),
    )
    out = time_weighted_avg(
        ev, "value", "tsec", by=["user_id"], tiebreak="event_id"
    )
    return out.select(
        "user_id",
        F.round("twap", 6).alias("twap"),
        F.round("first_ts", 6).alias("first_ts"),
        F.round("last_ts", 6).alias("last_ts"),
        "n_events",
    ).orderBy("user_id")


@register(
    "rel_attribution",
    """
    WITH t AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN struct_pack(
                                    sec := CAST(floor(epoch(ts)) AS BIGINT),
                                    typ := event_type) END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS lt
      FROM events),
    c AS (
      SELECT value,
             CASE WHEN lt IS NOT NULL
                       AND lt.sec >= CAST(floor(epoch(ts)) AS BIGINT) - 14400
                  THEN lt.typ ELSE 'unattributed' END AS channel,
             CAST(floor(epoch(ts)) AS BIGINT) - lt.sec AS lat
      FROM t WHERE event_type = 'purchase')
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(sum(value), 6) AS revenue,
           round(avg(CASE WHEN channel <> 'unattributed' THEN lat END), 6)
             AS avg_latency_sec
    FROM c GROUP BY channel ORDER BY channel
    """,
)
def rel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution (operators/funnel.py
    last_touch_attribution): each purchase credits the most recent
    view/click by the same user within a 4-hour lookback, else
    'unattributed' — per-channel conversions, revenue, and mean
    touch->purchase latency. NO join: one user-keyed window carries
    the last touch forward as a struct; the oracle replays the
    identical window, whole-second epoch math, and every rollup."""
    from daft_spark.operators.funnel import last_touch_attribution

    ev = _events(spark, sf_dir)
    return last_touch_attribution(
        ev, ["view", "click"], "purchase", 14400,
        "user_id", "ts", "event_type", "event_id", "value",
    ).orderBy("channel")
