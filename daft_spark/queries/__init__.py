"""Query registry — the correctness surface of the engine.

Every implemented operator from SURVEY.md §2 registers a named query
here with (a) a Spark implementation ``(spark, sf_dir) -> DataFrame``
and (b) an equivalent ANSI-SQL oracle for DuckDB (or ``None`` for
non-SQL-expressible operators; the driver then records a weaker
rows-only check).

``__spark_entry__.py`` at the repo root exposes exactly this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the registered table views


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle)
        return fn

    return deco


# The external driver records correctness rows for the FIRST 50 queries
# in registration order. Round 1 verified tpch/relational/aggregates;
# round 2 verified windows/asof/dedup/text/similarity/multimodal/fn.
# Round-3 rotation: the 11 never-verified queries (9 sql_* dialect,
# UDAF, summarize), every query changed this round (float-rounding
# fixes, LSH/SimHash invariant oracles, tpch_q5 join reorder,
# w_order_only_global null-axis fix), then re-verification of the
# r1-era tpch/relational/aggregates whose code paths the round-3 join
# and operator changes touch. Names not listed keep registration order
# after these.
DRIVER_PRIORITY: list[str] = [
    # never driver-verified (11)
    "sql_cte_join", "sql_exists_subquery", "sql_in_subquery",
    "sql_scalar_subquery", "sql_window_in_sql", "sql_having_positional",
    "sql_case_cast_union", "sql_grouping_sets", "sql_not_in_anti",
    "agg_udaf_weighted_mean", "agg_summarize",
    # new round 3: pure-python Delta log roundtrip
    "lake_delta_roundtrip",
    # changed round 3 (9)
    "w_running_agg", "w_min_periods", "sim_topk_cosine", "sim_pairs_threshold",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_minhash_lsh_pipeline",
    "w_order_only_global", "tpch_q5",
    # r1-era re-verification (30)
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q9", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q22",
    "rel_distinct", "rel_union_by_name", "rel_explode", "rel_explode_outer",
    "rel_pivot", "rel_unpivot", "rel_topn", "rel_limit_offset",
    "rel_cross_join", "rel_join_null_safe",
    "agg_count_modes", "agg_percentiles", "agg_hll_sketch", "agg_rollup",
]


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from daft_spark.queries import (  # noqa: F401
        tpch,
        relational,
        aggregates,
        windows,
        asof,
        dedup,
        text,
        similarity,
        functions_q,
        multimodal_q,
        sql_q,
        lakehouse_q,
    )

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    return ordered
