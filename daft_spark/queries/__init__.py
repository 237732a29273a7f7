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
# this list rotates the still-unverified categories into the window
# (round 2: windows/asof/dedup/text/similarity/multimodal + the new and
# merged queries). Names not listed keep registration order after these.
# Round-3 rotation: sql_* (9), agg_udaf_weighted_mean, agg_summarize,
# then re-verification of tpch/relational/aggregates.
DRIVER_PRIORITY: list[str] = [
    # windows (12)
    "w_row_number", "w_rank_dense", "w_lag_lead", "w_running_agg",
    "w_sliding_rows", "w_range_frame", "w_first_last", "w_min_periods",
    "w_partition_only", "w_order_only_global", "w_sessionize", "w_spark_extras",
    # as-of joins (4)
    "asof_backward_by", "asof_forward_by", "asof_nearest_by", "asof_backward_global",
    # dedup (6)
    "dedup_exact", "dedup_normalized", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_exact_keepmin",
    # text analysis (7)
    "text_token_count", "text_quality", "text_quality_score_dist",
    "text_langid_agreement", "text_fingerprint", "text_stats_by_source",
    "text_stopword_filter",
    # similarity / ANN (5)
    "sim_topk_cosine", "sim_pairs_threshold", "sim_centroid_cosine",
    "sim_ann_lsh_recall", "sim_ann_ivf_recall",
    # multimodal / LLM (6)
    "mm_embed_text", "mm_llm_generate", "mm_classify_text",
    "mm_image_decode", "mm_url_download", "mm_video_frames",
    # new/changed this round (3)
    "rel_explode_multi", "rel_sample_seeded", "sql_table_function",
    # scalar-function batteries, merged (7)
    "fn_strings_regex", "fn_datetime_numeric", "fn_datetime_arith",
    "fn_json_bitwise", "fn_list_binary_url", "fn_conditional_struct",
    "fn_hash_invariant",
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
    )

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    return ordered
