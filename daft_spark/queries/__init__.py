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

    return REGISTRY
