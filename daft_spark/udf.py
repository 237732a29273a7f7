"""UDF surface — parity with the reference's decorators
(reference: ``daft/udf/__init__.py``):

- ``@func`` (row-wise scalar, :22-62)        -> Arrow-optimized Python UDF
- ``@func.batch`` (Series->Series, :252)     -> pandas_udf
- ``@cls`` / ``@method`` (stateful, :360-560)-> per-executor lazy
  singleton inside a pandas UDF (the standard PySpark model-serving
  pattern; replaces the reference's actor pools —
  ``intermediate_ops/distributed_actor_pool_project.rs``)
- ``udaf`` (``daft/udf/udaf.py:16``)         -> pandas_udf GROUPED_AGG

Generator functions (UDTF-like, ``daft/udf/udf_v2.py:55-188``) map to
``mapInPandas`` — see ``generator_udf``.
"""

from __future__ import annotations

import functools
from typing import Callable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf


def func(
    return_dtype: str = "string",
    max_concurrency: int | None = None,
    **_resource_opts,
):
    """Row-wise scalar UDF (reference @daft.func). Arrow-optimized.

    ASYNC functions (reference udf/__init__.py:75 — 'Async row-wise')
    are supported: decorating ``async def`` runs every row of an Arrow
    batch concurrently on one event loop per batch, bounded by
    ``max_concurrency`` (the reference's knob; default 64) — the shape
    for IO-bound row work (HTTP fetches, model endpoints).
    ``max_concurrency`` on a SYNC function is an error, as in the
    reference. Other resource options (cpus/gpus) are accepted for API
    compatibility; on Spark they map to task-level scheduling configs,
    not per-UDF settings."""

    def deco(fn: Callable):
        import inspect

        if inspect.iscoroutinefunction(fn):
            limit = max_concurrency or 64

            def _run_batch(*cols: pd.Series) -> pd.Series:
                import asyncio

                async def _all():
                    sem = asyncio.Semaphore(limit)

                    async def one(args):
                        async with sem:
                            return await fn(*args)

                    return await asyncio.gather(
                        *[one(args) for args in zip(*cols)]
                    )

                out = asyncio.run(_all())
                idx = cols[0].index if cols else None
                return pd.Series(out, index=idx, dtype=object)

            wrapped = pandas_udf(_run_batch, returnType=return_dtype)
            wrapped.__daft_spark_udf__ = "func_async"
            return wrapped
        if max_concurrency is not None:
            raise ValueError(
                "max_concurrency is only valid for async functions "
                "(reference @daft.func contract)"
            )
        wrapped = udf(fn, returnType=return_dtype, useArrow=True)
        wrapped.__daft_spark_udf__ = "func"
        return wrapped

    return deco


def batch_func(return_dtype: str = "double"):
    """Batch UDF over pandas Series (reference @daft.func.batch — the
    exact pandas_udf Series->Series contract). ~10-100x faster than
    row-wise; prefer this in any hot path."""

    def deco(fn: Callable):
        wrapped = pandas_udf(fn, returnType=return_dtype)
        wrapped.__daft_spark_udf__ = "batch"
        return wrapped

    return deco


func.batch = batch_func


def udaf(return_dtype: str = "double"):
    """Custom aggregation (reference daft.udf.udaf): the function
    receives pandas Series per group and returns one scalar.
    NOTE: GROUPED_AGG pandas UDFs have no partial aggregation — the
    shuffle moves whole rows. For reduce-style UDAFs that CAN be split,
    use ``two_stage_udaf`` below (map-side pre-agg, states-only
    shuffle), or express map/combine/reduce as built-in aggs (see
    functions/aggs.py product for the pattern)."""

    def deco(fn: Callable):
        return pandas_udf(fn, returnType=return_dtype)

    return deco


def two_stage_udaf(
    keys: list[str],
    partial_schema: str,
    output_schema: str,
    map_partial: Callable,
    reduce_final: Callable,
):
    """Distributed custom aggregation with MAP-SIDE PARTIAL AGGREGATION —
    the Spark re-expression of the reference's AggFnMap/Combine/Reduce
    contract (reference: ``src/daft-dsl/src/expr/mod.rs:474-501``).

    ``map_partial(pdf) -> pdf`` pre-aggregates each Arrow batch down to
    one state row per key (runs inside the scan stage, before any
    shuffle); ``reduce_final(key, pdf_of_states) -> pdf`` merges the
    per-batch states after the key shuffle and finishes the result.

    Scale contrast with ``udaf``/GROUPED_AGG pandas UDFs: those shuffle
    EVERY input row to the reducer; this shuffles at most
    (batches x distinct-keys-per-batch) state rows — the same reason
    built-in aggs run partial+final HashAggregate. Use it whenever the
    aggregation state is mergeable.

    Returns a callable ``apply(df) -> DataFrame``.
    """

    def apply(df):
        sdf = df if not hasattr(df, "_sdf") else df._sdf
        partial = sdf.mapInPandas(
            lambda it: (map_partial(pdf) for pdf in it), partial_schema
        )
        return partial.groupBy(*keys).applyInPandas(reduce_final, output_schema)

    return apply


def generator_udf(schema: str):
    """Generator UDF -> one output row per yield (reference generator
    @daft.func, udf_v2.py:55,100,188). Use with
    df.mapInPandas(generator_udf(schema)(fn), schema)."""

    def deco(fn: Callable):
        def map_fn(batches):
            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    for produced in fn(*row):
                        out.append(produced)
                yield pd.DataFrame(out)

        return map_fn

    return deco


def udtf(return_schema: str):
    """Table function decorator (reference: generator @daft.func used as
    a UDTF — udf_v2.py:55; Spark 4 native @udtf): the class's eval()
    yields output rows. Registerable for SQL lateral use via
    spark.udtf.register."""
    from pyspark.sql.functions import udtf as spark_udtf

    def deco(user_cls):
        return spark_udtf(user_cls, returnType=return_schema)

    return deco


class cls:  # noqa: N801 — reference spells it @daft.cls
    """Stateful class UDF (reference @daft.cls/@daft.method): expensive
    __init__ runs ONCE per executor process (lazy module-level
    singleton), not per batch — the Spark-native replacement for the
    reference's actor pools. Concurrency = executor cores; bound it with
    spark.task.cpus rather than max_concurrency.

    Usage::

        @daft_spark.udf.cls
        class Embedder:
            def __init__(self):
                self.model = load_model()          # once per executor
            def __call__(self, s: pd.Series) -> pd.Series:
                return s.map(self.model)

        df.withColumn("emb", Embedder.as_pandas_udf("array<float>")(df.text))
    """

    _instances: dict[str, object] = {}

    def __init__(self, user_cls):
        functools.update_wrapper(self, user_cls, updated=[])
        self._user_cls = user_cls

    def instance(self):
        key = f"{self._user_cls.__module__}.{self._user_cls.__qualname__}"
        inst = cls._instances.get(key)
        if inst is None:
            inst = self._user_cls()
            cls._instances[key] = inst
        return inst

    def as_pandas_udf(self, return_dtype: str):
        outer = self

        @pandas_udf(return_dtype)
        def _run(*series: pd.Series) -> pd.Series:
            return outer.instance()(*series)

        return _run

    def as_map_in_pandas(self, schema: str):
        """mapInPandas runner for whole-frame stateful transforms."""
        outer = self

        def _run(batches):
            inst = outer.instance()
            for pdf in batches:
                yield inst(pdf)

        return _run, schema


def method(fn):
    """@daft.method parity: marker decorator on @cls class methods.

    Identity (NOT staticmethod — that would strip the ``self`` binding
    and silently shift arguments); instance binding is preserved so
    ``instance.method(x)`` receives (self, x) as the reference does."""
    fn.__daft_method__ = True
    return fn
