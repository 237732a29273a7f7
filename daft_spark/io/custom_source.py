"""Custom source API — parity with the reference's pluggable
``ScanOperator`` (reference: ``daft/io/source.py``; ``read_generator``
``daft/io/_generator.py:22``) via Spark 4's Python DataSource API.

A user source supplies: a schema, a list of partitions, and a
``read(partition) -> iterator of tuples``. Spark schedules one task per
partition — the same contract as the reference's scan tasks, and it
scales exactly like any other scan (predicate/column handling stays in
Catalyst above the source).
"""

from __future__ import annotations

import base64
from collections.abc import Callable, Iterator, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from daft_spark.context import configure, get_or_create


class _GeneratorSource(DataSource):
    """Bridges a cloudpickled python generator function: the function
    rides inside the reader (options are plumbed through pickle), so it
    reaches executor worker processes intact."""

    @classmethod
    def name(cls) -> str:
        return "daft_generator"

    def schema(self) -> str:
        return self.options["gen_schema"]

    def reader(self, schema) -> "_GeneratorReader":
        return _GeneratorReader(self.options)


class _GeneratorReader(DataSourceReader):
    def __init__(self, options):
        from pyspark import cloudpickle

        self.fn = cloudpickle.loads(base64.b64decode(options["gen_fn"]))
        self.num_partitions = int(options["gen_partitions"])

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from self.fn(partition.value)


def read_generator(
    generator: Callable[[int], Iterator[tuple[Any, ...]]],
    schema: str,
    num_partitions: int = 8,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Parity: ``daft.read_generator`` — ``generator(partition_index)``
    yields row tuples matching ``schema``; one Spark task per partition.
    The generator is cloudpickled to executors (must be picklable, the
    same requirement the reference places on its generator sources)."""
    spark = configure(spark) if spark is not None else get_or_create()
    from pyspark import cloudpickle

    payload = base64.b64encode(cloudpickle.dumps(generator)).decode("ascii")
    try:
        spark.dataSource.register(_GeneratorSource)
    except Exception:
        pass  # already registered
    return (
        spark.read.format("daft_generator")
        .option("gen_fn", payload)
        .option("gen_schema", schema)
        .option("gen_partitions", num_partitions)
        .load()
    )


def register_source(spark: SparkSession, source_cls: type[DataSource]) -> None:
    """Register a user DataSource class (the ScanOperator plug point)."""
    spark.dataSource.register(source_cls)
