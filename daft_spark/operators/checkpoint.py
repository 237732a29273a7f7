"""Resumable-pipeline checkpointing — skip rows already written.

Parity: the reference's checkpoint operator (reference:
``ops/stage_checkpoint_keys.rs:26``, ``src/daft-checkpoint/``,
``skip_existing`` at ``daft/dataframe/dataframe.py:3233``,
rewrite rule ``rules/rewrite_checkpoint_source.rs``).

Spark-first: a LEFT ANTI join against the keys already present in the
output dataset — one scan of the (pruned, key-column-only) output, one
shuffle. Idempotent restarts for 100 TB batch jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def skip_existing(
    df: DataFrame,
    output_path: str,
    key_cols: list[str],
    output_format: str = "parquet",
) -> DataFrame:
    """Drop rows whose key already exists in output_path. Missing/empty
    output -> pass-through (first run)."""
    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    try:
        existing = (
            spark.read.format(output_format).load(output_path).select(*key_cols).distinct()
        )
    except AnalysisException as e:
        # ONLY a missing/empty output means "first run". Any other error
        # (permissions, corrupt footer, flaky FS) must re-raise — silently
        # passing rows through would re-append duplicates and defeat the
        # idempotency guarantee this operator exists to provide.
        msg = str(e)
        if ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg):
            return df
        raise
    return df.join(existing, on=key_cols, how="left_anti")


def checkpointed_write(
    df: DataFrame,
    output_path: str,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """skip_existing + append write: safe to re-run after partial failure."""
    remaining = skip_existing(df, output_path, key_cols)
    from daft_spark.io.writers import write_parquet

    write_parquet(remaining, output_path, partition_cols=partition_cols, write_mode="append")
