"""Input sharding for distributed training readers.

Parity: the reference's ``Shard`` op (reference: ``ops/shard.rs:13``,
``daft/logical/builder.py:182``, pushdown rule
``rules/push_down_shard.rs``): strategy/world_size/rank selection of a
deterministic 1/world_size slice of the input.

Spark-first: a key-hash filter that Catalyst pushes toward the scan —
no shuffle, no driver coordination; every worker of a training job runs
the same plan with its own rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard(
    df: DataFrame,
    world_size: int,
    rank: int,
    key: Column | str | None = None,
    strategy: str = "hash",
) -> DataFrame:
    """Keep the rows of shard ``rank`` out of ``world_size``.

    strategy='hash': deterministic pmod over a key column (or the file
    name when key=None — file-granular sharding like the reference's
    scan-task sharder, ``src/daft-scan/src/pushdowns.rs:16-36``).
    strategy='mod': raw ``key % world_size`` — engine-portable (used by
    the oracle-checked query).
    strategy='partition': spark_partition_id modulo — zero-cost but
    partitioning-dependent.
    """
    if not (0 <= rank < world_size):
        raise ValueError(f"rank {rank} out of range for world_size {world_size}")
    if strategy == "partition":
        return df.filter(F.spark_partition_id() % world_size == rank)
    if strategy == "mod":
        key_col = F.col(key) if isinstance(key, str) else key
        return df.filter(F.pmod(key_col, F.lit(world_size)) == rank)
    if strategy != "hash":
        raise ValueError(f"unknown shard strategy {strategy!r}")
    if key is None:
        key_col = F.input_file_name()
    elif isinstance(key, str):
        key_col = F.col(key)
    else:
        key_col = key
    return df.filter(F.pmod(F.xxhash64(key_col), F.lit(world_size)) == rank)
