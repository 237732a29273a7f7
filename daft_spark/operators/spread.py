"""Input-width guard for CPU-bound expression stages.

A regex/hash/vector-math stage is only as parallel as its input's
split count. Real large tables arrive as thousands of parquet files —
nothing to do. Small local fixtures (and any single-file table) arrive
as ONE split, serializing the whole stage onto one task; ``spread``
repartitions exactly and only in that case, so it is a no-op on
at-scale inputs and a 1-shuffle rescue on narrow ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Spread a NARROW input across the cluster before CPU-bound
    expression work — but only when it actually arrives narrow. Small
    parquet fixtures come in as ONE split (a single task would do all
    the work); a real 100 TB input already has tens of thousands of
    splits, and `repartition()` there would round-robin-shuffle the
    entire payload for nothing, so it is skipped.

    The width probe uses ``inputFiles()`` + file sizes against
    ``spark.sql.files.maxPartitionBytes`` for file-backed frames (an
    ``.rdd`` probe builds a Python-deserialization plan per call, so it
    is kept only as the fallback for in-memory frames, where it is the
    only honest partition count)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df if df.rdd.getNumPartitions() >= target else df.repartition(target)
    if len(files) >= target:
        return df
    import os

    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    digits = "".join(ch for ch in raw if ch.isdigit()) or "134217728"
    max_pb = max(int(digits), 1)
    splits = 0
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0  # remote/unstatable — count as one split
        splits += max(1, -(-size // max_pb))
        if splits >= target:
            return df
    return df.repartition(target)
