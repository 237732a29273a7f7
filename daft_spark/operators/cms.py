"""Count-min sketch (Cormode & Muthukrishnan 2005) as DataFrame
aggregations — no driver-side sketch object, no UDF.

The sketch is a depth x width counter table; here it IS a DataFrame:
each input row explodes to ``depth`` (row, hash_j) entries and one
map-side-combining groupBy produces (j, bucket, cnt) — at most
depth*width rows regardless of input size. Point queries join the
item's ``depth`` buckets against the table and take the min. Hashes
are xxhash64(value, seed=j) — deterministic across partitionings and
engines that ship xxhash64.

Guarantees (paper, §4): estimate >= true count always (one-sided), and
estimate <= true + eps*N with probability >= 1-delta, for
width = ceil(e/eps), depth = ceil(ln(1/delta)).

Scale: the corpus shuffles only (j, bucket) keys (depth rows per input
row, combined map-side — heavy hitters collapse before the exchange);
the sketch table is KBs and broadcasts to the probe join. Sketches of
disjoint shards MERGE by summing matching cells (cms_merge) — the
property that makes CMS the streaming/distributed counter of choice.

Reference surface: the reference ships approx sketch aggregations
(HLL in daft/ functions, approx_count_distinct); CMS complements the
Misra-Gries top-k sketch (operators/repetition.py) with point-query
frequency estimates over keys the sketch never stored.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _params(eps: float, delta: float) -> tuple[int, int]:
    if not (0.0 < eps < 1.0) or not (0.0 < delta < 1.0):
        raise ValueError("eps and delta must be in (0, 1)")
    width = int(math.ceil(math.e / eps))
    depth = int(math.ceil(math.log(1.0 / delta)))
    return depth, max(width, 1)


def cms_build(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    delta: float = 0.01,
) -> DataFrame:
    """Build the sketch table: (j int, bucket long, cnt long), at most
    depth*width rows."""
    depth, width = _params(eps, delta)
    ex = df.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(col).cast("string"), F.lit(j)),
                        F.lit(width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("j", "bucket")
    )
    return ex.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    eps: float = 0.001,
    delta: float = 0.01,
) -> DataFrame:
    """Point-query each row of ``items``: (col..., estimate long).
    eps/delta must match the build (they fix width/depth)."""
    depth, width = _params(eps, delta)
    probes = items.select(
        F.col(col),
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(col).cast("string"), F.lit(j)),
                        F.lit(width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("j", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME eps/delta: cell-wise sum."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
