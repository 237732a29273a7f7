"""Interleaved A/B: containment_pairs' EAGER cache fill (r14 change 9)
vs the lazy fill it replaces.

OUTCOME: measured and REVERTED — the eager fill won/neutral at
sf0.1/32c (new 3 of 4 passes) but LOST every pass at sf1/32c (old
{60.0, 51.1, 53.6} vs new {79.6, 52.7, 55.6}); the lazy fill pipelines
the cache build into the first consumer's job, and locally the
in-memory __h re-exchanges cost less than a dedicated materialization
pass over the (much larger than _capped_bucket_pairs' keys-only
stacked frame) inverted index. Production code keeps the lazy fill;
this tool's "new" arm is therefore identical to production after the
revert — the probe JSON records the arms as they ran.

Motivation (guide §2.3/§2.4, same mechanism as change 8): change 4 gave
the inverted-index (__h, __id) frame a single __h repartition inside a
persist, but the executed-plan audit of the LAZY variant showed
consumers still running conservative hashpartitioning(__h)
ENSURE_REQUIREMENTS exchanges of the whole frame — cold-planned
consumers cannot trust the AQE-coalescible repartition inside an
unbuilt cache. Materializing the cache first (one count(), the same
scan+shuffle the first consumer pays lazily) removes every __h ENSURE
exchange (audit: 3 -> 0 at sf0.1).

Arms alternate within one session (monkeypatching
dedup.containment_pairs with the pre-change lazy formulation),
bench-identical timing: the clock covers operator CONSTRUCTION (which
in the new arm includes the eager fill job) + toArrow of the ordered
result, release_caches between passes. Pair-set identity is asserted
once per scale before timing.

Usage: python tools/containment_eager_ab.py [sf_dir] [passes] [cpus]
Writes/merges probes/CONTAINMENT_EAGER_AB_r14.json keyed by sf_dir+cpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _old_containment_pairs(df: DataFrame, text_col: str, id_col: str,
                           threshold: float = 0.8, shingle_k: int = 3,
                           max_doc_freq: int = 200) -> DataFrame:
    """Pre-change formulation: lazy fill — consumers re-exchange."""
    from daft_spark.operators.dedup import shingle_hashes

    ex = (
        shingle_hashes(df, text_col, id_col, shingle_k, fold32=False)
        .select("__id", "__h")
        .repartition("__h")
        .dropDuplicates(["__h", "__id"])
        .persist()
    )
    hot = (
        ex.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("__h")
    )
    kept = ex.join(F.broadcast(hot), "__h", "left_anti")
    denom = kept.groupBy("__id").agg(F.count(F.lit(1)).alias("__na"))
    a = kept.select(F.col("__id").alias("id_a"), "__h")
    b = kept.select(F.col("__id").alias("id_b"), "__h")
    inter = (
        a.join(b, "__h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        inter.join(denom.withColumnRenamed("__id", "id_a"), "id_a")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("__n") / F.col("__na"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table
    from daft_spark.operators import dedup

    new_fn = dedup.containment_pairs
    spark = get_or_create(app_name="containment_eager_ab",
                          master=f"local[{cpus}]")

    def run_miner():
        df = load_table(spark, sf_dir, "documents")
        return dedup.containment_pairs(df, "text", "doc_id").orderBy(
            "id_a", "id_b"
        )

    # identity check once: same pair set from both arms
    dedup.containment_pairs = _old_containment_pairs
    old_rows = [tuple(r) for r in run_miner().collect()]
    release_caches(spark)
    dedup.containment_pairs = new_fn
    new_rows = [tuple(r) for r in run_miner().collect()]
    release_caches(spark)
    identical = sorted(old_rows) == sorted(new_rows)
    print(f"identity: {identical} ({len(old_rows)} pairs)")
    if not identical:
        raise SystemExit("pair sets differ — ABORT")

    res = {"old": [], "new": []}
    # warm-up pass excluded (JVM/codegen), then interleave
    for arm, fn in (("old", _old_containment_pairs), ("new", new_fn)):
        dedup.containment_pairs = fn
        run_miner().toArrow()
        release_caches(spark)
    for i in range(passes):
        for arm, fn in (("old", _old_containment_pairs), ("new", new_fn)):
            dedup.containment_pairs = fn
            spark.sparkContext.setJobDescription(f"containment_ab {arm} pass {i}")
            t0 = time.perf_counter()
            run_miner().toArrow()
            res[arm].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_caches(spark)
        print(f"pass {i}: old {res['old'][-1]} new {res['new'][-1]}")
    dedup.containment_pairs = new_fn

    summ = {
        "sf_dir": sf_dir, "cpus": cpus, "passes": passes,
        "identity_pairs": len(old_rows),
        "old": res["old"], "new": res["new"],
        "old_min": min(res["old"]), "old_med": sorted(res["old"])[len(res["old"]) // 2],
        "new_min": min(res["new"]), "new_med": sorted(res["new"])[len(res["new"]) // 2],
    }
    out = os.path.join(REPO, "probes", "CONTAINMENT_EAGER_AB_r14.json")
    data = {}
    if os.path.exists(out):
        with open(out) as f:
            data = json.load(f)
    data[f"{os.path.basename(sf_dir)}_c{cpus}"] = summ
    with open(out, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(summ))


if __name__ == "__main__":
    main()
