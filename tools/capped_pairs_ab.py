"""Interleaved A/B: _capped_bucket_pairs' bucket-key repartition +
eager cache fill (r14 change 8) vs the previous formulation (plain
persist, lazy fill).

Motivation (guide §2.3/§2.4): the executed-plan audit of the full
minhash miner showed the stacked (band, id) stream crossing a
hashpartitioning(band_id, band_hash) exchange under EVERY consumer of
the persisted frame — the oversized-bucket groupBy under BOTH tagged
branches plus the collect_list pair groupBy, three exchanges of the
whole stream, no ReusedExchange. Repartitioning ONCE on the bucket
keys inside the cache fill and materializing the cache eagerly (so
consumers plan against the BUILT InMemoryRelation instead of
conservatively re-shuffling a cold one) leaves a single exchange.

Arms alternate within one session (monkeypatching
dedup._capped_bucket_pairs), bench-identical timing: the clock covers
operator CONSTRUCTION (which in the new arm includes the eager fill
job) + toArrow of the ordered result, release_caches between passes.
Pair-set identity is asserted once per scale before timing.

Usage: python tools/capped_pairs_ab.py [sf_dir] [passes] [cpus]
Writes/merges probes/CAPPED_PAIRS_AB_r14.json keyed by sf_dir+cpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _old_capped_bucket_pairs(stacked: DataFrame, bucket_keys: list,
                             max_bucket_size: int) -> DataFrame:
    """Pre-change formulation: plain persist, lazy fill — every
    bucket-keyed consumer pays its own exchange."""
    stacked = stacked.persist()
    oversized = (
        stacked.groupBy(*bucket_keys)
        .agg(F.count(F.lit(1)).alias("__bc"), F.min("__id").alias("__rep"))
        .filter(F.col("__bc") > max_bucket_size)
    )
    tagged = stacked.join(F.broadcast(oversized), bucket_keys, "left")
    small = tagged.filter(F.col("__bc").isNull()).select(*bucket_keys, "__id")
    grouped = small.groupBy(*bucket_keys).agg(F.collect_list("__id").alias("__ids"))
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(__ids, (x, i) -> "
                "transform(slice(__ids, i + 2, size(__ids)), "
                "y -> struct(least(x, y) AS id_a, greatest(x, y) AS id_b)))"
            )
        )
    )
    small_pairs = (
        grouped.select(pair.alias("__p"))
        .select("__p.id_a", "__p.id_b")
        .filter(F.col("id_a") != F.col("id_b"))
    )
    star_pairs = (
        tagged.filter(F.col("__bc").isNotNull() & (F.col("__id") != F.col("__rep")))
        .select(F.col("__rep").alias("id_a"), F.col("__id").alias("id_b"))
    )
    return small_pairs.unionAll(star_pairs).distinct()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table
    from daft_spark.operators import dedup

    new_fn = dedup._capped_bucket_pairs
    spark = get_or_create(app_name="capped_pairs_ab", master=f"local[{cpus}]")

    def run_miner():
        df = load_table(spark, sf_dir, "documents")
        return dedup.minhash_near_dups(
            df, "text", "doc_id", num_hashes=64, bands=16, threshold=0.5
        ).orderBy("id_a", "id_b")

    # identity check once: same pair set from both arms
    dedup._capped_bucket_pairs = _old_capped_bucket_pairs
    old_rows = [tuple(r) for r in run_miner().collect()]
    release_caches(spark)
    dedup._capped_bucket_pairs = new_fn
    new_rows = [tuple(r) for r in run_miner().collect()]
    release_caches(spark)
    identical = sorted(old_rows) == sorted(new_rows)
    print(f"identity: {identical} ({len(old_rows)} pairs)")
    if not identical:
        raise SystemExit("pair sets differ — ABORT")

    res = {"old": [], "new": []}
    # warm-up pass excluded (JVM/codegen), then interleave
    for arm, fn in (("old", _old_capped_bucket_pairs), ("new", new_fn)):
        dedup._capped_bucket_pairs = fn
        run_miner().toArrow()
        release_caches(spark)
    for i in range(passes):
        for arm, fn in (("old", _old_capped_bucket_pairs), ("new", new_fn)):
            dedup._capped_bucket_pairs = fn
            spark.sparkContext.setJobDescription(f"capped_ab {arm} pass {i}")
            t0 = time.perf_counter()
            run_miner().toArrow()
            res[arm].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_caches(spark)
        print(f"pass {i}: old {res['old'][-1]} new {res['new'][-1]}")
    dedup._capped_bucket_pairs = new_fn

    summ = {
        "sf_dir": sf_dir, "cpus": cpus, "passes": passes,
        "identity_pairs": len(old_rows),
        "old": res["old"], "new": res["new"],
        "old_min": min(res["old"]), "old_med": sorted(res["old"])[len(res["old"]) // 2],
        "new_min": min(res["new"]), "new_med": sorted(res["new"])[len(res["new"]) // 2],
    }
    out = os.path.join(REPO, "probes", "CAPPED_PAIRS_AB_r14.json")
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
