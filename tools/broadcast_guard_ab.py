"""Interleaved A/B for the r15 broadcast-bound guards (verdict task 3)
and verify prune on the BENCH rows: is the count-guard's extra job
visible at sf0.1, and what does the auto prune add on top?

Three arms for the LSH pipeline row (bench-identical materialization:
minhash_near_dups + orderBy + toArrow, construction inside the clock,
release_caches between passes):
  old        r14 _capped_bucket_pairs (forced broadcast, no stats) —
             monkeypatched; the verify prune self-disables because no
             stats are produced
  guard      r15 code with the prune fraction forced to 0
  guard_prune r15 code as shipped (arithmetic-bound guard + size-gated
             auto prune)
NOTE (post-restructure): below _VERIFY_PRUNE_MIN_STACKED stacked rows
(sf0.1 is) the shipped code takes the free arithmetic-bound path — no
counting job, no prune — so all three arms should TIE at sf0.1; the
first run of this tool (kept in the probe JSON history) measured the
pre-restructure count-guard at +0.5 s and the ungated prune at +0.8 s
fixed cost, which is what motivated the bound + size gate.

Two arms for containment_pairs (same materialization):
  old        r14 containment_pairs (forced hot broadcast, lazy hot agg)
  new        r15 code (hot persist+count guard)

Arms alternate within one session; pair-set identity asserted per arm.

Usage: python tools/broadcast_guard_ab.py [sf_dir] [passes] [cpus] [out_json]
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
                             max_bucket_size: int,
                             stats_out: dict | None = None) -> DataFrame:
    """r14 formulation: forced oversized broadcast, no guard count, no
    observed stats (so the caller's prune gate stays closed)."""
    stacked = stacked.repartition(*bucket_keys).persist()
    stacked.count()
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


def _old_containment_pairs(df, text_col, id_col, threshold=0.8,
                           shingle_k=3, max_doc_freq=200):
    """r14 formulation: forced hot broadcast, no guard count."""
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
            "id_a", "id_b",
            F.round(F.col("__n") / F.col("__na"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    out_json = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        REPO, "probes", "BROADCAST_GUARD_AB_r15.json"
    )

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table
    from daft_spark.operators import dedup

    spark = get_or_create(app_name="broadcast_guard_ab",
                          master=f"local[{cpus}]")
    docs = load_table(spark, sf_dir, "documents")
    new_capped = dedup._capped_bucket_pairs

    def lsh_arm(arm: str):
        # post-revert: "guard" and "guard_prune" both run the shipped
        # code (the prune was reverted; the historical three-arm probe
        # JSONs kept the distinction)
        if arm == "old":
            dedup._capped_bucket_pairs = _old_capped_bucket_pairs
        else:
            dedup._capped_bucket_pairs = new_capped
        t0 = time.perf_counter()
        out = dedup.minhash_near_dups(
            docs, "text", "doc_id", num_hashes=64, bands=16, threshold=0.5
        ).orderBy("id_a", "id_b")
        tbl = out.toArrow()
        sec = round(time.perf_counter() - t0, 3)
        ck = (tbl.num_rows, hash(str(tbl.to_pydict())))
        release_caches(spark)
        return sec, ck

    def cont_arm(arm: str):
        fn = _old_containment_pairs if arm == "old" else dedup.containment_pairs
        dedup._capped_bucket_pairs = new_capped
        t0 = time.perf_counter()
        out = fn(docs, "text", "doc_id", threshold=0.8,
                 max_doc_freq=200).orderBy("id_a", "id_b")
        tbl = out.toArrow()
        sec = round(time.perf_counter() - t0, 3)
        ck = (tbl.num_rows, hash(str(tbl.to_pydict())))
        release_caches(spark)
        return sec, ck

    results = {"sf_dir": sf_dir, "cpus": cpus,
               "lsh": {"old": [], "guard": [], "guard_prune": []},
               "containment": {"old": [], "new": []}}
    lsh_cks, cont_cks = set(), set()
    for p in range(passes):
        lsh_order = ["old", "guard", "guard_prune"]
        if p % 2:
            lsh_order.reverse()
        for arm in lsh_order:
            sec, ck = lsh_arm(arm)
            results["lsh"][arm].append(sec)
            lsh_cks.add(ck)
            print(f"pass {p} lsh/{arm}: {sec}s rows={ck[0]}")
        cont_order = ["old", "new"] if p % 2 == 0 else ["new", "old"]
        for arm in cont_order:
            sec, ck = cont_arm(arm)
            results["containment"][arm].append(sec)
            cont_cks.add(ck)
            print(f"pass {p} containment/{arm}: {sec}s rows={ck[0]}")

    results["lsh"]["identity_ok"] = len(lsh_cks) == 1
    results["containment"]["identity_ok"] = len(cont_cks) == 1
    results["lsh"]["mins"] = {a: min(v) for a, v in results["lsh"].items()
                              if isinstance(v, list) and v}
    results["containment"]["mins"] = {
        a: min(v) for a, v in results["containment"].items()
        if isinstance(v, list) and v
    }
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"lsh_mins": results["lsh"]["mins"],
                      "lsh_identity": results["lsh"]["identity_ok"],
                      "cont_mins": results["containment"]["mins"],
                      "cont_identity": results["containment"]["identity_ok"]}))


if __name__ == "__main__":
    main()
