"""Interleaved A/B for the r15 verify-side semi-join prune (guide
§3.4): minhash_near_dups with the prune DISABLED (size floor pushed to
infinity — the exact r14 shape, no stats job, no prune) vs AUTO
(default gate — prunes when the corpus clears the size floor AND the
candidate-volume statistic says most docs are not candidates).

HISTORICAL (r15 close): the prune LOST or tied at every measured
configuration (rd1/32c −24%, rd10/32c −10% v1 / +3%-noise v2, rd10/8c
tie) and was REVERTED from operators/dedup.py — the env knobs this
tool's arms flip no longer exist, so a re-run now measures shipped
code against itself. Kept for the probe JSONs' provenance
(probes/VERIFY_PRUNE_AB_*_r15.json) and as the harness to revive on a
cluster where the sets frame actually spills/ships.

Protocol per the measurement discipline (OPTIMIZATION_r14.md): each arm
runs in a FRESH subprocess/JVM; arms alternate (off, auto, auto, off,
...) so host drift hits both; per-pass times use the noop sink (guide
§1.4 — times the computation, not presentation); release_caches between
passes; min-of-passes is the intrinsic-cost estimator. Every arm also
computes a pair-set checksum (count + bit_xor over pairs of
xxhash64(id_a, id_b, round(jaccard, 6))) computed INSIDE Spark —
asserted identical across arms before any timing claim.

Usage:
    python tools/verify_prune_ab.py <sf_dir> <out_json> [rounds=2] [passes=3] [cpus=32]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "@REPO@")
sf_dir = os.environ["AB_SF_DIR"]
passes = int(os.environ.get("AB_PASSES", "3"))
cpus = os.environ.get("AB_CPUS", "32")
from daft_spark.context import get_or_create, release_caches
from daft_spark.io.readers import load_table
from daft_spark.operators.dedup import minhash_near_dups
from pyspark.sql import functions as F

spark = get_or_create(app_name="verify_prune_ab", master=f"local[{cpus}]")
docs = load_table(spark, sf_dir, "documents")

def run():
    return minhash_near_dups(docs, "text", "doc_id",
                             num_hashes=64, bands=16, threshold=0.5)

# identity checksum once (not timed)
out = run()
row = out.select(
    F.xxhash64("id_a", "id_b", F.round("jaccard", 6)).alias("__h")
).agg(
    F.count(F.lit(1)).alias("n"),
    F.expr("bit_xor(__h)").alias("ck"),  # order-independent, overflow-free
).collect()[0]
release_caches(spark)

times = []
for _ in range(passes):
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("verify_prune_ab pass")
    run().write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 3))
    release_caches(spark)

print("RESULT " + json.dumps(
    {"arm": os.environ["AB_ARM"], "n_pairs": row["n"],
     "checksum": int(row["ck"] or 0), "passes_sec": times}))
"""


def run_arm(arm: str, sf_dir: str, passes: int, cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "AB_SF_DIR": sf_dir,
            "AB_PASSES": str(passes),
            "AB_CPUS": str(cpus),
            "AB_ARM": arm,
        }
    )
    if arm == "off":
        # a floor no corpus reaches: the gate is never evaluated, so the
        # arm is the exact r14 shape (no stats-count job, no prune)
        env["SPARK_GRAFT_VERIFY_PRUNE_MIN_STACKED"] = str(10**18)
    else:
        env.pop("SPARK_GRAFT_VERIFY_PRUNE_MIN_STACKED", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.replace("@REPO@", REPO)],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    sf_dir, out_json = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cpus = int(sys.argv[5]) if len(sys.argv) > 5 else 32

    results = []
    for r in range(rounds):
        order = ["off", "auto"] if r % 2 == 0 else ["auto", "off"]
        for arm in order:
            res = run_arm(arm, sf_dir, passes, cpus)
            res["round"] = r
            results.append(res)
            print(res)

    checks = {(r["n_pairs"], r["checksum"]) for r in results}
    verdict = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "identity_ok": len(checks) == 1,
        "n_pairs": results[0]["n_pairs"],
        "min_off": min(min(r["passes_sec"]) for r in results if r["arm"] == "off"),
        "min_auto": min(min(r["passes_sec"]) for r in results if r["arm"] == "auto"),
        "runs": results,
    }
    with open(out_json, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({k: v for k, v in verdict.items() if k != "runs"}))


if __name__ == "__main__":
    main()
