"""A/B the fixed-overhead levers on the sub-second sf10 over-2x
queries (round-7 verdict #4: dedup_exact 12.1x at 0.63 s absolute,
tpch_q1 3.5x, tpch_q6 2.6x, w_running_agg 2.3x — job/stage fixed
costs, not data costs).

Variants (all runtime-settable SQL confs, toggled inside one session):
  base        current defaults (AQE on, parallelismFirst=true)
  coalesce1   parallelismFirst=false + 64m minPartitionSize — AQE
              coalesces post-shuffle partitions to the fewest that hit
              the size target instead of keeping cluster parallelism;
              a 6-row aggregate then runs 1 reduce task, not 32
  bigadvise   advisoryPartitionSizeInBytes=256m on top of coalesce1

Each (query, variant) runs N passes after one cold pass; the MEDIAN
and MIN are reported. Writes probes/FIXED_OVERHEAD_AB.json
for the keep/reject record (same contract as ASOF_AB / BUCKETED_AB).

Usage: SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python tools/fixed_overhead_ab.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
PASSES = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "5"))
QUERIES = ["dedup_exact", "tpch_q1", "tpch_q6", "w_running_agg"]

VARIANTS: dict[str, dict[str, str]] = {
    "base": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "coalesce1": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "bigadvise": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    },
}


def main() -> None:
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    spark = get_or_create("fixed_overhead_ab")
    registry = all_queries()
    results: dict[str, dict] = {}
    for name in QUERIES:
        spec = registry[name]
        results[name] = {}
        for vname, confs in VARIANTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            # cold pass absorbs codegen/footers for this (query, conf)
            spec.spark_fn(spark, SF_DIR).toArrow()
            times = []
            for _ in range(PASSES):
                release_caches(spark)
                t0 = time.monotonic()
                spec.spark_fn(spark, SF_DIR).toArrow()
                times.append(round(time.monotonic() - t0, 4))
            results[name][vname] = {
                "median": round(statistics.median(times), 4),
                "min": min(times),
                "passes": times,
            }
            print(f"{name:16s} {vname:10s} median={results[name][vname]['median']}"
                  f" min={results[name][vname]['min']}", file=sys.stderr)
    out = {
        "sf_dir": SF_DIR,
        "passes": PASSES,
        "variants": {k: v for k, v in VARIANTS.items()},
        "results": results,
    }
    with open(os.path.join(REPO, "probes", "FIXED_OVERHEAD_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({q: {v: r["median"] for v, r in rs.items()}
                      for q, rs in results.items()}))


if __name__ == "__main__":
    main()
