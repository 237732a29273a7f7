"""sf10 scale receipts for the r12 operator family (r12 verdict task
3's second half — the family was receipted only to sf1) plus the r13
registration (dedup_winnow_resolve) at sf1 and sf10.

Protocol matches tools/new_ops_scale_r12.py: cold pass, then min of 2
warm passes, clearCache between, local[32].

Usage: python tools/new_ops_scale_r13.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "sim_ann_ivf_stored", "sim_ann_ivfpq_stored",
    "text_winnow_fingerprints", "dedup_winnow_pairs",
    "dedup_winnow_resolve",
    "pipeline_grouped_split", "rel_ewma", "rel_twap",
    "text_source_divergence", "agg_count_min_sketch",
    "pipeline_calibrated_filter", "pipeline_curriculum_order",
]

SFS = {"sf1": "/tmp/spark_graft_sf1", "sf10": "/tmp/spark_graft_sf10"}


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "NEW_OPS_SCALE_r13.json",
        )
    )
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="new_ops_scale_r13", master="local[32]")
    reg = all_queries()
    results: dict = {
        "note": (
            "r12 family + dedup_winnow_resolve at sf1 AND sf10: cold "
            "pass then min of 2 warm passes, clearCache between, "
            "local[32]. The stored-ANN rows still include their "
            "per-call index BUILD; the build-vs-search split is in "
            "probes/ANN_AMORTIZATION_r13.json."
        )
    }
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        blk: dict = {}
        for name in QUERIES:
            spec = reg[name]
            times = []
            try:
                spec.spark_fn(spark, sf_dir).collect()  # cold
                release_caches(spark)
                for _ in range(2):
                    t0 = time.perf_counter()
                    spec.spark_fn(spark, sf_dir).collect()
                    times.append(round(time.perf_counter() - t0, 3))
                    release_caches(spark)
                blk[name] = min(times)
            except Exception as e:
                print(f"# {tag} {name} FAILED: {e}", file=sys.stderr)
                blk[name] = -1.0
        results[tag] = blk
        print(f"# {tag}: {blk}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
