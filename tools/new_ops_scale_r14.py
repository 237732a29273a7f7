"""sf1 + sf10 scale receipts for the round-14 registrations
(sim_index_refresh, pipeline_pack_audit, dedup_quality_shift,
sim_semdedup_sweep, pipeline_corpus_curation_v5,
dedup_threshold_sweep, dedup_source_overlap, text_novelty_audit).

Every r14 row returns a BOUNDED audit/report frame (rows = labels /
(split,source) groups / thresholds), so the collect protocol IS the
honest number here — no O(corpus) materialization artifact (see
probes/NEW_OPS_SCALE_SINK_r14.json for the sink-vs-collect
decomposition of the O(corpus)-output rows).

Protocol matches tools/new_ops_scale_r13.py: cold pass, then min of 2
warm passes, clearCache between, local[32].

Usage: python tools/new_ops_scale_r14.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "sim_index_refresh",
    "pipeline_pack_audit",
    "dedup_quality_shift",
    "sim_semdedup_sweep",
    "pipeline_corpus_curation_v5",
    "dedup_threshold_sweep",
    "dedup_source_overlap",
    "text_novelty_audit",
    "sim_quantization_distortion",
    "text_vocab_growth",
    "pipeline_shard_manifest",
]

SFS = {"sf1": "/tmp/spark_graft_sf1", "sf10": "/tmp/spark_graft_sf10"}


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "NEW_OPS_SCALE_r14.json",
        )
    )
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="new_ops_scale_r14", master="local[32]")
    reg = all_queries()
    results: dict = {
        "note": (
            "r14 registrations at sf1 AND sf10: cold pass then min of "
            "2 warm passes, clearCache between, local[32]. All five "
            "rows return bounded audit frames, so collect is honest."
        )
    }
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        blk: dict = {}
        if tag == "sf10":
            # Label-blocked pair mining is O(sum B^2)·d: at sf10 the 10
            # given label blocks hold 20k vectors each -> ~4e9 128-dim
            # dot products per pass (hours on one box). The corpus-
            # scale path for semantic dedup is k-means blocking with
            # chosen k (dedup_semdedup); the sweep row's blocks are the
            # fixture's GIVEN labels, so its sf10 cost is the fixture's
            # block granularity, not a plan defect. sf1 (2k/block,
            # 72.5 s) is the honest receipt for this row.
            blk["sim_semdedup_sweep"] = "skipped: see note"
        for name in QUERIES:
            if name in blk:
                continue
            spec = reg[name]
            times = []
            try:
                n = len(spec.spark_fn(spark, sf_dir).collect())  # cold
                release_caches(spark)
                for _ in range(2):
                    t0 = time.perf_counter()
                    spec.spark_fn(spark, sf_dir).collect()
                    times.append(round(time.perf_counter() - t0, 3))
                    release_caches(spark)
                blk[name] = min(times)
                blk[f"{name}_rows"] = n
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
