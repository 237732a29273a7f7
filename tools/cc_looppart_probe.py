"""Sweep the CC loop's clamped partition count on the real resolve
edge set at $SPARK_GRAFT_SF_DIR.

Why: connected_components clamps the loop's shuffle width to
~2M edges/partition (r6 A/B at sf0.1: 32 -> 4 partitions halved loop
wall time — per-round stage-launch overhead dominates tiny frames).
RESOLVE_DECOMP at sf10 shows the loop at 5.3-5.6 s on ONE partition
(495k edges) — the largest stage of the resolve rows — so the clamp
may now be over-serializing real per-round compute (~1M joined rows
per round through a single task). This probe measures the loop alone
at widths 1/2/4/8 to see whether the divisor should scale down.

Writes probes/CC_LOOPPART_PROBE_r15.json (merged per sf_dir key).

Usage: python tools/cc_looppart_probe.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WIDTHS = [
    int(w)
    for w in os.environ.get("CC_PROBE_WIDTHS", "1,2,4,8").split(",")
]


def main() -> None:
    from pyspark.sql import functions as F

    from daft_spark.context import get_or_create
    from daft_spark.operators.cluster import _propagate_to_fixpoint
    from tools.cc_twohop_ab import _build_resolve_edges, _symmetric_checkpoint

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_or_create(app_name="cc_looppart_probe")
    edges, ecnt, loop_sp, session_sp = _symmetric_checkpoint(
        _build_resolve_edges(spark), spark
    )
    result: dict = {"sf_dir": SF_DIR, "n_edges": ecnt,
                    "shipped_clamp_width": loop_sp, "passes": passes,
                    "widths": {str(w): [] for w in WIDTHS}}
    sums = {}
    try:
        for i in range(passes):
            order = WIDTHS if i % 2 == 0 else WIDTHS[::-1]
            for w in order:
                spark.conf.set("spark.sql.shuffle.partitions", str(w))
                spark.sparkContext.setJobDescription(f"cc_w{w}_pass{i}")
                t0 = time.perf_counter()
                labels = _propagate_to_fixpoint(edges, 25)
                row = labels.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("component")).alias("s"),
                ).first()
                result["widths"][str(w)].append(
                    round(time.perf_counter() - t0, 3)
                )
                sums[w] = (row["n"], int(row["s"]))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", session_sp)
    result["labels_identical_across_widths"] = len(set(sums.values())) == 1
    result["mins"] = {w: min(v) for w, v in result["widths"].items()}
    result["meds"] = {w: sorted(v)[len(v) // 2]
                      for w, v in result["widths"].items()}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "probes", "CC_LOOPPART_PROBE_r15.json",
    )
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    key = os.path.basename(SF_DIR.rstrip("/"))
    if os.environ.get("CC_PROBE_WIDTHS"):
        key += "_w" + "-".join(str(w) for w in WIDTHS)
    merged[key] = result
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"mins": result["mins"], "meds": result["meds"],
                      "identical": result["labels_identical_across_widths"]}))
    spark.stop()


if __name__ == "__main__":
    main()
