"""Benchmark harness — runs the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Counterpart of the reference's local benchmark harness
(reference: tests/benchmarks/test_local_tpch.py, conftest.py SCALE_FACTOR=0.2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: relational core + windows + custom operators. Kept in
# rough cost order so failures surface early.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q18",
    "w_running_agg",
    "asof_backward_by",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "sim_topk_cosine",
]


def main() -> None:
    from daft_spark.context import get_or_create
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="daft_spark_bench", master=f"local[{CPUS}]")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    timings: dict[str, float] = {}
    # Cold pass: JVM warm-up + codegen + parquet footers (recorded as
    # cold_total); timed pass measures steady-state throughput — the
    # same warm-run discipline as the reference's pytest-benchmark
    # harness (tests/benchmarks/test_local_tpch.py).
    cold_total = 0.0
    failed: set[str] = set()
    for name in names:
        t0 = time.perf_counter()
        try:
            registry[name].spark_fn(spark, SF_DIR).collect()
            cold_total += time.perf_counter() - t0
        except Exception as e:
            print(f"# bench {name} FAILED (cold): {e}", file=sys.stderr)
            failed.add(name)

    total = 0.0
    for name in names:
        if name in failed:
            timings[name] = -1.0
            continue
        t0 = time.perf_counter()
        try:
            df = registry[name].spark_fn(spark, SF_DIR)
            df.collect()
            dt = time.perf_counter() - t0
        except Exception as e:  # record failures as -1, keep going
            print(f"# bench {name} FAILED: {e}", file=sys.stderr)
            dt = -1.0
        timings[name] = round(dt, 3)
        if dt > 0:
            total += dt

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cold_total_sec": round(cold_total, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
