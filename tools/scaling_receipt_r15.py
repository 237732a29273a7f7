"""Scaling receipt (r14 VERDICT task 2): show that bench.py's
$SPARK_GRAFT_CPUS axis measures real parallelism at an SF where the
data-heavy rows fan out — sf0.1 cannot (every row there is per-job
fixed cost, so 8c ~= 32c and the driver's PERF scaling block
false-flags `suspect_cpus_ignored` round after round).

Protocol (fresh JVM per arm, sequential, idle box):
  1. bench.py subprocess at sf1 with SPARK_GRAFT_CPUS=8 and =32
     (2 warm passes — the ratio needs medians, not the driver's full
     3-pass protocol; raw passes kept in the probe).
  2. tools/single_query_bench.py at sf10 for the 3 heaviest rows
     (dedup_minhash_lsh_pipeline, pipeline_dsir_weights, dedup_resolve)
     at 8c and 32c, 1 warm pass (the rows are minutes-long; cold is
     also recorded).
  3. Per-row ratio = t_8c / t_32c. Perfect scaling over the 4x core
     ratio would read 4.0 on a compute-bound row; ~1.0 means the row
     is fixed-cost-bound AT THAT SF (not that the harness ignores the
     env var — bench.py:44,128,359 honor it, see BENCH_r14_c8.json).

Writes probes/SCALING_RECEIPT_r15.json.

Usage: python tools/scaling_receipt_r15.py [--skip-sf1] [--skip-sf10]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = "/tmp/spark_graft_sf1"
SF10_DIR = "/tmp/spark_graft_sf10"
HEAVY_SF10 = ["dedup_minhash_lsh_pipeline", "pipeline_dsir_weights", "dedup_resolve"]


def _run_bench(sf_dir: str, cpus: int, passes: int = 2) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_PASSES=str(passes))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    print(f"# bench {sf_dir} c{cpus}: suite {out['value']}s "
          f"(wall {time.time() - t0:.0f}s)", file=sys.stderr)
    return out


def _run_single(sf_dir: str, cpus: int, query: str, warm: int = 1) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "single_query_bench.py"),
         query, str(warm)],
        env=env, capture_output=True, text=True, check=True,
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    print(f"# single {query} c{cpus}: min {out['min']}s cold {out['cold']}s",
          file=sys.stderr)
    return out


def main() -> None:
    skip_sf1 = "--skip-sf1" in sys.argv
    skip_sf10 = "--skip-sf10" in sys.argv
    receipt: dict = {
        "purpose": (
            "r14 VERDICT task 2 - the driver's PERF scaling block compares 8c vs 32c "
            "at sf0.1 where every row is per-job fixed cost, so ratios read ~1 and "
            "suspect_cpus_ignored false-fires. bench.py DOES honor SPARK_GRAFT_CPUS "
            "(bench.py:44 reads it, :128 builds local[CPUS], :359 sets DuckDB threads). "
            "This receipt re-runs the axis at SFs where data-heavy rows fan out."
        ),
        "protocol": "fresh JVM per arm (subprocess), sequential, ratio = t_8c/t_32c, core ratio 4x",
    }

    if not skip_sf1:
        b32 = _run_bench(SF1_DIR, 32)
        b8 = _run_bench(SF1_DIR, 8)
        rows = {}
        for q, t32 in b32["queries"].items():
            t8 = b8["queries"].get(q, -1)
            if t32 > 0 and t8 > 0:
                rows[q] = {"sec_32c": t32, "sec_8c": t8,
                           "ratio_8c_over_32c": round(t8 / t32, 2)}
        receipt["sf1"] = {
            "suite_sec_32c": b32["value"], "suite_sec_8c": b8["value"],
            "suite_ratio": round(b8["value"] / b32["value"], 2),
            "per_query": rows,
        }

    if not skip_sf10:
        singles = {}
        for q in HEAVY_SF10:
            s32 = _run_single(SF10_DIR, 32, q)
            s8 = _run_single(SF10_DIR, 8, q)
            singles[q] = {
                "sec_32c": s32["min"], "sec_8c": s8["min"],
                "cold_32c": s32["cold"], "cold_8c": s8["cold"],
                "passes_32c": s32["passes"], "passes_8c": s8["passes"],
                "ratio_8c_over_32c": round(s8["min"] / s32["min"], 2),
            }
        receipt["sf10_heavy_rows"] = singles

    path = os.path.join(REPO, "probes", "SCALING_RECEIPT_r15.json")
    with open(path, "w") as f:
        json.dump(receipt, f, indent=1)
    print(json.dumps(receipt.get("sf1", {}).get("per_query", {}), indent=0))
    print(json.dumps(receipt.get("sf10_heavy_rows", {}), indent=0))


if __name__ == "__main__":
    main()
