"""Refresh SF1_RESULTS.json — the precomputed sf1/sf10 runs bench.py
embeds in its output so every per-round artifact carries the
large-scale ratios.

Usage:
    python tools/run_scale_bench.py sf1            # x10 fixture
    python tools/run_scale_bench.py sf10           # x100 fixture
    python tools/run_scale_bench.py sf1 sf10       # both, sequentially

Generates the fixture with tools/gen_sf.py if absent (keyspace
sharding of the driver's sf0.1), runs bench.py as a SUBPROCESS (fresh
JVM, no session reuse), strips the embedded scale keys from its
output, and splices the run into SF1_RESULTS.json under the requested
key with a regeneration timestamp in the note.

Run this on an otherwise-idle sandbox: concurrent Spark sessions
fight for driver heap and produce garbage numbers (see the variance
note in SF1_RESULTS.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "SF1_RESULTS.json")
FACTORS = {"sf1": 10, "sf10": 100}


def ensure_fixture(tag: str) -> str:
    dst = f"/tmp/spark_graft_{tag}"
    if not os.path.isdir(dst) or not os.path.isdir(os.path.join(dst, "lineitem.parquet")):
        print(f"# generating {dst} (x{FACTORS[tag]})", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_sf.py"),
             "/root/testdata/sf0.1", dst, str(FACTORS[tag])],
            check=True,
        )
    return dst


# The r8-round headline mix — the round-over-round comparability stat:
# later rounds added queries (lm_perplexity r9, mix_split_pack +
# dsir_weights r11, dedup_resolve_containment r12), so the suite ratio
# alone can't be compared across rounds; the paired ratio over this
# FIXED mix can. Only comparable (duckdb-paired) members contribute.
R8_MIX = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10",
    "tpch_q13", "tpch_q18", "tpch_q21", "w_running_agg",
    "asof_backward_by", "dedup_exact", "dedup_minhash_lsh_pipeline",
    "dedup_resolve", "text_quality", "sim_topk_cosine",
]


def r8_mix_paired(data: dict) -> float | None:
    """Median over sweeps of (sum spark pass k / sum duckdb pass k)
    restricted to the r8 mix — same shape as bench.py's suite stat."""
    import statistics

    vref = data.get("vs_local_reference") or {}
    dpasses = vref.get("passes") or {}
    spasses = data.get("passes") or {}
    sweeps = []
    k = 0
    while True:
        snum = dnum = 0.0
        hit = False
        for n in R8_MIX:
            sr, dr = spasses.get(n, []), dpasses.get(n, [])
            if len(sr) > k and len(dr) > k:
                snum += sr[k]
                dnum += dr[k]
                hit = True
        if not hit:
            break
        if dnum > 0:
            sweeps.append(snum / dnum)
        k += 1
    return round(statistics.median(sweeps), 2) if sweeps else None


def run_bench(sf_dir: str) -> dict:
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, check=True, capture_output=True, text=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    data = json.loads(line)
    # the compact stdout line carries headline numbers only; the bulky
    # blocks (raw passes, duckdb pairing) land in the BENCH_DETAIL.json
    # sidecar — fold the reference block back in so SF1_RESULTS stays
    # self-contained for the per-round embed
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            detail = json.load(f)
        for k in ("vs_local_reference", "passes", "min_sec"):
            if k in detail:
                data[k] = detail[k]
    except Exception as e:
        print(f"# no sidecar detail: {e}", file=sys.stderr)
    for k in ("sf1", "sf10", "scale", "detail_file"):
        data.pop(k, None)
    data["r8_mix_paired_ratio"] = r8_mix_paired(data)
    return data


def main(tags: list[str]) -> None:
    with open(RESULTS) as f:
        results = json.load(f)
    for tag in tags:
        if tag not in FACTORS:
            raise SystemExit(f"unknown tag {tag!r} (have {sorted(FACTORS)})")
        sf_dir = ensure_fixture(tag)
        print(f"# benching {tag} at {sf_dir}", file=sys.stderr)
        results[tag] = run_bench(sf_dir)
        stamp = time.strftime("%Y-%m-%d")
        results["note"] = results["note"].split(" Generated ")[0] + f" Generated {stamp}."
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k].get("value") for k in tags}))


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf1"])
