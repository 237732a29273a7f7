"""r11 verdict tasks 2+3: fresh-JVM isolated TPC-H runs at sf10 with
AQE / partition-shaping A/Bs, interleaved-paired against DuckDB.

Each CONFIG runs in its own subprocess (fresh JVM — no cross-config
cache/GC contamination): the 9 TPC-H headliners, 1 cold + N warm
passes, every Spark pass immediately followed by the same query's
DuckDB pass (time-adjacent pairing, host drift cancels in the ratio).

Configs:
  base          current daft_spark.context defaults
  aqe64         coalescePartitions.parallelismFirst=false +
                advisoryPartitionSizeInBytes=64m
  aqe128        ... 128m
  scan512       files.maxPartitionBytes=512m (scan-split sizing)
  aqe64_scan512 both

Usage: python tools/tpch_isolated_ab.py [sf_dir] [out_json] [--configs a,b]

NOTE: a default run (no --configs) sweeps EVERY entry in CONFIGS,
including arms added for one-off documented-no A/Bs (shj/shj_aqe/zstd)
that are expected to lose locally — ~11 full fresh-JVM config runs.
Pass --configs explicitly for anything but a deliberate full sweep.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9",
           "tpch_q10", "tpch_q13", "tpch_q18", "tpch_q21"]

CONFIGS: dict[str, dict[str, str]] = {
    "base": {},
    "aqe64": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "aqe128": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
    },
    "scan512": {"spark.sql.files.maxPartitionBytes": "536870912"},
    "aqe64_scan512": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.files.maxPartitionBytes": "536870912",
    },
    # r12 verdict task 5 arms (512MB scan splits are the adopted
    # default since r12, so these stack on base):
    "shuf64": {"spark.sql.shuffle.partitions": "64"},
    "bcast32m": {"spark.sql.autoBroadcastJoinThreshold": "33554432"},
    "shuf64_bcast32m": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.autoBroadcastJoinThreshold": "33554432",
    },
    # r13 verdict task 6 — the declared FINAL arm: parquet vectorized
    # reader batch size (default 4096 rows) and scan open cost
    # (default 4MB; lower packs more small files per split).
    "batch16k": {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
    "opencost64k": {"spark.sql.files.openCostInBytes": "65536"},
    "batch16k_opencost64k": {
        "spark.sql.parquet.columnarReaderBatchSize": "16384",
        "spark.sql.files.openCostInBytes": "65536",
    },
    # r14 optimization round — the one join-strategy knob no prior arm
    # tried (guide §3.1): allow shuffled hash join instead of
    # sort-merge when its size conditions fit, and let AQE rewrite
    # SMJ->SHJ at runtime when every post-shuffle partition is under
    # the local-map threshold.
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "shj_aqe": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
    },
    # r14 optimization round, deferred item 3 (guide §2.3): shuffle /
    # spill / broadcast block compression codec. lz4 is the Spark
    # default (fast, weak compression); zstd trades CPU for smaller
    # shuffle bytes — the win axis is network-bound cluster shuffles,
    # so a local[32] loss is expected and would mean "parameterize for
    # cluster, keep lz4 locally", not "never".
    "zstd": {"spark.io.compression.codec": "zstd"},
}

_CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, "@REPO@")
overrides = json.loads(os.environ["AB_OVERRIDES"])
sf_dir = os.environ["AB_SF_DIR"]
warm = int(os.environ.get("AB_WARM", "2"))
from daft_spark.context import get_or_create, release_caches
spark = get_or_create(app_name="tpch_ab", master="local[32]",
                      extra_confs=overrides)
for k, v in overrides.items():
    try:
        spark.conf.set(k, v)
    except Exception:
        pass
from daft_spark.queries import all_queries
reg = all_queries()
import duckdb
con = duckdb.connect(); con.execute("SET threads = 32")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    p = os.path.join(sf_dir, t + ".parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    elif not os.path.exists(p):
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
names = json.loads(os.environ["AB_QUERIES"])
out = {"spark": {}, "duckdb": {}, "cold": {}}
for n in names:  # cold
    t0 = time.perf_counter()
    reg[n].spark_fn(spark, sf_dir).toArrow()
    out["cold"][n] = round(time.perf_counter() - t0, 3)
    release_caches(spark)
    con.execute(reg[n].oracle).arrow()
for _ in range(warm):
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    for n in names:
        t0 = time.perf_counter()
        reg[n].spark_fn(spark, sf_dir).toArrow()
        out["spark"].setdefault(n, []).append(round(time.perf_counter() - t0, 3))
        release_caches(spark)
        t0 = time.perf_counter()
        con.execute(reg[n].oracle).arrow()
        out["duckdb"].setdefault(n, []).append(round(time.perf_counter() - t0, 3))
res = {"cold": out["cold"], "spark_passes": out["spark"],
       "duckdb_passes": out["duckdb"], "median": {}, "paired_ratio": {}}
for n in names:
    s, d = out["spark"][n], out["duckdb"][n]
    res["median"][n] = round(statistics.median(s), 3)
    res["paired_ratio"][n] = round(statistics.median(
        [a / max(b, 1e-3) for a, b in zip(s, d)]), 2)
spark.stop()
print("AB_RESULT " + json.dumps(res))
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/spark_graft_sf10"
    out_path = args[1] if len(args) > 1 else os.path.join(
        REPO, "probes", "TPCH_AQE_AB_r12.json")
    want = None
    queries = QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--configs="):
            want = a.split("=", 1)[1].split(",")
        if a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
    results: dict = {"sf_dir": sf_dir, "queries": queries, "configs": {}}
    for cname, overrides in CONFIGS.items():
        if want and cname not in want:
            continue
        env = dict(
            os.environ,
            AB_OVERRIDES=json.dumps(overrides),
            AB_SF_DIR=sf_dir,
            AB_QUERIES=json.dumps(queries),
        )
        print(f"# config {cname} ...", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("@REPO@", REPO)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("AB_RESULT ")]
        if not line:
            print(f"# config {cname} FAILED:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            results["configs"][cname] = {"error": proc.stderr[-500:]}
            continue
        results["configs"][cname] = json.loads(line[-1][len("AB_RESULT "):])
        results["configs"][cname]["overrides"] = overrides
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({c: results["configs"][c].get("paired_ratio")
                      for c in results["configs"]}))


if __name__ == "__main__":
    main()
