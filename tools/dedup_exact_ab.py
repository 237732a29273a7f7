"""dedup_exact sf10 decomposition A/B (r12 verdict task 4): the worst
non-TPCH paired ratio (12.8x) has a right-shaped plan (16-byte-key
hash agg); isolate where the time actually goes —

  scan_only   : scan + xxhash64/length projection, count() only
  agg_only    : the keys-only groupBy/agg, count() only (no driver rows)
  nosort      : agg + collect, NO global orderBy (the driver-compare
                sorts rows before hashing, so the sort is cosmetic)
  full        : the registered query as-is (global orderBy + collect)

paired against DuckDB's oracle with and without its ORDER BY, same
process, alternating passes. Usage:
  python tools/dedup_exact_ab.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "probes", "DEDUP_EXACT_AB_r13.json",
    )
)
PASSES = 3


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table

    spark = get_or_create(app_name="dedup_exact_ab", master="local[32]")

    def base():
        return load_table(spark, SF_DIR, "documents").select(
            "doc_id",
            F.xxhash64("text").alias("__h"),
            F.length("text").alias("__len"),
        )

    def agg():
        return (
            base()
            .groupBy("__h", "__len")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .select("doc_id", "n_copies")
        )

    variants = {
        "scan_only": lambda: base().count(),
        "agg_only": lambda: agg().count(),
        "nosort": lambda: len(agg().collect()),
        "full": lambda: len(agg().orderBy("doc_id").collect()),
    }
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet/*.parquet')"
        if os.path.isdir(f"{SF_DIR}/documents.parquet")
        else "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle_sorted = (
        "SELECT min(doc_id) AS doc_id, count(*) AS n_copies "
        "FROM documents GROUP BY text ORDER BY doc_id"
    )
    oracle_nosort = (
        "SELECT min(doc_id) AS doc_id, count(*) AS n_copies "
        "FROM documents GROUP BY text"
    )
    results: dict = {"sf_dir": SF_DIR, "passes": PASSES, "spark": {}, "duckdb": {}}
    # warm both engines once
    variants["scan_only"]()
    con.execute(oracle_nosort).fetchall()
    for name, fn in variants.items():
        times = []
        for _ in range(PASSES):
            release_caches(spark)
            t0 = time.monotonic()
            n = fn()
            times.append(time.monotonic() - t0)
        results["spark"][name] = {
            "rows": n,
            "secs": [round(t, 3) for t in times],
            "min_sec": round(min(times), 3),
        }
        print(f"spark {name}: min {min(times):.3f}s rows={n}", flush=True)
    for name, sql in (("sorted", oracle_sorted), ("nosort", oracle_nosort)):
        times = []
        for _ in range(PASSES):
            t0 = time.monotonic()
            n = len(con.execute(sql).fetchall())
            times.append(time.monotonic() - t0)
        results["duckdb"][name] = {
            "rows": n,
            "secs": [round(t, 3) for t in times],
            "min_sec": round(min(times), 3),
        }
        print(f"duckdb {name}: min {min(times):.3f}s rows={n}", flush=True)
    sp, dk = results["spark"], results["duckdb"]
    results["ratios"] = {
        "full_vs_sorted": round(sp["full"]["min_sec"] / dk["sorted"]["min_sec"], 2),
        "nosort_vs_nosort": round(
            sp["nosort"]["min_sec"] / dk["nosort"]["min_sec"], 2
        ),
        "sort_cost_sec": round(
            sp["full"]["min_sec"] - sp["nosort"]["min_sec"], 3
        ),
        "collect_cost_sec": round(
            sp["nosort"]["min_sec"] - sp["agg_only"]["min_sec"], 3
        ),
        "agg_cost_sec": round(
            sp["agg_only"]["min_sec"] - sp["scan_only"]["min_sec"], 3
        ),
        "scan_cost_sec": sp["scan_only"]["min_sec"],
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, json.dumps(results["ratios"]))


if __name__ == "__main__":
    main()
