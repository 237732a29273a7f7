"""Bucketed-layout A/B for the q3/q5/q10 residual (round-5 verdict,
next-round item 6; COVERAGE.md candidate since r2).

Hypothesis: the remaining sf10 gap on the orders⋈lineitem queries is
the orderkey shuffle; pre-bucketing BOTH tables by orderkey
(bucketBy + sortBy, Spark managed tables) lets SortMergeJoin reuse the
layout and skip the exchange entirely — the 100 TB analogue is a
bucketed warehouse layout shared across every orderkey join.

Method: copy the fixture's orders/lineitem into bucketed managed
tables, monkeypatch the tpch module's table loader so the REAL
registered q3/q5/q10 plans read them, and run the same
median-of-N-warm discipline as bench.py against the plain-parquet
baseline. Prints one JSON line; the keep/reject decision and numbers
go to BENCH_DETAIL.json + COVERAGE.md.

Usage: python tools/bucketed_ab.py /tmp/spark_graft_sf1 [buckets]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["tpch_q3", "tpch_q5", "tpch_q10"]
PASSES = 3


def main(sf_dir: str, buckets: int = 32) -> None:
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table
    from daft_spark.queries import all_queries
    from daft_spark.queries import tpch as tpch_mod

    spark = get_or_create(app_name="bucketed_ab")
    registry = all_queries()

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    print(f"# warehouse: {warehouse}", file=sys.stderr)
    t0 = time.perf_counter()
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"{tbl}_bucketed_ab"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, sf_dir, tbl)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    build_sec = round(time.perf_counter() - t0, 1)
    print(f"# bucketed build: {build_sec}s", file=sys.stderr)

    plain_load = tpch_mod.load_table

    def bucketed_load(spark_, sf_dir_, tname):
        if tname in ("orders", "lineitem"):
            return spark_.table(f"{tname}_bucketed_ab")
        return plain_load(spark_, sf_dir_, tname)

    results: dict[str, dict] = {}
    for variant, loader in (("plain", plain_load), ("bucketed", bucketed_load)):
        tpch_mod.load_table = loader
        try:
            # cold pass then interleaved warm sweeps (bench.py discipline)
            for q in QUERIES:
                registry[q].spark_fn(spark, sf_dir).toArrow()
                release_caches(spark)
            runs: dict[str, list[float]] = {q: [] for q in QUERIES}
            for _ in range(PASSES):
                for q in QUERIES:
                    t0 = time.perf_counter()
                    registry[q].spark_fn(spark, sf_dir).toArrow()
                    runs[q].append(round(time.perf_counter() - t0, 3))
                    release_caches(spark)
            results[variant] = {
                q: round(statistics.median(r), 3) for q, r in runs.items()
            }
            results[f"{variant}_passes"] = runs
        finally:
            tpch_mod.load_table = plain_load

    # exchange audit: does the bucketed q5 plan drop the orderkey shuffle?
    tpch_mod.load_table = bucketed_load
    try:
        plan = registry["tpch_q5"].spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    finally:
        tpch_mod.load_table = plain_load
    exchanges_bucketed = plan.count("Exchange hashpartitioning")

    speedup = {
        q: round(results["plain"][q] / max(results["bucketed"][q], 1e-3), 2)
        for q in QUERIES
    }
    out = {
        "sf_dir": sf_dir,
        "buckets": buckets,
        "build_sec": build_sec,
        "plain": results["plain"],
        "bucketed": results["bucketed"],
        "speedup": speedup,
        "plain_passes": results["plain_passes"],
        "bucketed_passes": results["bucketed_passes"],
        "q5_bucketed_exchanges": exchanges_bucketed,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 32)
