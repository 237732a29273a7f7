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
    "dedup_minhash_lsh_pipeline",
    "text_quality",
    "sim_topk_cosine",
]


def main() -> None:
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="daft_spark_bench", master=f"local[{CPUS}]")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    timings: dict[str, float] = {}
    # Cold pass: JVM warm-up + codegen + parquet footers (recorded as
    # cold_total); timed pass measures steady-state throughput — the
    # same warm-run discipline as the reference's pytest-benchmark
    # harness (tests/benchmarks/test_local_tpch.py).
    #
    # Both engines materialize results as Arrow (Spark toArrow, DuckDB
    # .arrow()): the query's full result must land in driver memory in
    # columnar form. Per-row Python object construction (collect /
    # fetchall) measures the client binding, not the engine — at 1M+
    # result rows it dominated Spark timings while DuckDB's C-level
    # tuples hid the same cost.
    cold_total = 0.0
    failed: set[str] = set()
    for name in names:
        t0 = time.perf_counter()
        try:
            _materialize(registry[name].spark_fn(spark, SF_DIR))
            cold_total += time.perf_counter() - t0
        except Exception as e:
            print(f"# bench {name} FAILED (cold): {e}", file=sys.stderr)
            failed.add(name)
        # Caches persisted inside one query's plan must not leak into the
        # next query's executor storage (they distort its timing via
        # eviction churn and GC); every timing below is self-contained.
        release_caches(spark)

    total = 0.0
    for name in names:
        if name in failed:
            timings[name] = -1.0
            continue
        t0 = time.perf_counter()
        try:
            df = registry[name].spark_fn(spark, SF_DIR)
            _materialize(df)
            dt = time.perf_counter() - t0
        except Exception as e:  # record failures as -1, keep going
            print(f"# bench {name} FAILED: {e}", file=sys.stderr)
            dt = -1.0
        timings[name] = round(dt, 3)
        if dt > 0:
            total += dt
        release_caches(spark)

    # Like-for-like local reference: DuckDB (the correctness oracle) runs
    # the SAME queries on the SAME parquet at the SAME scale factor and
    # thread count. The reference's own published numbers are cluster
    # SF100/SF1000 (BASELINE.md) — not comparable at this SF — and its
    # wheel is not installable in this container, so DuckDB, a
    # state-of-the-art single-node vectorized engine, is the honest local
    # stand-in. ratio = ours / duckdb over the oracled headline queries
    # (warm pass for both engines).
    vs_ref = _duckdb_reference(registry, names, failed)

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
                "vs_local_reference": _with_ratio(vs_ref, timings),
            }
        )
    )
    spark.stop()


def _materialize(df) -> None:
    """Pull the full result into the driver as Arrow (columnar), falling
    back to collect() for result types Arrow can't convey."""
    try:
        df.toArrow()
    except Exception:
        df.collect()


def _with_ratio(vs_ref: dict, timings: dict) -> dict:
    ours = sum(timings[n] for n in vs_ref["queries"] if timings.get(n, -1) > 0)
    dtotal = vs_ref["duckdb_total_sec"]
    slow = {
        n: round(timings[n] / max(vs_ref["queries"][n], 1e-3), 1)
        for n in vs_ref["queries"]
        if timings.get(n, -1) > 0 and timings[n] > 2 * max(vs_ref["queries"][n], 1e-3)
    }
    return {
        **vs_ref,
        "ours_comparable_sec": round(ours, 3),
        "ratio": round(ours / dtotal, 2) if dtotal > 0 else None,
        "per_query_over_2x": slow,
    }


def _duckdb_reference(registry, names, failed) -> dict:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads = {CPUS}")
    tables = "region nation customer supplier part orders lineitem events documents embeddings"
    for t in tables.split():
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    dtimes: dict[str, float] = {}
    for name in names:
        oracle = registry[name].oracle
        if oracle is None or name in failed:
            continue  # non-SQL-expressible (e.g. dedup_minhash_lsh) — excluded
        try:
            con.execute(oracle).arrow()  # warm (buffers + plan cache)
            t0 = time.perf_counter()
            con.execute(oracle).arrow()
            dtimes[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"# bench duckdb {name} FAILED: {e}", file=sys.stderr)
    dtotal = sum(dtimes.values())
    return {
        "engine": f"duckdb[{CPUS} threads]",
        "duckdb_total_sec": round(dtotal, 3),
        "queries": dtimes,
    }


if __name__ == "__main__":
    main()
