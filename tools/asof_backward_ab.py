"""asof_backward_by A/B at sf1/sf10 (r13 verdict task 4).

The weak-set row asof_backward_by reads 3.9x DuckDB at sf10. The prior
probe (probes/ASOF_AB.json) showed the raw backward JOIN prefers the
union+window plan (1.13 s) over broadcast (1.78 s) — but the registered
query adds stream prep (two filtered scans of events) and a global
presentation orderBy + collect. This probe decomposes the registered
row and A/Bs forcing the broadcast fast path at every layer:

  full_window / full_bcast       — registered form (orderBy + collect,
                                   the driver protocol)
  nosort_window / nosort_bcast   — same minus the presentation orderBy,
                                   forced via sum(xxhash64(payload))
  join_window / join_bcast       — raw join_asof only, same forcing
  duckdb                         — the oracle SQL in DuckDB (ratio
                                   denominator)

Result equality between paths is verified by comparing the forced
hash sums. Warm best-of-2 after a cold pass, clearCache between.

Usage: python tools/asof_backward_ab.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {"sf1": "/tmp/spark_graft_sf1", "sf10": "/tmp/spark_graft_sf10"}


def _timed(fn, release) -> float:
    fn()
    release()
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
        release()
    return min(times)


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "ASOF_BACKWARD_AB_r14.json",
        )
    )
    import duckdb
    from pyspark.sql import functions as F

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.operators.asof_join import join_asof
    from daft_spark.queries.asof import _out, _streams

    spark = get_or_create(app_name="asof_backward_ab", master="local[32]")
    release = lambda: release_caches(spark)  # noqa: E731

    def forced(df):
        # bit_xor, not sum: sum(xxhash64) long-overflows under ANSI
        return df.agg(
            F.bit_xor(
                F.xxhash64("event_id", "user_id", "click_value",
                           "purchase_value")
            )
        ).collect()[0][0]

    results: dict = {
        "experiment": "asof_backward_by decomposition + broadcast A/B "
                      "(r13 verdict task 4)",
        "method": "cold pass then min of 2 warm, clearCache between, "
                  "local[32]; hash equality verified between paths",
    }
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        blk: dict = {}

        def q(broadcast):
            clicks, buys = _streams(spark, sf_dir)
            return join_asof(clicks, buys, on="ts", by="user_id",
                             strategy="backward", broadcast=broadcast)

        h_w, h_b = forced(q(False)), forced(q(True))
        blk["hash_equal"] = bool(h_w == h_b)
        blk["full_window"] = _timed(lambda: _out(q(False)).collect(), release)
        blk["full_bcast"] = _timed(lambda: _out(q(True)).collect(), release)
        blk["nosort_window"] = _timed(lambda: forced(q(False)), release)
        blk["nosort_bcast"] = _timed(lambda: forced(q(True)), release)

        con = duckdb.connect()
        ep = os.path.join(sf_dir, "events.parquet")
        if os.path.isdir(ep):
            ep = os.path.join(ep, "*.parquet")
        con.execute(
            f"create view events as select * from read_parquet('{ep}')"
        )
        from daft_spark.queries import all_queries

        sql = all_queries()["asof_backward_by"].oracle
        con.execute(sql).fetchall()  # cold
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(round(time.perf_counter() - t0, 3))
        blk["duckdb"] = min(times)
        results[tag] = blk
        print(f"# {tag}: {blk}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
