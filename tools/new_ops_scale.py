"""Honest scale receipts for O(corpus)-OUTPUT queries: sink, don't
collect (r13 verdict task 3).

NEW_OPS_SCALE_r13.json's sf10 rows for queries that RETURN one row per
corpus element (text_winnow_fingerprints ~30M (doc,fp) rows, rel_ewma
one row per event) were dominated by the probe's driver-side
``.collect()`` plus the registered query's presentation ``orderBy``
(there only so the driver's sorted compare is deterministic) — not by
the operator pipeline. At 100 TB nobody collects 30M rows to a driver;
they sink to parquet. This probe publishes three columns per query:

  collect       — the registered query collected (the old protocol)
  sink_sorted   — the registered plan (incl. its presentation orderBy)
                  written to parquet via daft_spark.io.writers
  sink_operator — the RAW operator output (no presentation sort)
                  written to parquet: the number a 100 TB run pays

Protocol otherwise matches tools/new_ops_scale_r13.py: cold pass, then
min of 2 warm passes, clearCache between, local[32].

Usage: python tools/new_ops_scale.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {"sf1": "/tmp/spark_graft_sf1", "sf10": "/tmp/spark_graft_sf10"}
SINK = "/tmp/spark_graft_scale_sink"


def _raw_winnow(spark, sf_dir):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.spread import spread
    from daft_spark.operators.winnow import winnow_fingerprints

    # spread() matches the registered query: the md5 hashing is
    # CPU-bound and only as parallel as the scan's split count.
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return winnow_fingerprints(d, "text", "doc_id", k=8, w=4)


def _raw_ewma(spark, sf_dir):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.timeseries import ewma_windowed

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return ewma_windowed(
        ev, "value", ["ts", "event_id"], by=["user_id"], k=32, scale=100
    ).select("user_id", "event_id", "ewma")


RAW_OPERATOR = {
    "text_winnow_fingerprints": _raw_winnow,
    "rel_ewma": _raw_ewma,
}


def _timed(fn, release) -> float:
    fn()  # cold
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
            "probes", "NEW_OPS_SCALE_SINK_r14.json",
        )
    )
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.writers import write_parquet
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="new_ops_scale_sink", master="local[32]")
    reg = all_queries()
    release = lambda: release_caches(spark)  # noqa: E731
    results: dict = {
        "note": (
            "collect vs sink decomposition for O(corpus)-output rows "
            "(r13 verdict task 3): collect = old protocol (driver "
            "materialization + presentation orderBy); sink_sorted = "
            "same plan written to parquet; sink_operator = raw "
            "operator output, no presentation sort — the 100 TB "
            "number. Cold pass then min of 2 warm, clearCache "
            "between, local[32]."
        )
    }
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        blk: dict = {}
        for name, raw_fn in RAW_OPERATOR.items():
            spec = reg[name]
            row: dict = {}
            try:
                row["collect"] = _timed(
                    lambda: spec.spark_fn(spark, sf_dir).collect(), release
                )
                row["sink_sorted"] = _timed(
                    lambda: write_parquet(
                        spec.spark_fn(spark, sf_dir), SINK, write_mode="overwrite"
                    ),
                    release,
                )
                row["sink_operator"] = _timed(
                    lambda: write_parquet(
                        raw_fn(spark, sf_dir), SINK, write_mode="overwrite"
                    ),
                    release,
                )
            except Exception as e:  # pragma: no cover - probe resilience
                print(f"# {tag} {name} FAILED: {e}", file=sys.stderr)
                row["error"] = str(e)[:200]
            blk[name] = row
            print(f"# {tag} {name}: {row}", file=sys.stderr)
        results[tag] = blk
    shutil.rmtree(SINK, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
