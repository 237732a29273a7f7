"""Time one registered query (or bench override) at $SPARK_GRAFT_SF_DIR:
one cold pass + N warm passes (release_caches between), prints JSON.

Usage: python tools/single_query_bench.py <query> [warm_passes=3]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import BENCH_OVERRIDES, _materialize
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name=f"sqb_{name}")
    registry = all_queries()
    fn = BENCH_OVERRIDES.get(name, registry[name].spark_fn)
    t0 = time.perf_counter()
    _materialize(fn(spark, SF_DIR))
    cold = round(time.perf_counter() - t0, 3)
    release_caches(spark)
    passes = []
    for _ in range(warm):
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        passes.append(round(time.perf_counter() - t0, 3))
        release_caches(spark)
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": SF_DIR,
                "cold": cold,
                "passes": passes,
                "median": round(statistics.median(passes), 3),
                "min": min(passes),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
