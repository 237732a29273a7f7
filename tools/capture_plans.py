"""Capture .explain('formatted') output for the headline queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan-shape
evidence (judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  tag     e.g. r14  -> writes under plans/r14/
  suffix  e.g. before | after
  query   optional subset; default = the bench HEADLINE list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from bench import BENCH_OVERRIDES, HEADLINE
    from daft_spark.context import get_or_create
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="plan_capture")
    registry = all_queries()
    if not names:
        names = [n for n in HEADLINE if n in registry]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = BENCH_OVERRIDES.get(name, registry[name].spark_fn)
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record the failure in the artifact
            plan = f"PLAN CAPTURE FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
