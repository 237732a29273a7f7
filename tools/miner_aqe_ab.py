"""A/B: raw minhash miner + containment miner + CC loop at sf0.1 with
AQE on vs off (fresh session per arm via conf at build). Bounds how much
of the small-scale fixed cost is AQE per-stage re-planning vs genuine
work. Usage: python tools/miner_aqe_ab.py on|off [passes=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    arm = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from daft_spark.context import get_or_create, release_caches

    extra = {
        "spark.sql.adaptive.enabled": "true" if arm == "on" else "false",
    }
    spark = get_or_create(app_name=f"miner_aqe_{arm}", extra_confs=extra)
    from pyspark.sql import functions as F

    from daft_spark.io.readers import load_table
    from daft_spark.operators.cluster import connected_components
    from daft_spark.operators.dedup import containment_pairs, minhash_near_dups

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = {"arm": arm, "minhash": [], "containment": [], "cc": []}
    # warmup
    minhash_near_dups(docs, "text", "doc_id").count()
    release_caches(spark)
    edges = None
    for _ in range(passes):
        t0 = time.perf_counter()
        n = minhash_near_dups(docs, "text", "doc_id").count()
        out["minhash"].append(round(time.perf_counter() - t0, 3))
        release_caches(spark)
        t0 = time.perf_counter()
        p = containment_pairs(docs, "text", "doc_id", threshold=0.8, max_doc_freq=200)
        edges = p.select("id_a", "id_b").localCheckpoint(eager=True)
        ne = edges.count()
        out["containment"].append(round(time.perf_counter() - t0, 3))
        release_caches(spark)
        t0 = time.perf_counter()
        nc = connected_components(edges).count()
        out["cc"].append(round(time.perf_counter() - t0, 3))
        release_caches(spark)
    out["n_pairs"] = n
    out["n_edges"] = ne
    out["n_labeled"] = nc
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
