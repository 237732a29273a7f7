"""r11 verdict task 9: PageRank iteration-time scale probe at sf10.

Runs the rel_pagerank graph (customer-supplier edges from orders x
lineitem) at the given fixture, timing: graph build (edges/outdeg
persists), each of 3 power iterations, and the tol-mode run on the
same graph (tol=1e-9, cap 10) to show the early-exit path's per-round
delta check costs ~nothing and converged graphs stop early.

Usage: python tools/pagerank_scale_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "PAGERANK_SCALE_r12.json",
        )
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    from daft_spark.context import configure

    configure(spark)
    from daft_spark.io.readers import load_table
    from daft_spark.operators.cluster import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    n_edges = edges.count()

    timings: dict = {"sf_dir": sf_dir, "n_edges": n_edges}
    t0 = time.time()
    r_fixed = pagerank(edges, iters=3)
    s = r_fixed.agg(F.sum("rank")).first()[0]
    timings["fixed_3_iters_sec"] = round(time.time() - t0, 2)
    timings["fixed_rank_sum"] = round(float(s), 9)
    spark.catalog.clearCache()

    t0 = time.time()
    r_tol = pagerank(edges, iters=3, tol=1e-9)
    s2 = r_tol.agg(F.sum("rank")).first()[0]
    timings["tol_3_iters_sec"] = round(time.time() - t0, 2)
    timings["tol_rank_sum"] = round(float(s2), 9)
    spark.catalog.clearCache()

    # convergence behavior: generous cap, realistic tol — how many
    # rounds does this graph actually need before the early exit fires?
    t0 = time.time()
    st: dict = {}
    r10 = pagerank(edges, iters=20, tol=1e-6, stats=st)
    r10.agg(F.sum("rank")).first()
    timings["tol1e6_cap20_sec"] = round(time.time() - t0, 2)
    timings["tol1e6_rounds"] = st.get("rounds")
    timings["tol1e6_final_delta"] = st.get("final_delta")

    with open(out_path, "w") as f:
        json.dump(timings, f, indent=1)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
