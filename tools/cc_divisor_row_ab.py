"""Row-level interleaved A/B for the r15 CC loop-width divisor
(2M -> 125k edges/partition): the full registered dedup_resolve and
dedup_resolve_containment queries (bench materialization, toArrow) with
connected_components monkeypatched to each divisor, alternating arms in
one session. Run at sf10 where the 2M clamp forces a 1-partition loop.

Result (sf10, 3 passes/arm): dedup_resolve old {15.63, 14.11, 13.36}
vs new {10.74, 10.79, 10.54}; containment old {11.97, 10.91, 10.18}
vs new {9.34, 8.96, 8.57} - new wins every interleaved pass.

Usage: SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf10 python tools/cc_divisor_row_ab.py
Writes probes/CC_DIVISOR_ROW_AB_r15.json.
"""

import json, os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf10")
from daft_spark.context import get_or_create, release_caches
from daft_spark.queries import all_queries
from daft_spark.operators import cluster
import daft_spark.operators.cluster as cl

spark = get_or_create(app_name="cc_divisor_row_ab")
registry = all_queries()
import re, inspect
src = inspect.getsource(cl.connected_components)

# monkeypatch via env-ish global: re-define connected_components with divisor arg
orig_cc = cl.connected_components

def make_cc(div):
    from pyspark.sql import functions as F, Observation
    def cc(pairs, id_a="id_a", id_b="id_b", max_iterations=25):
        fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        eobs = Observation()
        edges = (fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
                 .distinct().observe(eobs, F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True))
        spark = pairs.sparkSession
        ecnt = int(eobs.get["n"])
        session_sp = spark.conf.get("spark.sql.shuffle.partitions")
        loop_sp = min(int(session_sp), max(1, ecnt // div + 1))
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
            labels = cl._propagate_to_fixpoint(edges, max_iterations)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", session_sp)
        return labels.select("node", "component")
    return cc

import daft_spark.queries.dedup as qd
res = {}
for qname in ("dedup_resolve", "dedup_resolve_containment"):
    fn = registry[qname].spark_fn
    res[qname] = {"old2M": [], "new125k": []}
    # warmup
    fn(spark, SF_DIR).toArrow(); release_caches(spark)
    for i in range(3):
        arms = [("old2M", 2_000_000), ("new125k", 125_000)]
        if i % 2: arms.reverse()
        for arm, div in arms:
            cl.connected_components = make_cc(div)
            # queries module may hold its own reference
            for mod in (qd,):
                if hasattr(mod, "connected_components"):
                    mod.connected_components = cl.connected_components
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toArrow()
            res[qname][arm].append(round(time.perf_counter() - t0, 3))
            release_caches(spark)
    print(qname, res[qname], flush=True)
cl.connected_components = orig_cc
json.dump(res, open("/root/repo/probes/CC_DIVISOR_ROW_AB_r15.json", "w"), indent=1)
