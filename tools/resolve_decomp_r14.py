"""Decompose dedup_resolve / dedup_resolve_containment wall time at
sf0.1 — where do the bench seconds go? Stages timed separately with the
same session confs the bench uses:

  collapse    exact-collapse groupBy + localCheckpoint (near_dup_resolve stage 1)
  mine        pair mining over the collapsed reps (minhash LSH / containment), count()
  edges       star edges union miner edges, symmetric-distinct checkpoint (CC prologue)
  cc_loop     hash-to-min label propagation to fixpoint (rounds reported)
  joinback    duplicate_clusters join + the query's invariant aggregations

Each stage is timed after materializing its inputs, so stage times do
not overlap. Writes probes/RESOLVE_DECOMP_r14.json.

Usage: python tools/resolve_decomp_r14.py [minhash|containment|both]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _decompose(spark, which: str) -> dict:
    from pyspark.sql import functions as F

    from daft_spark.io.readers import load_table
    from daft_spark.operators.cluster import connected_components
    from daft_spark.operators.dedup import containment_pairs, minhash_near_dups

    out: dict = {}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    t0 = time.perf_counter()
    keyed = docs.select(
        F.col("doc_id").alias("__id"),
        F.col("text").alias("__text"),
        F.xxhash64("text").alias("__th"),
        F.length("text").alias("__tl"),
    )
    groups = (
        keyed.groupBy("__th", "__tl")
        .agg(F.min(F.struct("__id", "__text")).alias("__r"))
        .localCheckpoint(eager=True)
    )
    out["collapse_sec"] = round(time.perf_counter() - t0, 3)
    out["n_groups"] = groups.count()

    reps = groups.select(
        F.col("__r.__id").alias("doc_id"), F.col("__r.__text").alias("text")
    )
    t0 = time.perf_counter()
    if which == "minhash":
        mined = minhash_near_dups(
            reps, "text", "doc_id", num_hashes=64, bands=16, threshold=0.5
        ).select("id_a", "id_b")
    else:
        mined = containment_pairs(
            reps, "text", "doc_id", threshold=0.8, max_doc_freq=200
        ).select("id_a", "id_b")
    mined = mined.localCheckpoint(eager=True)
    out["mine_sec"] = round(time.perf_counter() - t0, 3)
    out["n_mined_pairs"] = mined.count()

    t0 = time.perf_counter()
    star = (
        keyed.select("__id", "__th", "__tl")
        .join(
            groups.select("__th", "__tl", F.col("__r.__id").alias("__rep")),
            ["__th", "__tl"],
        )
        .filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("__id").alias("id_b"))
    )
    edges = star.unionAll(mined).localCheckpoint(eager=True)
    out["edges_sec"] = round(time.perf_counter() - t0, 3)
    out["n_edges"] = edges.count()

    t0 = time.perf_counter()
    comp = connected_components(edges).localCheckpoint(eager=True)
    out["cc_sec"] = round(time.perf_counter() - t0, 3)
    out["n_labeled"] = comp.count()

    t0 = time.perf_counter()
    joined = docs.join(comp, docs["doc_id"] == comp["node"], "left").drop("node")
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    r = (
        joined.withColumn("cluster_id", cluster)
        .drop("component")
        .withColumn("is_representative", F.col("doc_id") == F.col("cluster_id"))
        .persist()
    )
    n_docs = r.agg(F.count(F.lit(1)).alias("n_docs"))
    keepers = r.agg(
        (
            F.sum(F.col("is_representative").cast("long"))
            == F.count_distinct(F.col("cluster_id"))
        ).alias("one_keeper_per_cluster")
    )
    per_text = (
        r.groupBy(F.xxhash64("text").alias("__th"), F.length("text").alias("__tl"))
        .agg(F.count_distinct("cluster_id").alias("nc"))
        .agg(F.max("nc").alias("m"))
        .select((F.col("m") == 1).alias("same_text_same_cluster"))
    )
    min_label = (
        r.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("mn"))
        .agg(
            F.sum(
                F.when(F.col("mn") != F.col("cluster_id"), 1).otherwise(0)
            ).alias("bad")
        )
        .select((F.col("bad") == 0).alias("keeper_is_min"))
    )
    final = n_docs.crossJoin(keepers).crossJoin(per_text).crossJoin(min_label)
    final.toArrow()
    out["joinback_aggs_sec"] = round(time.perf_counter() - t0, 3)
    r.unpersist()
    out["total_sec"] = round(
        out["collapse_sec"]
        + out["mine_sec"]
        + out["edges_sec"]
        + out["cc_sec"]
        + out["joinback_aggs_sec"],
        3,
    )
    return out


def main() -> None:
    from daft_spark.context import get_or_create, release_caches

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_or_create(app_name="resolve_decomp_r14")
    result: dict = {"sf_dir": SF_DIR}
    kinds = ["minhash", "containment"] if which == "both" else [which]
    for kind in kinds:
        runs = []
        for _ in range(2):
            runs.append(_decompose(spark, kind))
            release_caches(spark)
        result[kind] = runs
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "probes",
        "RESOLVE_DECOMP_r14.json",
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
