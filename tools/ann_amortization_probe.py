"""Stored-ANN amortization split (r12 verdict task 3): the r12 scale
rows timed BUILD+SEARCH together; this probe publishes the split the
100 TB story actually rests on — build once, then every search is a
statically partition-pruned scan that must be much cheaper than the
build.

Per SF and per kind (ivf, ivfpq):
  1. build_ivf_index once over the embeddings corpus   -> build_sec
  2. N repeated search_ivf_index calls (collected)     -> search_secs
  3. add_to_ivf_index of a re-keyed 5% batch           -> append_sec
  4. N more searches over the appended index           -> search_after

Usage: python tools/ann_amortization_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {
    "sf1": "/tmp/spark_graft_sf1",
    "sf10": "/tmp/spark_graft_sf10",
}
N_SEARCH = 10
NUM_CENTROIDS = 32
NPROBE = 4
K = 10


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "ANN_AMORTIZATION_r13.json",
        )
    )
    from pyspark.sql import functions as F

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table
    from daft_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    spark = get_or_create(app_name="ann_amortization", master="local[32]")
    results: dict = {
        "note": (
            "Build-vs-search split for the persisted ANN index "
            f"(num_centroids={NUM_CENTROIDS}, nprobe={NPROBE}, k={K}, "
            f"{N_SEARCH} searches per phase, local[32]). search_secs "
            "are successive calls against the SAME stored index (no "
            "training stage in the plan); append is a re-keyed 5% "
            "batch through add_to_ivf_index (assignment via broadcast "
            "centroids + partitioned parquet append)."
        ),
        "runs": {},
    }
    for sf, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            results["runs"][sf] = {"skipped": "fixture missing"}
            continue
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        n_corpus = emb.count()
        queries = (
            emb.filter(F.col("vec_id") % 397 == 0)
            .limit(50)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            .localCheckpoint(eager=True)
        )
        n_queries = queries.count()
        # the append batch: 5% of the corpus re-keyed past the id space
        batch = (
            emb.filter(F.col("vec_id") % 20 == 7)
            .select(
                (F.col("vec_id") + F.lit(10_000_000_000)).alias("vec_id"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )
        n_batch = batch.count()
        for kind in ("ivf", "ivfpq"):
            idx = f"/tmp/daft_spark_ann_probe/{sf}_{kind}"
            shutil.rmtree(idx, ignore_errors=True)
            release_caches(spark)
            t0 = time.monotonic()
            build_ivf_index(
                emb, idx, num_centroids=NUM_CENTROIDS, kind=kind, iters=3
            )
            build_sec = time.monotonic() - t0

            def one_search() -> float:
                t = time.monotonic()
                search_ivf_index(
                    spark, idx, queries, k=K, nprobe=NPROBE
                ).collect()
                return time.monotonic() - t

            search_secs = [one_search() for _ in range(N_SEARCH)]
            t0 = time.monotonic()
            add_to_ivf_index(batch, idx)
            append_sec = time.monotonic() - t0
            search_after = [one_search() for _ in range(N_SEARCH)]
            med = sorted(search_secs)[len(search_secs) // 2]
            med_after = sorted(search_after)[len(search_after) // 2]
            results["runs"][f"{sf}_{kind}"] = {
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "n_append_batch": n_batch,
                "build_sec": round(build_sec, 3),
                "search_secs": [round(s, 3) for s in search_secs],
                "search_median_sec": round(med, 3),
                "append_sec": round(append_sec, 3),
                "search_after_append_secs": [
                    round(s, 3) for s in search_after
                ],
                "search_after_append_median_sec": round(med_after, 3),
                "build_over_search": round(build_sec / med, 2),
            }
            print(
                f"{sf} {kind}: build {build_sec:.2f}s, search median "
                f"{med:.3f}s ({build_sec / med:.1f}x), append "
                f"{append_sec:.2f}s, search-after {med_after:.3f}s",
                flush=True,
            )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
