"""A/B the r14 connected-components loop fusion: per-round convergence
check as an OBSERVED metric on the checkpoint materialization (1 Spark
job/round) vs the previous separate count() job (2 jobs/round).

Both arms run over the SAME prebuilt, checkpointed, symmetric edge
frame with the same clamped partition count, alternating OLD/NEW
passes inside one session so ambient load hits both arms equally
(guide §1 discipline). Two graph shapes:

  resolve   the real dedup_resolve edge set at $SPARK_GRAFT_SF_DIR
            (star edges + LSH-mined pairs, diameter ~2 — the headline
            rows' actual workload)
  chains    synthetic 1M-node path graph in chains of 8 (diameter 7),
            exercising the multi-round regime where one saved job per
            round compounds

Writes probes/CC_OBSERVE_AB_r14.json.

Usage: python tools/cc_observe_ab.py [passes_per_arm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_propagate(edges, max_iterations: int = 25):
    """The pre-r14 loop, verbatim: separate count() job per round."""
    from pyspark.sql import functions as F

    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.col("src")).alias("component"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        comp_type = labels.schema["component"].dataType
        neighbor_labels = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(
                edges["src"].alias("node"),
                F.col("component"),
                F.lit(None).cast(comp_type).alias("old"),
            )
        )
        new_labels = (
            labels.select("node", "component", F.col("component").alias("old"))
            .unionAll(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.filter(F.col("component") < F.col("old")).limit(1).count()
        )
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels, rounds


def _new_propagate(edges, max_iterations: int = 25):
    from daft_spark.operators.cluster import _propagate_to_fixpoint

    return _propagate_to_fixpoint(edges, max_iterations), None


def _build_resolve_edges(spark):
    from pyspark.sql import functions as F

    from daft_spark.io.readers import load_table
    from daft_spark.operators.dedup import minhash_near_dups

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    keyed = docs.select(
        F.col("doc_id").alias("__id"),
        F.xxhash64("text").alias("__th"),
        F.length("text").alias("__tl"),
        F.col("text").alias("__text"),
    )
    groups = (
        keyed.groupBy("__th", "__tl")
        .agg(F.min(F.struct("__id", "__text")).alias("__r"))
        .localCheckpoint(eager=True)
    )
    reps = groups.select(
        F.col("__r.__id").alias("doc_id"), F.col("__r.__text").alias("text")
    )
    mined = minhash_near_dups(
        reps, "text", "doc_id", num_hashes=64, bands=16, threshold=0.5
    ).select("id_a", "id_b")
    star = (
        keyed.select("__id", "__th", "__tl")
        .join(
            groups.select("__th", "__tl", F.col("__r.__id").alias("__rep")),
            ["__th", "__tl"],
        )
        .filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("__id").alias("id_b"))
    )
    return star.unionAll(mined)


def _build_chain_edges(spark, n: int = 1_000_000, chain: int = 8):
    from pyspark.sql import functions as F

    base = spark.range(n).filter((F.col("id") % chain) != chain - 1)
    return base.select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )


def _symmetric_checkpoint(pairs, spark):
    """connected_components' prologue: symmetric distinct edge frame,
    checkpointed, loop partitions clamped — shared by both arms."""
    from pyspark.sql import functions as F

    fwd = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        fwd.unionAll(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    ecnt = edges.count()
    session_sp = spark.conf.get("spark.sql.shuffle.partitions")
    loop_sp = min(int(session_sp), max(1, ecnt // 2_000_000 + 1))
    return edges, ecnt, loop_sp, session_sp


def main() -> None:
    from daft_spark.context import get_or_create

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_or_create(app_name="cc_observe_ab")
    result: dict = {"sf_dir": SF_DIR, "passes_per_arm": passes}
    for shape, builder in (
        ("resolve", _build_resolve_edges),
        ("chains", _build_chain_edges),
    ):
        edges, ecnt, loop_sp, session_sp = _symmetric_checkpoint(
            builder(spark), spark
        )
        block = {"n_edges": ecnt, "loop_partitions": loop_sp, "old": [], "new": []}
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
        try:
            # checksum parity: both arms must produce the identical labeling
            sums = {}
            for arm, fn in (("old", _old_propagate), ("new", _new_propagate)):
                labels = fn(edges)[0]
                from pyspark.sql import functions as F

                row = labels.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("component")).alias("s"),
                ).first()
                sums[arm] = (row["n"], int(row["s"]))
            block["labels_identical"] = sums["old"] == sums["new"]
            block["label_checksums"] = {k: list(v) for k, v in sums.items()}
            for i in range(passes):
                for arm, fn in (("old", _old_propagate), ("new", _new_propagate)):
                    t0 = time.perf_counter()
                    labels, rounds = fn(edges)
                    labels.count()
                    block[arm].append(round(time.perf_counter() - t0, 3))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", session_sp)
        block["old_min"] = min(block["old"])
        block["new_min"] = min(block["new"])
        result[shape] = block
        print(json.dumps({shape: block}), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "probes",
        "CC_OBSERVE_AB_r14.json",
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
