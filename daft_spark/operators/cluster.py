"""Connected components over near-duplicate pairs — the step between
pair mining (MinHash/SimHash/Jaccard, operators/dedup.py) and actual
deduplication: transitive closure groups pairs into duplicate CLUSTERS,
and each cluster keeps one representative.

The reference ships the pair-producing kernels (minhash/simhash,
daft/functions/misc.py:428-462); clustering is the standard companion
(every production dedup pipeline — e.g. the C4/RefinedWeb recipes —
dedups by connected component, not by pairwise edges).

Algorithm: hash-to-min label propagation. Every node starts labeled
with itself; each round, a node adopts the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed =
graph diameter — near-dup clusters are dense (star/clique-ish), so
2-4 rounds in practice.

100 TB posture:
- The edge list is shuffled ONCE into (node, neighbor) form; each
  round is one keys-only join + one partial-agg min — no payloads.
- The driver loop is O(diameter) Spark jobs with a scalar convergence
  check per round (the standard iterative pattern — GraphFrames'
  connected components does the same under AQE).
- ``max_iterations`` bounds pathological chains (a 100-million-node
  path graph is not a duplicate cluster; bail out loudly rather than
  loop forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label each node reachable through ``pairs`` with the MINIMUM id
    in its component. Returns (node, component) — nodes appearing in no
    pair are absent (join the full corpus with coalesce(component,
    own_id) for singleton semantics, as ``duplicate_clusters`` does).
    """
    # symmetric edge list, deduplicated; (a,b) + (b,a). localCheckpoint
    # (not persist) everywhere in this loop: persist caches DATA but
    # Catalyst still re-analyzes the full logical lineage every round, so an
    # iterative plan grows exponentially and planning itself freezes the
    # driver after ~15 rounds (measured: per-iteration wall time doubling
    # 1.0s -> 2.1s -> 4.8s -> ...). localCheckpoint truncates the lineage
    # to the materialized blocks — per-round cost stays constant, the
    # same discipline GraphFrames applies to its iterative algorithms.
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # initial label: the node's own id joined with min neighbor
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.col("src")).alias("component"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # propagate: each node takes min(own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(edges["src"].alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .unionAll(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        # scalar convergence check: any node whose label shrank this round?
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") < F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — the pair graph has a very long path; raise "
            "max_iterations if this is expected"
        )
    return labels.select("node", "component")


def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Assign every row of ``df`` a ``cluster_id``: the minimum id of
    its near-duplicate component (its own id when it has no
    duplicates), plus ``is_representative`` for the keep-one-per-
    cluster decision. Compose after any pair miner:

        pairs = minhash_near_dups(docs, "text", "doc_id")
        clustered = duplicate_clusters(docs, pairs, "doc_id")
        deduped = clustered.filter("is_representative")
    """
    comp = connected_components(pairs, id_a, id_b, max_iterations)
    out = df.join(comp, df[id_col] == comp["node"], "left").drop("node")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return out.withColumn("cluster_id", cluster).drop("component").withColumn(
        "is_representative", F.col(id_col) == F.col("cluster_id")
    )
