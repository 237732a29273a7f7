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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


# r15 (CC_LOOPPART_PROBE_r15.json): ~125k edges per loop partition —
# the measured knee on the sf10 resolve graph (990k symmetric edges:
# width 1 = 4.36 s, 4 = 1.66, 8 = 1.45, flat through 32), with tiny
# graphs unaffected (width stays 1 below 125k edges; the sf0.1 sweep
# shows widths 1-8 indistinguishable there anyway). The session
# setting is always the upper bound, so 100 TB-tuned sessions keep
# their full width on genuinely large edge sets.
_LOOP_EDGES_PER_PARTITION = 125_000


def _loop_partitions(n_edges: int, session_partitions: int) -> int:
    """Shuffle width for the propagation loop: scale with the edge
    count, never above the session's configured width."""
    return min(
        session_partitions, max(1, n_edges // _LOOP_EDGES_PER_PARTITION + 1)
    )


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
    # The edge count (needed for the partition clamp below) rides the
    # checkpoint materialization as an observed metric instead of a
    # separate count() job over the materialized blocks (r14: one job,
    # not two, per invocation — the same fusion as the loop's
    # convergence check).
    eobs = Observation()
    edges = (
        fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .observe(eobs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )

    # Size the loop's shuffles to the EDGE COUNT, not the session-wide
    # spark.sql.shuffle.partitions: the iterate frames are keys-only
    # (≤2 longs/row), so a dedup corpus whose session is tuned for
    # 100 TB scans would otherwise run every tiny propagation round as
    # a full-width shuffle — pure stage overhead (round-6 A/B at
    # sf0.1: 32 -> 4 partitions halved the loop wall time).
    #
    # Divisor retuned r15, 2M -> 125k edges/partition: at ~1M symmetric
    # edges (sf10 resolve graph) the 2M clamp forced the whole loop
    # through ONE serial task and the loop was the LARGEST stage of
    # both resolve rows (RESOLVE_DECOMP at sf10: cc 5.3-5.6 s of
    # 11.6-13.7 s). The width sweep on that graph reads min 4.36 s at
    # width 1, 2.39 at 2, 1.66 at 4, 1.45 at 8, flat 8-16-32
    # (probes/CC_LOOPPART_PROBE_r15.json, labels identical at every
    # width) — so ~125k edges/partition sits at the knee. Tiny graphs
    # are unaffected in both directions: below 125k edges the clamp
    # still yields width 1, and the same sweep at sf0.1 (498 edges)
    # shows widths 1-8 indistinguishable (0.55-0.64 s) because AQE
    # coalesces unused partitions anyway. At real scale the
    # min(session_sp, ...) cap governs unchanged. Restored in finally.
    spark = pairs.sparkSession
    ecnt = int(eobs.get["n"])
    session_sp = spark.conf.get("spark.sql.shuffle.partitions")
    loop_sp = _loop_partitions(ecnt, int(session_sp))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
        # NOT pre-hashed by the loop's join key: A/B'd r12 — an extra
        # repartition(loop_sp, "dst") + checkpoint before the loop read
        # 9.1-9.9 s vs 8.3-8.9 s for dedup_resolve at sf0.1 (paired,
        # idle box): with the loop width already clamped, the per-round
        # exchange is cheaper than the up-front re-materialization.
        labels = _propagate_to_fixpoint(edges, max_iterations)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", session_sp)
    return labels.select("node", "component")


def _propagate_to_fixpoint(edges: DataFrame, max_iterations: int) -> DataFrame:
    """Hash-to-min rounds over a materialized symmetric edge list."""
    # initial label: the node's own id joined with min neighbor
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.col("src")).alias("component"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # propagate: each node takes min(own label, neighbors' labels).
        # The node's OLD label rides along as a second agg column (it is
        # unique per node, so min() just carries it), and the convergence
        # check rides the checkpoint materialization as an OBSERVED
        # metric (r14): one Spark job per round instead of two — the
        # previous separate count() job re-scanned the materialized
        # labels frame, which at corpus scale is a full cached-frame
        # pass per round for a single boolean.
        comp_type = labels.schema["component"].dataType
        neighbor_labels = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(
                edges["src"].alias("node"),
                F.col("component"),
                F.lit(None).cast(comp_type).alias("old"),
            )
        )
        obs = Observation()
        new_labels = (
            labels.select("node", "component", F.col("component").alias("old"))
            .unionAll(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"), F.min("old").alias("old"))
            .observe(
                obs,
                F.sum(
                    (F.col("component") < F.col("old")).cast("long")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        # scalar convergence check: any node whose label shrank this round?
        changed = int(obs.get["changed"] or 0)
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — the pair graph has a very long path; raise "
            "max_iterations if this is expected"
        )
    return labels


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


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """PAGERANK as DataFrame aggregations — the canonical iterative
    graph algorithm expressed Spark-first (the companion of
    ``connected_components``; together they cover the two graph
    reductions a dedup/link-analysis pipeline needs). Fixed
    ``iters`` power iterations of rank = (1-d)/n + d * (in-flow +
    dangling/n), with dangling mass (nodes without out-edges)
    redistributed uniformly — rank stays a probability distribution
    (sums to 1) every round.

    A FIXED iteration count (the ``tol=None`` default) keeps the
    computation a pure deterministic function of the edge list, so a
    SQL oracle can replay it as chained CTEs. Production runs pass
    ``tol``: iteration stops early once the L1 rank delta drops below
    it (``iters`` becomes the cap), so converged graphs don't pay for
    the remaining fixed rounds — the delta check is one scalar
    aggregate over the (node, rank) frame per round, nothing extra
    shuffles (r11 verdict task 9). Pass a dict as ``stats`` to receive
    {"rounds": executed, "final_delta": L1 or None} back (tol mode
    observability; no effect on the result).

    100 TB posture: the edge list shuffles ONCE into (src, dst) form;
    each round is one join keyed on src + two map-side-combining
    aggregations (in-flow per dst, dangling scalar) with the rank
    frame's lineage truncated per round (localCheckpoint — the
    connected_components / ivf_train discipline against exponential
    plan growth). Node payloads never move; rows are (node, double)."""
    if iters < 1 or not (0.0 < damping < 1.0):
        raise ValueError("iters must be >= 1 and damping in (0, 1)")
    if tol is not None and tol <= 0.0:
        raise ValueError("tol must be > 0 when set")
    # edges/outdeg feed every round's join — persist or each iteration
    # re-runs the distinct shuffle (A/B: 3 rounds over the 6M-edge sf1
    # graph dropped ~40% wall time with the two persists).
    # NOT repartitioned by the join key: A/B'd r12 — pre-hashing the
    # cached edges by __s to let rounds reuse the layout was neutral at
    # sf1 (13.9 vs 13.0 s paired) and a 9% LOSS at sf10 (226 vs 208 s
    # paired, idle box): the up-front 117M-row string-key exchange +
    # cache pressure costs more than the per-round exchanges it saves.
    e = (
        edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg")).persist()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    if stats is not None:
        stats.update({"rounds": 0, "final_delta": None})
    for _ in range(iters):
        if stats is not None:
            stats["rounds"] += 1
        prev_ranks = ranks  # checkpointed (or the trivial init select)
        with_deg = ranks.join(
            outdeg.withColumnRenamed("__s", "node"), "node", "left"
        )
        dangling = with_deg.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("__deg").isNotNull()).select(
                    F.col("node").alias("__s"),
                    (F.col("rank") / F.col("__deg")).alias("__c"),
                ),
                "__s",
            )
            .groupBy("__d")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(
            contrib.withColumnRenamed("__d", "node"), "node", "left"
        ).crossJoin(F.broadcast(dangling)).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dm") / n)
            ).alias("rank"),
        )
        dobs = None
        if tol is not None:
            # L1 delta vs the PREVIOUS (checkpointed) rank frame — never
            # re-derive the round's with_deg lineage (sf10 probe:
            # re-deriving cost +50% per round). Since r14 the delta
            # rides the checkpoint materialization as an observed
            # metric (the connected_components fusion): the prev-rank
            # join runs inside the same job that writes the checkpoint
            # blocks instead of a separate two-scan job per round. The
            # inner join is total: both frames carry exactly one row
            # per node of the fixed node set.
            dobs = Observation()
            ranks = (
                ranks.join(
                    prev_ranks.select("node", F.col("rank").alias("__prev")),
                    "node",
                )
                .observe(
                    dobs,
                    F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("d"),
                )
                .select("node", "rank")
            )
        ranks = ranks.localCheckpoint(eager=True)
        if tol is not None:
            dval = dobs.get["d"]
            d = None if dval is None else float(dval)
            if stats is not None:
                stats["final_delta"] = d
            if d is not None and d < tol:
                break
    return ranks
