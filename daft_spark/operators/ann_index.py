"""Persisted ANN indexes — build once, search many times.

The in-memory ANN operators (operators/similarity.py: topk_cosine_ivf,
topk_cosine_ivfpq) retrain k-means and re-encode the corpus on every
call; at 100 TB the index build is the expensive pass and must be
amortized across searches. This module makes the index a first-class
on-disk artifact (reference surface: ``daft/ai`` embedding protocols +
``src/daft-functions/src/distance`` kernels — the reference computes
distances over stored embedding columns; the index layout here is the
standard IVF/IVFADC file organization of Jégou et al. 2011 re-expressed
as partitioned parquet):

``build_ivf_index(corpus, path)`` writes

- ``<path>/centroids/``  — (centroid_id, centroid, cnorm2): k rows.
- ``<path>/vectors/``    — (vec_id, embedding) PARTITIONED BY
  centroid_id (hive layout, one directory per inverted list).
- kind="ivfpq" adds ``<path>/codebooks/`` (subspace, code, centroid,
  cnorm2 — m*ksub rows) and ``<path>/codes/`` (vec_id, codes,
  recon_norm2) partitioned by centroid_id; ``vectors/`` is still
  written for the exact re-rank stage.
- ``<path>/_index_meta.json`` — kind/dim/num_centroids/m/ksub/seed.

``search_ivf_index(spark, path, queries, k, nprobe)`` reads ONLY:
the centroid table (k rows, broadcast), and the ``nprobe`` probed
inverted lists per query — the probe set is collected (bounded by
num_centroids, provably tiny) and pushed as a ``centroid_id IN (...)``
literal filter, so the scan is statically PARTITION-PRUNED: a 1000-list
index reads nprobe directories, never the corpus. No k-means stage
appears anywhere in the search plan (asserted in tests/test_plans.py).

Training is deterministic (hash-seeded init), so a search over a
stored index returns row-for-row the same result as the in-memory
operator with the same parameters — the equivalence the driver query
``sim_ann_ivf_stored`` checks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daft_spark.operators.similarity import (
    cosine_similarity,
    ivf_assign,
    ivf_train,
    pq_encode,
    pq_train,
)

_META = "_index_meta.json"


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 8,
    kind: str = "ivf",
    m: int = 16,
    ksub: int = 16,
    iters: int = 3,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> dict:
    """Train and persist an IVF ("ivf") or IVF+PQ ("ivfpq") index at
    ``path`` (parquet, overwrite). Returns the metadata dict."""
    if kind not in ("ivf", "ivfpq"):
        raise ValueError(f"kind must be 'ivf' or 'ivfpq', got {kind!r}")
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).first()
    if dim_row is None:
        raise ValueError("cannot build an index over an empty corpus")
    d = int(dim_row["d"])
    cents = ivf_train(
        corpus, num_centroids, corpus_id, corpus_vec, iters=iters, seed=seed
    ).persist()
    cents.withColumn(
        "cnorm2",
        F.aggregate(F.col("centroid"), F.lit(0.0), lambda a, x: a + x * x),
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    assigned = ivf_assign(
        corpus, cents, corpus_id=corpus_id, corpus_vec=corpus_vec
    ).select(corpus_id, corpus_vec, "centroid_id").persist()
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "vectors")
    )
    if kind == "ivfpq":
        books = pq_train(
            corpus, m=m, ksub=ksub, corpus_id=corpus_id,
            corpus_vec=corpus_vec, iters=iters, seed=seed,
        ).persist()
        books.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "codebooks")
        )
        codes = pq_encode(
            assigned, books, m=m, corpus_id=corpus_id, corpus_vec=corpus_vec
        ).join(assigned.select(corpus_id, "centroid_id"), corpus_id)
        codes.write.mode("overwrite").partitionBy("centroid_id").parquet(
            os.path.join(path, "codes")
        )
        books.unpersist()
    meta = {
        "kind": kind, "dim": d, "num_centroids": num_centroids,
        "m": m, "ksub": ksub, "iters": iters, "seed": seed,
        "id_col": corpus_id, "vec_col": corpus_vec,
    }
    assigned.unpersist()
    cents.unpersist()
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))
    return meta


def add_to_ivf_index(
    new_rows: DataFrame,
    path: str,
) -> dict:
    """INCREMENTAL append: assign a new batch to the EXISTING centroids
    (no retraining — the IVF update discipline: coarse quantizers are
    retrained offline, inverted lists grow online) and append to the
    partitioned vectors (and codes, for ivfpq, encoded with the stored
    codebooks). At 100 TB this is the only affordable ingest path:
    one broadcast-join assignment pass over the batch; existing lists
    untouched (parquet append into matching partitions). Returns
    {"appended": n}. Searches over the index immediately see the new
    rows — equivalence with a from-scratch search over the same
    centroids is tested in tests/test_ann_index.py."""
    meta = read_index_meta(path)
    corpus_id, corpus_vec = meta["id_col"], meta["vec_col"]
    spark = new_rows.sparkSession
    cents = spark.read.parquet(os.path.join(path, "centroids")).select(
        "centroid_id", "centroid"
    )
    assigned = ivf_assign(
        new_rows, cents, corpus_id=corpus_id, corpus_vec=corpus_vec
    ).select(corpus_id, corpus_vec, "centroid_id").persist()
    n = assigned.count()
    assigned.write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(path, "vectors")
    )
    if meta["kind"] == "ivfpq":
        books = spark.read.parquet(os.path.join(path, "codebooks")).select(
            "subspace", "code", "centroid", "cnorm2"
        )
        codes = pq_encode(
            assigned, books, m=meta["m"], corpus_id=corpus_id,
            corpus_vec=corpus_vec,
        ).join(assigned.select(corpus_id, "centroid_id"), corpus_id)
        codes.write.mode("append").partitionBy("centroid_id").parquet(
            os.path.join(path, "codes")
        )
    assigned.unpersist()
    return {"appended": n}


def read_index_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        return json.load(f)


def _probe_lists(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int,
    query_id: str,
    query_vec: str,
) -> tuple[DataFrame, list[int]]:
    """Rank stored centroids per query; return (probes df, distinct
    probed centroid ids). The collect is bounded by num_centroids.

    The ranking is read twice (the eager centroid-id collect here,
    then once more inside the returned search plan), so it is pinned
    with an eager ``localCheckpoint``: if the caller's queries frame
    is non-deterministic (sample/limit/rand upstream), a recompute
    could probe a centroid absent from the prune list built here and
    silently drop results (r13 ADVICE). localCheckpoint materializes
    ONE consistent snapshot — bounded by contract (probes is
    broadcast into the search join downstream, i.e. nqueries×nprobe
    rows) — and its blocks are released by the ContextCleaner when
    the frame is garbage-collected, unlike a persist() with no
    unpersist point."""
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    q = queries.select(F.col(query_id), F.col(query_vec))
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "__qcsim", cosine_similarity(F.col(query_vec), F.col("centroid"))
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("__qcsim").desc(), F.col("centroid_id")
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(F.col(query_id), F.col(query_vec), "centroid_id")
        .localCheckpoint(eager=True)
    )
    probed = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    return probes, probed


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 2,
    rerank: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Search a stored index: partition-pruned scan of the probed
    inverted lists only. kind="ivf" scores exact cosine on stored float
    vectors; kind="ivfpq" scores ADC over stored codes through
    per-query LUTs from the stored codebooks, then optionally re-ranks
    the ``rerank`` shortlist against stored float vectors."""
    meta = read_index_meta(path)
    corpus_id, corpus_vec = meta["id_col"], meta["vec_col"]
    probes, probed = _probe_lists(
        spark, path, queries, nprobe, query_id, query_vec
    )
    if not probed:
        raise ValueError("no queries to search")
    prune = F.col("centroid_id").isin(probed)
    if meta["kind"] == "ivf":
        vecs = spark.read.parquet(os.path.join(path, "vectors")).filter(prune)
        scored = vecs.join(F.broadcast(probes), "centroid_id").select(
            F.col(query_id),
            F.col(corpus_id),
            cosine_similarity(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
        )
        w = Window.partitionBy(query_id).orderBy(
            F.col("sim").desc(), F.col(corpus_id)
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    # ivfpq: ADC over stored codes via stored codebooks
    m = meta["m"]
    books = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(prune)
    sub = meta["dim"] // m
    qv = queries.select(
        F.col(query_id),
        F.transform(F.col(query_vec), lambda x: x.cast("double")).alias("__q"),
    )
    qex = qv.select(
        F.col(query_id), "__q",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col("__q"), s * sub + 1, sub),
            )
        ).alias("subspace", "qsub"),
    )
    luts = (
        qex.join(F.broadcast(books), "subspace")
        .withColumn(
            "__dot",
            F.aggregate(
                F.zip_with(F.col("qsub"), F.col("centroid"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .groupBy(query_id)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("subspace", "code", "__dot"))),
                lambda s: s.getField("__dot"),
            ).alias("__lut"),
            F.first(
                F.aggregate(F.col("__q"), F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias("__qnorm2"),
        )
    )
    probe_luts = probes.select(query_id, "centroid_id").join(luts, query_id)
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            # stride = the lut's true per-subspace code count (see
            # operators/similarity.py ADC note)
            lambda c, s: F.element_at(
                F.col("__lut"),
                (s * (F.size(F.col("__lut")) / F.lit(m)).cast("int") + c + 1)
                .cast("int"),
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = codes.join(F.broadcast(probe_luts), "centroid_id").select(
        F.col(query_id),
        F.col(corpus_id),
        F.when(
            (F.col("__qnorm2") > 0) & (F.col("recon_norm2") > 0),
            adc / F.sqrt(F.col("__qnorm2") * F.col("recon_norm2")),
        ).otherwise(F.lit(0.0)).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    if rerank is None:
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    if rerank < k:
        raise ValueError("rerank shortlist must be >= k")
    shortlist = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= rerank)
        .select(query_id, corpus_id)
    )
    vecs = spark.read.parquet(os.path.join(path, "vectors")).filter(prune)
    cand = vecs.join(shortlist, corpus_id).select(
        F.col(query_id), F.col(corpus_id), F.col(corpus_vec)
    )
    exact = cand.join(F.broadcast(qv), query_id).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(F.col(corpus_vec), F.col("__q")).alias("sim"),
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def index_refresh_report(
    spark: SparkSession,
    path: str,
    new_batch: DataFrame,
    min_centroid_cosine: float = 0.98,
    max_norm_drift: float = 0.01,
    max_growth: float = 2.0,
) -> DataFrame:
    """Per-INVERTED-LIST rebuild-or-reuse gate for a stored index:
    assigns ``new_batch`` to the STORED centroids (ivf_assign — the
    same routing a plain append would use), then runs
    similarity.index_refresh_decision between each list's stored
    vectors and its incoming vectors, keyed on centroid_id. A list
    whose incoming mass rotated away from the stored centroid
    ('centroid_rotation'), re-scaled ('norm_shift'), or dwarfs the
    stored list ('growth') flags rebuild=true — append there would
    mis-route future probes or unbalance the list. Lists receiving no
    new vectors produce no row (nothing to drift).

    Operationally: ``append_to_index`` when no row flags rebuild,
    ``build_ivf_index`` from scratch otherwise. Cost: one assign of
    the batch (broadcast centroids) + the drift audit's
    (centroid_id, dim)-keyed exchanges; stored vectors are scanned
    once and never collected."""
    from daft_spark.operators.similarity import (
        index_refresh_decision,
        ivf_assign,
    )

    meta = read_index_meta(path)
    corpus_id, corpus_vec = meta["id_col"], meta["vec_col"]
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    stored = spark.read.parquet(os.path.join(path, "vectors"))
    assigned = ivf_assign(
        new_batch, cents, corpus_id=corpus_id, corpus_vec=corpus_vec
    ).select(corpus_id, corpus_vec, "centroid_id")
    return index_refresh_decision(
        stored,
        assigned,
        vec_col=corpus_vec,
        by="centroid_id",
        min_centroid_cosine=min_centroid_cosine,
        max_norm_drift=max_norm_drift,
        max_growth=max_growth,
    )
