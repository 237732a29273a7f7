"""Similarity search over embedding columns (array<float>).

Extension beyond the reference's cosine_distance kernel
(reference: ``daft/functions/distance.py``,
``src/daft-functions/src/distance/``): brute-force top-k as the exact
baseline, plus two scale paths — random-hyperplane LSH bucketing and
IVF-style coarse quantization — so the 100 TB version probes a few
buckets instead of the full corpus.

All vector math runs as array higher-order functions
(``zip_with``/``aggregate``) in double precision — JVM-side, codegen,
no Python in the hot path.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosine similarity = dot/(|a||b|) (reference cosine_distance is
    1 - this — daft/functions/distance.py)."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return 1.0 - cosine_similarity(a, b)


def topk_cosine_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side is
    broadcast (queries << corpus is the normal shape), so the corpus is
    scanned once with NO shuffle of the vectors; only (query_id,
    corpus_id, sim) rows reach the top-k window."""
    from daft_spark.operators.spread import spread

    q = F.broadcast(queries.select(F.col(query_id), F.col(query_vec)))
    # spread(): the dot products are CPU-bound map work gated on the
    # corpus scan's split count; no-op on real multi-file corpora
    scored = spread(corpus).crossJoin(q).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes, generated from
    a counter-based hash (no RNG state, reproducible anywhere)."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = (seed * 1_000_003 + p * 10_007 + d) & 0xFFFFFFFF
            # xorshift scramble
            h ^= h >> 13
            h = (h * 0x5BD1E995) & 0xFFFFFFFF
            h ^= h >> 15
            # map to (-1, 1)
            row.append((h / 0x7FFFFFFF) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SRP) LSH bucket id: bit p = sign(vec . plane_p)."""
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        s = dot(vec, lit_plane)
        out = out + F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def _probe_buckets(bucket: Column, num_planes: int, multiprobe: int) -> Column:
    """Array of bucket ids within Hamming distance <= multiprobe of
    ``bucket`` (standard multi-probe LSH: the nearest-miss buckets differ
    in one or two sign bits)."""
    probes = [bucket]
    if multiprobe >= 1:
        probes += [bucket.bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(num_planes)]
    if multiprobe >= 2:
        probes += [
            bucket.bitwiseXOR(F.lit((1 << p) | (1 << q)).cast("long"))
            for p in range(num_planes)
            for q in range(p + 1, num_planes)
        ]
    return F.array(*probes)


def topk_cosine_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    num_planes: int = 12,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, compare only within the
    query's probed buckets. At scale this turns the full cross product
    into a per-bucket join (expected corpus * probes / 2^planes
    candidates per query).

    ``multiprobe`` = Hamming probe radius (0 = exact bucket only;
    1 adds the num_planes single-bit-flip buckets; 2 adds the two-bit
    flips). Probing explodes only the tiny broadcast QUERY side — each
    corpus vector still has exactly one bucket, so no candidate is
    scored twice. Raise num_planes for precision, multiprobe for recall.
    """
    planes = _hyperplanes(num_planes, dim, seed)
    cb = corpus.withColumn("__bucket", lsh_bucket(F.col(corpus_vec), planes))
    qb = queries.select(F.col(query_id), F.col(query_vec)).withColumn(
        "__bucket", lsh_bucket(F.col(query_vec), planes)
    )
    if multiprobe:
        qb = qb.withColumn(
            "__bucket",
            F.explode(_probe_buckets(F.col("__bucket"), num_planes, multiprobe)),
        )
    qb = F.broadcast(qb)
    scored = cb.join(qb, "__bucket").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF coarse assignment: attach the nearest centroid id to each
    corpus row (centroids broadcast; max_by picks argmax without a
    window shuffle beyond the corpus_id group). Persist partitioned by
    centroid_id and ANN search becomes partition-pruned."""
    c = F.broadcast(centroids.select(centroid_id, centroid_vec))
    scored = corpus.crossJoin(c).withColumn(
        "__csim", cosine_similarity(F.col(corpus_vec), F.col(centroid_vec))
    )
    best = scored.groupBy(corpus_id).agg(
        F.max_by(F.col(centroid_id), F.col("__csim")).alias(centroid_id)
    )
    return corpus.join(best, corpus_id)


def ivf_train(
    corpus: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF coarse-quantizer training: k-means (Lloyd) expressed as
    DataFrame aggregations — no vectors ever reach the driver.

    init: hash-sample k corpus vectors (smallest xxhash64(id, seed) —
    deterministic, one TakeOrdered pass). Each iteration: broadcast
    centroids, argmax-assign (``ivf_assign``), recompute element-wise
    means via posexplode + two hash aggs, reassemble with
    sort_array(collect_list(struct(i, x))). Returns
    (centroid_id int, centroid array<double>).
    """
    init = (
        corpus.select(
            F.col(corpus_vec).alias("centroid"),
            F.xxhash64(F.col(corpus_id).cast("string"), F.lit(seed)).alias("__h"),
        )
        .orderBy("__h")
        .limit(k)
    )
    cents = init.select(
        (F.row_number().over(Window.orderBy("__h")) - 1).alias("centroid_id"),
        F.transform("centroid", lambda x: x.cast("double")).alias("centroid"),
    )
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, corpus_id=corpus_id, corpus_vec=corpus_vec)
        ex = assigned.select(
            "centroid_id", F.posexplode(corpus_vec).alias("__i", "__xf")
        ).withColumn("__x", F.col("__xf").cast("double"))
        comp = ex.groupBy("centroid_id", "__i").agg(F.avg("__x").alias("__cx"))
        cents = comp.groupBy("centroid_id").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__i", "__cx"))),
                lambda s: s.getField("__cx"),
            ).alias("centroid")
        )
        # truncate the iterative lineage (k rows): without this, each
        # Lloyd round re-executes all previous rounds inside its plan —
        # the same exponential-lineage defect fixed in operators/
        # cluster.py connected_components
        cents = cents.localCheckpoint(eager=True)
    return cents


def topk_cosine_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    num_centroids: int = 8,
    nprobe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    iters: int = 3,
) -> DataFrame:
    """IVF ANN search: train k-means centroids, assign the corpus once,
    then score each query only against its ``nprobe`` nearest centroid
    partitions (rank centroids per query on the tiny broadcast centroid
    table). The 100 TB shape: corpus persisted partitioned by
    centroid_id -> partition-pruned probes."""
    # Persisted because the returned plan reads centroids twice; caches
    # are LRU-evictable — long-lived sessions reclaim with
    # spark.catalog.clearCache() (see dedup module docstring).
    cents = ivf_train(corpus, num_centroids, corpus_id, corpus_vec, iters=iters).persist()
    assigned = ivf_assign(corpus, cents, corpus_id=corpus_id, corpus_vec=corpus_vec)
    q = queries.select(F.col(query_id), F.col(query_vec))
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "__qcsim", cosine_similarity(F.col(query_vec), F.col("centroid"))
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("__qcsim").desc(), F.col("centroid_id"))
    probes = (
        qc.withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(F.col(query_id), F.col(query_vec), "centroid_id")
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pairs_above_threshold(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold, optionally blocked by a coarse
    key (e.g. an IVF centroid / cluster label) to avoid the full
    quadratic — the embedding near-dup primitive."""
    sel = [F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")]
    selb = [F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")]
    if block_col:
        sel.append(F.col(block_col).alias("ba"))
        selb.append(F.col(block_col).alias("bb"))
    a, b = df.select(*sel), df.select(*selb)
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        # the block equality makes this a real equi-join (SMJ/SHJ with
        # the id residual) — the scale path; never broadcast the corpus
        cond = cond & (F.col("ba") == F.col("bb"))
    else:
        # unblocked = bounded brute force by contract; without the hint
        # the pure non-equi join plans as CartesianProduct over
        # spread^2 partition pairs (see dedup.jaccard_pairs)
        b = F.broadcast(b)
    return (
        a.join(b, cond)
        .select("id_a", "id_b", cosine_similarity(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 30,
    bands: int = 10,
    seed: int = 42,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIR MINING at corpus scale — the
    vector analogue of the MinHash+LSH text miner (operators/dedup.py):
    banded sign-random-projection LSH generates candidates, exact cosine
    verifies them.

    Banding: the ``num_planes`` SRP sign bits split into ``bands`` keys
    of ``num_planes // bands`` bits; two vectors are candidates when ANY
    band key collides. With per-plane collision probability
    p = 1 - theta/pi, recall = 1 - (1 - p^bits_per_band)^bands — more
    bands raise recall, more bits per band cut candidate volume.

    100 TB posture (mirrors the text miner's shape):
    - Candidate generation shuffles only (band, key, id) triples —
      8-byte keys, never the vectors.
    - Vectors are joined back ONLY for candidate pairs, and the exact
      cosine runs JVM-side (zip_with/aggregate codegen).
    - Buckets larger than ``max_bucket_size`` (degenerate regions —
      e.g. the all-zeros corner) contribute STAR edges (bucket-min to
      each member) instead of all pairs, bounding any single bucket's
      cost at O(n). The star path is the text miner's
      ``_capped_bucket_pairs`` (operators/dedup.py) — a broadcast-
      representative join that never materializes a whole bucket in
      one aggregate row — and shares its documented recall caveat:
      members of an oversized bucket link through the representative
      only if the star pairs survive verification.
    """
    from daft_spark.operators.dedup import _capped_bucket_pairs

    per_band = num_planes // bands
    if per_band * bands != num_planes:
        raise ValueError("num_planes must be divisible by bands")
    planes = _hyperplanes(num_planes, dim, seed)
    mask = (1 << per_band) - 1
    sig = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).withColumn("__sig", lsh_bucket(F.col("__vec"), planes))
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("__sig"), b * per_band)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    # (band, key, id) triples only — the vector column never enters the
    # candidate shuffle.
    buckets = sig.select(
        "__id", F.explode(band_keys).alias("__bk")
    ).select("__id", F.col("__bk.band").alias("__band"), F.col("__bk.key").alias("__key"))

    cand = _capped_bucket_pairs(buckets, ["__band", "__key"], max_bucket_size)

    # NOTE (r15): a §3.4 semi-join prune of the vector side down to
    # candidate ids before the verify joins was tried and REVERTED with
    # the text miner's (documented NO at every locally measurable
    # configuration — decision record in operators/dedup.py).
    va = sig.select(F.col("__id").alias("id_a"), F.col("__vec").alias("__va"))
    vb = sig.select(F.col("__id").alias("id_b"), F.col("__vec").alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("__va"), F.col("__vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semdedup(
    df: DataFrame,
    k: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    seed: int = 42,
    max_iterations: int = 25,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means the
    embedding space, then inside each cluster treat cosine >=
    ``threshold`` pairs as semantic duplicates and keep ONE document
    per duplicate group. Returns one row per input:
    (id, centroid_id, cluster_id, is_representative) — filter on
    is_representative for the pruned corpus.

    Composition of the existing primitives, end-to-end deterministic:
    ``ivf_train`` (hash-seeded Lloyd as DataFrame aggs — no vectors on
    the driver) -> ``ivf_assign`` (broadcast centroids, argmax) ->
    ``pairs_above_threshold`` blocked by centroid (the quadratic is
    confined to cluster-sized blocks — exactly the paper's trick; its
    documented tradeoff, cross-cluster duplicates going unseen, is
    inherited) -> hash-to-min connected components. 100 TB posture:
    the only all-pairs work is per-cluster; everything else is
    broadcast joins and keys-only shuffles."""
    from daft_spark.operators.cluster import duplicate_clusters

    cents = ivf_train(
        df, k, corpus_id=id_col, corpus_vec=vec_col, iters=iters, seed=seed
    )
    assigned = ivf_assign(df, cents, corpus_id=id_col, corpus_vec=vec_col)
    pairs = pairs_above_threshold(
        assigned, threshold, id_col=id_col, vec_col=vec_col,
        block_col="centroid_id",
    ).select("id_a", "id_b")
    resolved = duplicate_clusters(
        assigned.select(id_col, "centroid_id"), pairs, id_col,
        max_iterations=max_iterations,
    )
    return resolved.select(
        id_col, "centroid_id", "cluster_id", "is_representative"
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Symmetric per-vector INT8 quantization — the standard
    memory-compression step before ANN indexing (4x smaller vectors;
    dot products run on int8 with one per-vector scale). scale =
    max|v| / 127 and q_i = floor(v_i / scale + 0.5) — floor(x + 0.5)
    instead of a library round() because its IEEE semantics are
    identical in every engine, which makes the quantized vectors
    exactly oracle-checkable. Zero vectors quantize to zeros with
    scale 0.

    Returns (id, *keep_cols, scale double, qvec array<int> with every
    element in [-127, 127]). Pure Column expressions (array_max/
    transform — one codegen projection, no shuffle, no UDF): a 100 TB
    embedding table quantizes at scan speed. ``keep_cols`` pass extra
    columns through the projection (e.g. an IVF centroid_id so the
    quantized index stays blocked without a re-join)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    q = F.when(
        maxabs > 0,
        F.transform(v, lambda x: F.floor(x / (maxabs / 127.0) + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        (F.when(maxabs > 0, maxabs / 127.0).otherwise(F.lit(0.0))).alias("scale"),
        q.alias("qvec"),
    )


def topk_cosine_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per query over INT8-QUANTIZED vectors — the
    serving half of ``quantize_embeddings`` (4x less memory per scan;
    the kernel is an integer dot product). Cosine over symmetric
    per-vector quantization cancels the scales exactly:
    cos(s_a·qa, s_b·qb) = <qa,qb> / (||qa||·||qb||), so the similarity
    is integer arithmetic plus one sqrt — no dequantization pass.

    Same plan shape as the exact brute force: quantized queries
    BROADCAST, corpus scanned once with no vector shuffle, top-k via
    one window over (query_id, sim) keys."""
    from daft_spark.operators.spread import spread

    qq = quantize_embeddings(queries, query_vec, query_id).select(
        F.col(query_id), F.col("qvec").alias("__qa")
    )
    qc = quantize_embeddings(spread(corpus), corpus_vec, corpus_id).select(
        F.col(corpus_id), F.col("qvec").alias("__qb")
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = qc.crossJoin(F.broadcast(qq)).select(
        F.col(query_id),
        F.col(corpus_id),
        (
            idot(F.col("__qa"), F.col("__qb")).cast("double")
            / F.sqrt(
                idot(F.col("__qa"), F.col("__qa")).cast("double")
                * idot(F.col("__qb"), F.col("__qb")).cast("double")
            )
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _int8_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over symmetric int8 quantized vectors: the per-vector
    scales cancel exactly — cos(s_a*qa, s_b*qb) = <qa,qb> /
    (||qa||*||qb||) — so the kernel is integer arithmetic plus one
    sqrt, no dequantization pass."""

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return idot(qa, qb).cast("double") / F.sqrt(
        idot(qa, qa).cast("double") * idot(qb, qb).cast("double")
    )


def topk_cosine_quantized_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    num_centroids: int = 8,
    nprobe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    iters: int = 3,
) -> DataFrame:
    """INT8-quantized IVF ANN — candidates generated BLOCKED, scored
    QUANTIZED (the composition the 100 TB retrieval path needs:
    ``topk_cosine_quantized`` alone is a brute-force serving scan;
    this bounds the scan to ``nprobe`` centroid partitions AND runs
    the integer kernel over 4x-smaller vectors).

    Index build (once, amortized across queries): k-means centroids
    trained in-DataFrame (``ivf_train``), corpus argmax-assigned to its
    nearest centroid (``ivf_assign``), then quantized — the stored
    index is (centroid_id, id, qvec int8). Search: each query ranks the
    tiny broadcast centroid table, keeps its ``nprobe`` nearest
    centroids, is quantized, and the (query, centroid) probe list —
    queries x nprobe rows — BROADCASTS into an equi-join on
    centroid_id. The corpus never shuffles and never meets a query
    outside its probed partitions: no crossJoin of the full corpus
    (plan-asserted in tests/test_plans.py). Scoring is the scale-free
    integer cosine (scales cancel; see ``_int8_cosine``). Top-k via one
    window over (query_id, sim, corpus_id) keys.

    Reference surface: daft/functions/ai/ (embedding search) +
    src/daft-functions/src/distance/cosine.rs (cosine kernels); the
    IVF/quantization composition is this engine's scale extension."""
    cents = ivf_train(
        corpus, num_centroids, corpus_id, corpus_vec, iters=iters
    ).persist()
    assigned = ivf_assign(corpus, cents, corpus_id=corpus_id, corpus_vec=corpus_vec)
    qcorpus = quantize_embeddings(
        assigned, corpus_vec, corpus_id, keep_cols=["centroid_id"]
    )
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
        .select(F.col(query_id), "centroid_id")
    )
    qq = quantize_embeddings(queries, query_vec, query_id).select(
        F.col(query_id), F.col("qvec").alias("__qa")
    )
    probe_q = probes.join(qq, query_id)  # queries x nprobe rows, tiny
    scored = qcorpus.join(F.broadcast(probe_q), "centroid_id").select(
        F.col(query_id),
        F.col(corpus_id),
        _int8_cosine(F.col("__qa"), F.col("qvec")).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """PRODUCT-QUANTIZATION codebook training (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): the vector is
    split into ``m`` contiguous subvectors and each subspace gets its
    own ``ksub``-centroid k-means codebook, so a d-dim float vector
    compresses to m small codes (m bytes at ksub<=256 — 32x smaller
    than float32 at d=64/m=8) while distances remain computable from
    codebooks alone.

    All m k-means runs execute as ONE DataFrame job per Lloyd round:
    the corpus explodes to (id, subspace, subvec) rows, assignment is
    a broadcast join + min_by over the m*ksub codebook table, and the
    recompute is two hash aggregations — no vectors on the driver,
    lineage checkpointed per round (the ivf_train discipline). Init:
    per subspace, the ksub rows with the smallest xxhash64(id, seed)
    — deterministic. Returns (subspace int, code int,
    centroid array<double>, cnorm2 double).
    """
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).first()
    d = int(dim_row["d"])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    ex = corpus.select(
        F.col(corpus_id).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.transform(
                    F.slice(F.col(corpus_vec), s * sub + 1, sub),
                    lambda x: x.cast("double"),
                ),
            )
        ).alias("subspace", "subvec"),
    )
    wsp = Window.partitionBy("subspace").orderBy("__h")
    books = (
        ex.withColumn(
            "__h", F.xxhash64(F.col("__id").cast("string"), F.lit(seed))
        )
        .withColumn("__rn", F.row_number().over(wsp))
        .filter(F.col("__rn") <= ksub)
        .select(
            "subspace", (F.col("__rn") - 1).alias("code"),
            F.col("subvec").alias("centroid"),
        )
    )
    def l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    for _ in range(iters):
        assigned = (
            ex.join(F.broadcast(books), "subspace")
            .withColumn("__d2", l2(F.col("subvec"), F.col("centroid")))
            .groupBy("__id", "subspace")
            .agg(
                F.min_by(
                    F.struct("code", "subvec"), F.struct("__d2", "code")
                ).alias("__best")
            )
            .select("__id", "subspace", F.col("__best.code").alias("code"),
                    F.col("__best.subvec").alias("subvec"))
        )
        comp = assigned.select(
            "subspace", "code", F.posexplode("subvec").alias("__i", "__x")
        ).groupBy("subspace", "code", "__i").agg(F.avg("__x").alias("__cx"))
        new_books = comp.groupBy("subspace", "code").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__i", "__cx"))),
                lambda s: s.getField("__cx"),
            ).alias("centroid")
        )
        # A code with zero members this round (duplicate init subvecs,
        # tiny corpora) keeps its previous centroid — the code set
        # stays exactly the contiguous 0..c-1 init set per subspace,
        # which the ADC LUT's positional indexing depends on
        # (r11 ADVICE: dropped codes shifted every later subspace's
        # slice of the flattened LUT).
        kept = books.select("subspace", "code", "centroid").join(
            new_books.select("subspace", "code"), ["subspace", "code"],
            "left_anti",
        )
        books = new_books.unionByName(kept).localCheckpoint(eager=True)
    return books.withColumn(
        "cnorm2",
        F.aggregate(F.col("centroid"), F.lit(0.0), lambda acc, x: acc + x * x),
    )


def pq_encode(
    corpus: DataFrame,
    books: DataFrame,
    m: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Encode each corpus vector to its ``m`` nearest sub-codewords.
    Returns (id, codes array<int> length m, recon_norm2 double —
    the squared norm of the reconstruction, precomputed so ADC search
    never touches the codebooks for the corpus side again).

    Shape: explode to subvectors, broadcast-join the m*ksub codebook,
    min_by per (id, subspace), reassemble in one collect_list — the
    index build is one pass over the corpus; the stored index is
    m ints + 1 double per vector."""
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).first()
    d = int(dim_row["d"])
    sub = d // m
    ex = corpus.select(
        F.col(corpus_id),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.transform(
                    F.slice(F.col(corpus_vec), s * sub + 1, sub),
                    lambda x: x.cast("double"),
                ),
            )
        ).alias("subspace", "subvec"),
    )
    def l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    best = (
        ex.join(F.broadcast(books), "subspace")
        .withColumn("__d2", l2(F.col("subvec"), F.col("centroid")))
        .groupBy(corpus_id, "subspace")
        .agg(
            F.min_by(
                F.struct("code", "cnorm2"), F.struct("__d2", "code")
            ).alias("__best")
        )
    )
    return best.groupBy(corpus_id).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("subspace", "__best"))),
            lambda s: s.getField("__best").getField("code"),
        ).alias("codes"),
        F.sum(F.col("__best.cnorm2")).alias("recon_norm2"),
    )


def topk_cosine_pq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    m: int = 8,
    ksub: int = 16,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    iters: int = 3,
    rerank: int | None = None,
) -> DataFrame:
    """PQ-ADC top-k cosine search (Jégou et al. 2011): corpus vectors
    live only as m-byte PQ codes; each query precomputes a lookup
    table lut[s][j] = <q_s, codeword_{s,j}> (m*ksub doubles — tiny),
    and the asymmetric distance is a pure table-lookup sum:
    cos(q, x̂) = sum_s lut[s][codes[s]] / sqrt(||q||^2 * ||x̂||^2),
    with ||x̂||^2 precomputed at encode time.

    100 TB shape: the index build (codebooks + codes) is one corpus
    pass amortized across queries; search broadcasts the per-query
    LUTs (queries x m*ksub doubles), the corpus scan reads 8-byte
    codes instead of float vectors (32x less IO at d=64), scoring is
    in-row element_at arithmetic — no crossJoin of float vectors, no
    corpus shuffle, top-k via the standard (query_id, sim) window.

    ``rerank=R`` adds the production second stage (IVFADC-style
    shortlist + exact re-rank): the ADC scan keeps the top R
    candidates per query, ONLY those R*queries rows join back to the
    float vectors (a keys-only semi-join of the corpus — the full
    float table is still never broadcast or crossed), and the final
    top-k is exact cosine. This is how PQ reaches exact-level recall
    while the bulk scan still reads only codes.
    Reference surface: src/daft-functions/src/distance/cosine.rs ships
    the exact kernel; PQ is this engine's scale extension on top."""
    from daft_spark.operators.spread import spread

    books = pq_train(
        corpus, m=m, ksub=ksub, corpus_id=corpus_id, corpus_vec=corpus_vec,
        iters=iters,
    ).persist()
    codes = pq_encode(
        spread(corpus), books, m=m, corpus_id=corpus_id, corpus_vec=corpus_vec
    )
    qv = queries.select(
        F.col(query_id),
        F.transform(F.col(query_vec), lambda x: x.cast("double")).alias("__q"),
    )
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).first()
    sub = int(dim_row["d"]) // m
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
                F.zip_with(
                    F.col("qsub"), F.col("centroid"), lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .groupBy(query_id)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("subspace", "code", "__dot"))
                ),
                lambda s: s.getField("__dot"),
            ).alias("__lut"),
            F.first(
                F.aggregate(
                    F.col("__q"), F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("__qnorm2"),
        )
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            # index by the LUT's ACTUAL per-subspace stride, not the
            # requested ksub — on corpora smaller than ksub the trained
            # codebook has min(ksub, n) codes per subspace (uniform and
            # contiguous by construction; pq_train preserves empty
            # codes' centroids), so size(lut)/m is the true stride.
            lambda c, s: F.element_at(
                F.col("__lut"),
                (s * (F.size(F.col("__lut")) / F.lit(m)).cast("int") + c + 1)
                .cast("int"),
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = codes.crossJoin(F.broadcast(luts)).select(
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
    cand = corpus.join(shortlist, corpus_id).select(
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


def binarize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """BINARY QUANTIZATION: each dimension collapses to its sign bit,
    packed 63 dims per BIGINT word (63, not 64 — setting bit 63 would
    overflow the signed long under ANSI arithmetic; the extra word per
    4k dims is noise). A 64-dim float32 vector becomes two longs
    (256 -> 16 bytes). The standard first-stage filter of modern
    vector stores: Hamming distance on sign bits approximates angular
    distance (Charikar 2002 — each sign bit is an SRP hash against a
    coordinate plane). Returns (id, bits array<long>).

    Pure Column expressions: one aggregate over a 63-element slice per
    word — bit math inside codegen, no UDF, a 100 TB embedding table
    binarizes at scan speed."""
    d_row = df.select(F.size(vec_col).alias("d")).first()
    d = int(d_row["d"])
    nwords = (d + 62) // 63
    v = F.col(vec_col)

    def word(w):
        sl = F.slice(v, w * 63 + 1, 63)
        return F.aggregate(
            F.zip_with(
                sl,
                F.sequence(F.lit(0), F.size(sl) - 1),
                lambda x, i: F.when(
                    x > 0, F.pow(F.lit(2.0), i).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, b: acc + b,
        )

    words = F.array(*[word(w) for w in range(nwords)])
    return df.select(F.col(id_col), words.alias("bits"))


def topk_cosine_binary(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    rerank: int = 100,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Two-stage binary ANN: the bulk scan ranks the corpus by HAMMING
    distance over sign-bit words (popcount of XOR — integer ops on
    8-byte words, the cheapest possible first pass), keeps the top
    ``rerank`` candidates per query, and ONLY those rows join back to
    float vectors for the exact cosine top-k. The same
    shortlist+rerank shape as ``topk_cosine_pq`` — binary trades more
    first-stage error for a 16x smaller index and pure popcount math.

    Scale: binarized queries BROADCAST; the corpus scan reads packed
    words, never floats; the rerank join is a keys-only semi-join of
    the corpus. Ties (equal Hamming) break on corpus id — fully
    deterministic."""
    from daft_spark.operators.spread import spread

    if rerank < k:
        raise ValueError("rerank shortlist must be >= k")
    qb = binarize_embeddings(queries, query_vec, query_id).select(
        F.col(query_id), F.col("bits").alias("__qa")
    )
    cb = binarize_embeddings(spread(corpus), corpus_vec, corpus_id).select(
        F.col(corpus_id), F.col("bits").alias("__qb")
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("__qa"), F.col("__qb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = cb.crossJoin(F.broadcast(qb)).select(
        F.col(query_id), F.col(corpus_id), hamming.alias("__ham")
    )
    wham = Window.partitionBy(query_id).orderBy(
        F.col("__ham").asc(), F.col(corpus_id)
    )
    shortlist = (
        scored.withColumn("__r", F.row_number().over(wham))
        .filter(F.col("__r") <= rerank)
        .select(query_id, corpus_id)
    )
    qv = queries.select(
        F.col(query_id),
        F.transform(F.col(query_vec), lambda x: x.cast("double")).alias("__q"),
    )
    cand = corpus.join(shortlist, corpus_id).select(
        F.col(query_id), F.col(corpus_id), F.col(corpus_vec)
    )
    exact = cand.join(F.broadcast(qv), query_id).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(F.col(corpus_vec), F.col("__q")).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id))
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def topk_cosine_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    num_centroids: int = 8,
    nprobe: int = 2,
    m: int = 16,
    ksub: int = 16,
    rerank: int | None = 100,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    iters: int = 3,
) -> DataFrame:
    """IVF-blocked PQ search — the IVFADC composition (Jégou et al.
    2011 §IV) in its Spark shape: candidates come BLOCKED from the IVF
    coarse quantizer (each query meets only its ``nprobe`` centroid
    partitions — never the whole corpus), scoring reads PQ CODES (m
    bytes/vector) through per-query broadcast LUTs, and the optional
    exact re-rank touches float vectors for shortlist rows only. The
    production retrieval stack in one operator: the index is
    (centroid_id, id, codes, recon_norm2) — partition-pruned, 16x
    compressed, scan-only.

    (Codebooks train on raw vectors globally rather than per-centroid
    residuals — the flat-ADC variant; residual codebooks are a
    recall/complexity trade the corpus-scale plumbing doesn't change.)
    """
    from daft_spark.operators.spread import spread

    cents = ivf_train(
        corpus, num_centroids, corpus_id, corpus_vec, iters=iters
    ).persist()
    assigned = ivf_assign(corpus, cents, corpus_id=corpus_id, corpus_vec=corpus_vec)
    books = pq_train(
        corpus, m=m, ksub=ksub, corpus_id=corpus_id, corpus_vec=corpus_vec,
        iters=iters,
    ).persist()
    codes = pq_encode(
        spread(assigned.select(corpus_id, corpus_vec, "centroid_id")),
        books, m=m, corpus_id=corpus_id, corpus_vec=corpus_vec,
    ).join(assigned.select(corpus_id, "centroid_id"), corpus_id)
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
        .select(F.col(query_id), "centroid_id")
    )
    qv = queries.select(
        F.col(query_id),
        F.transform(F.col(query_vec), lambda x: x.cast("double")).alias("__q"),
    )
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).first()
    sub = int(dim_row["d"]) // m
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
    probe_luts = probes.join(luts, query_id)  # queries x nprobe rows, tiny
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            # index by the LUT's ACTUAL per-subspace stride, not the
            # requested ksub — on corpora smaller than ksub the trained
            # codebook has min(ksub, n) codes per subspace (uniform and
            # contiguous by construction; pq_train preserves empty
            # codes' centroids), so size(lut)/m is the true stride.
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
    cand = corpus.join(shortlist, corpus_id).select(
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


def embedding_drift_audit(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    by: str = "label",
) -> DataFrame:
    """EMBEDDING-DISTRIBUTION drift audit between two corpus slices
    (snapshots, encoder versions, shards): per ``by`` group, the
    cosine between the two slices' MEAN vectors plus each slice's
    count and mean L2 norm — centroid cosine near 1 and stable norms
    mean the space didn't move; a re-trained or mis-versioned encoder
    shows up as centroid rotation/norm shift long before downstream
    recall degrades. The ANN-index companion check: a stored IVF index
    (operators/ann_index.py) keys on centroid geometry, so this is the
    gate before reusing an index across ingest batches.

    Shape: each side explodes to (group, dim, value) keys-only rows —
    the exchange carries group+dim keys, never vectors — aggregates a
    d-width centroid table per side, and the drift math is a (group,
    dim)-keyed equi-join + one scalar aggregation per group. Norms are
    in-row F.aggregate (codegen). At 100 TB each side is one scan +
    one groups×d-sized exchange."""

    def _centroid(df: DataFrame, tag: str) -> DataFrame:
        ex = df.select(
            F.col(by).alias("__g"),
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("__d", "__v"),
        )
        return ex.groupBy("__g", "__d").agg(F.avg("__v").alias(f"__c{tag}"))

    def _stats(df: DataFrame, tag: str) -> DataFrame:
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        )
        return df.select(F.col(by).alias("__g"), norm.alias("__n")).groupBy(
            "__g"
        ).agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.avg("__n").alias(f"__mn{tag}"),
        )

    joined = _centroid(df_a, "a").join(_centroid(df_b, "b"), ["__g", "__d"])
    drift = joined.groupBy("__g").agg(
        (
            F.sum(F.col("__ca") * F.col("__cb"))
            / (
                F.sqrt(F.sum(F.col("__ca") * F.col("__ca")))
                * F.sqrt(F.sum(F.col("__cb") * F.col("__cb")))
            )
        ).alias("__cos")
    )
    return (
        _stats(df_a, "a")
        .join(_stats(df_b, "b"), "__g")
        .join(drift, "__g")
        .select(
            F.col("__g").alias(by),
            "n_a",
            "n_b",
            F.round("__cos", 6).alias("centroid_cosine"),
            F.round("__mna", 6).alias("mean_norm_a"),
            F.round("__mnb", 6).alias("mean_norm_b"),
        )
    )


def index_refresh_decision(
    df_baseline: DataFrame,
    df_current: DataFrame,
    vec_col: str = "embedding",
    by: str = "label",
    min_centroid_cosine: float = 0.98,
    max_norm_drift: float = 0.01,
    max_growth: float = 2.0,
) -> DataFrame:
    """AUTO REBUILD-OR-REUSE gate for a stored ANN index
    (operators/ann_index.py): composes ``embedding_drift_audit``
    between the indexed slice and a new ingest batch and turns the
    per-group drift statistics into an explicit, auditable decision —
    the operational question behind the drift audit ("did the space
    move enough that the stored centroids are stale?"). Per ``by``
    group returns the audit columns plus

      norm_ratio    — mean_norm_current / mean_norm_baseline
      growth_ratio  — n_current / n_baseline
      rebuild       — true if ANY trigger fired
      reason        — comma-joined fired triggers ('centroid_rotation',
                      'norm_shift', 'growth'), or 'none'

    Triggers: centroid cosine below ``min_centroid_cosine`` (the
    space rotated — stored IVF centroids mis-route probes);
    |norm_ratio - 1| above ``max_norm_drift`` (encoder re-scale —
    ADC/int8 quantization ranges stale); growth_ratio above
    ``max_growth`` (the batch dwarfs the index — list sizes skew even
    without drift; append would unbalance the inverted lists).

    All comparisons run on the audit's ROUND-6 values, so an external
    replay (the DuckDB oracle) deriving the booleans from identically
    rounded numbers decides bit-identically — no threshold boundary
    flips between engines. Cost: the drift audit's (group, dim)-keyed
    exchanges plus a width-constant projection; nothing new shuffles.
    """
    audit = embedding_drift_audit(df_baseline, df_current, vec_col, by)
    norm_ratio = F.round(F.col("mean_norm_b") / F.col("mean_norm_a"), 6)
    growth = F.round(F.col("n_b") / F.col("n_a"), 6)
    d = audit.select(
        F.col(by),
        F.col("n_a").alias("n_baseline"),
        F.col("n_b").alias("n_current"),
        "centroid_cosine",
        norm_ratio.alias("norm_ratio"),
        growth.alias("growth_ratio"),
    )
    rotated = F.col("centroid_cosine") < F.lit(min_centroid_cosine)
    shifted = F.abs(F.col("norm_ratio") - 1.0) > F.lit(max_norm_drift)
    grown = F.col("growth_ratio") > F.lit(max_growth)
    reason = F.concat_ws(
        ",",
        F.when(rotated, F.lit("centroid_rotation")),
        F.when(shifted, F.lit("norm_shift")),
        F.when(grown, F.lit("growth")),
    )
    return d.select(
        "*",
        (rotated | shifted | grown).alias("rebuild"),
        F.when(reason == "", F.lit("none")).otherwise(reason).alias("reason"),
    )


def semdedup_sweep(
    df: DataFrame,
    thresholds: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    mine_threshold: float | None = None,
) -> DataFrame:
    """SemDedup THRESHOLD-SWEEP audit: for each candidate cosine
    threshold, how much of the corpus embedding-dedup would remove —
    the dial you turn BEFORE committing a 100 TB semantic dedup run
    (Abbas et al. 2023 pick the threshold from exactly this curve).
    A vector is removed at threshold t when any LOWER-id vector in its
    block has cosine >= t (the min-id keeper used across the dedup
    family). Returns one row per threshold:
    (threshold, n_total, n_removed, n_kept, removal_rate).

    Shape: ONE pair-mining pass at the loosest threshold (blocked
    equi-join via pairs_above_threshold — never all-pairs when
    block_col is given), one groupBy(id) max-similarity aggregation,
    then a single-row conditional aggregate unpivoted with stack — no
    per-threshold rescans. Comparisons run on ROUND-6 similarities so
    an external replay decides identically; ``mine_threshold``
    (default: loosest sweep threshold - 0.05) stays strictly below the
    sweep so the raw-vs-rounded boundary can't drop a pair the sweep
    would count."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = sorted(float(t) for t in thresholds)
    mine = mine_threshold if mine_threshold is not None else ts[0] - 0.05
    pairs = pairs_above_threshold(
        df, mine, id_col=id_col, vec_col=vec_col, block_col=block_col
    )
    nn = pairs.groupBy("id_b").agg(F.round(F.max("sim"), 6).alias("__nn"))
    counts = nn.agg(
        *[
            F.coalesce(
                F.sum((F.col("__nn") >= F.lit(t)).cast("long")), F.lit(0)
            ).alias(f"__r{i}")
            for i, t in enumerate(ts)
        ]
    )
    tot = df.agg(F.count(F.lit(1)).alias("__n"))
    stacked = ", ".join(
        f"CAST({t} AS DOUBLE), __r{i}" for i, t in enumerate(ts)
    )
    row = counts.crossJoin(F.broadcast(tot))
    out = row.selectExpr(
        "__n",
        f"stack({len(ts)}, {stacked}) as (threshold, n_removed)",
    )
    return out.select(
        "threshold",
        F.col("__n").alias("n_total"),
        "n_removed",
        (F.col("__n") - F.col("n_removed")).alias("n_kept"),
        F.round(F.col("n_removed") / F.col("__n").cast("double"), 6).alias(
            "removal_rate"
        ),
    )


def quantization_distortion_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    by: str = "label",
) -> DataFrame:
    """INT8-quantization DISTORTION audit: per-``by`` slice, how much
    cosine geometry the symmetric int8 quantization
    (quantize_embeddings) gives up — (n_vecs, avg_fidelity,
    min_fidelity, max_abs_err), fidelity = cos(original, quantized)
    (the per-vector scale cancels, so this is exactly the similarity
    error an int8 ANN index serves). The dial before committing a
    100 TB corpus to int8 storage: avg says the typical query is
    safe, MIN says the worst vector is, max_abs_err bounds the
    per-element reconstruction error (<= scale/2 by construction).
    Zero vectors carry no geometry and are excluded.

    Shape: one codegen projection per vector (quantize + three dot
    products via zip_with/aggregate — JVM-side, no UDF, no shuffle of
    vectors), then a keys-only groupBy(by) rollup. Fidelities are
    round-6 BEFORE aggregation so an external replay decides min/avg
    identically."""
    q = quantize_embeddings(df, vec_col, id_col, keep_cols=[by, vec_col])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qd = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    fid = F.round(
        dot(v, qd) / (F.sqrt(dot(v, v)) * F.sqrt(dot(qd, qd))), 6
    )
    err = F.round(
        F.array_max(
            F.zip_with(
                v, qd, lambda x, y: F.abs(x - y * F.col("scale"))
            )
        ),
        6,
    )
    m = q.filter(F.col("scale") > 0).select(
        F.col(by), fid.alias("__fid"), err.alias("__err")
    )
    return m.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("__fid"), 6).alias("avg_fidelity"),
        F.min("__fid").alias("min_fidelity"),
        F.round(F.max("__err"), 6).alias("max_abs_err"),
    )
