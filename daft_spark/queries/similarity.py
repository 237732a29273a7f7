"""Similarity-search queries over the embeddings table (array<float>,
dim 64): exact brute-force top-k (DuckDB list_cosine_similarity oracle),
threshold pair mining, SRP-LSH approximate top-k with recall check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.operators.similarity import (
    cosine_similarity,
    pairs_above_threshold,
    topk_cosine_bruteforce,
    topk_cosine_lsh,
)
from daft_spark.queries import register


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _queries_corpus(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return queries, emb


@register(
    "sim_topk_cosine",
    """
    SELECT q.vec_id AS query_id, c.vec_id,
           list_cosine_similarity(q.embedding, c.embedding) AS sim,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS INT) AS rank
    FROM embeddings q CROSS JOIN embeddings c
    WHERE q.vec_id < 8
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 8 query vectors — brute force,
    query side broadcast, corpus scanned once (no vector shuffle)."""
    queries, corpus = _queries_corpus(spark, sf_dir)
    return topk_cosine_bruteforce(queries, corpus, k=5).select(
        "query_id", "vec_id", "sim", "rank"
    ).orderBy("query_id", "rank")


@register(
    "sim_pairs_threshold",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_cosine_similarity(a.embedding, b.embedding) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < b.vec_id AND a.label = b.label
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
    ORDER BY id_a, id_b
    """,
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup mining: pairs with cosine >= 0.3, blocked by
    the label column (IVF-style blocking bounds the quadratic)."""
    emb = _emb(spark, sf_dir)
    return pairs_above_threshold(
        emb, threshold=0.3, id_col="vec_id", vec_col="embedding", block_col="label"
    ).orderBy("id_a", "id_b")


@register(
    "sim_centroid_cosine",
    """
    WITH ex AS (
      SELECT vec_id, label,
             CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings),
    cent AS (SELECT label, i, avg(x) AS cx FROM ex GROUP BY label, i)
    SELECT ex.vec_id,
           sum(ex.x * cent.cx)
             / (sqrt(sum(ex.x * ex.x)) * sqrt(sum(cent.cx * cent.cx))) AS sim_c
    FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
    GROUP BY ex.vec_id ORDER BY ex.vec_id
    """,
)
def sim_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: element-wise mean centroid per label, then
    each vector's cosine to its own centroid (posexplode + two hash
    aggs — vectors never collected to the driver)."""
    emb = _emb(spark, sf_dir)
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "xf")
    ).withColumn("x", F.col("xf").cast("double"))
    cent = ex.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    joined = ex.join(cent, ["label", "i"])
    return (
        joined.groupBy("vec_id")
        .agg(
            (
                F.sum(F.col("x") * F.col("cx"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("cx") * F.col("cx")))
                )
            ).alias("sim_c")
        )
        .orderBy("vec_id")
    )


@register("sim_ann_lsh_recall", None)
def sim_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k vs exact top-k: per-query recall@5.
    Deterministic (counter-hash hyperplanes) but engine-specific ->
    rows-only. At scale the LSH path replaces the full cross join with
    per-bucket joins."""
    queries, corpus = _queries_corpus(spark, sf_dir)
    exact = topk_cosine_bruteforce(queries, corpus, k=5).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    approx = topk_cosine_lsh(queries, corpus, k=5, dim=64, num_planes=4).select(
        "query_id", F.col("vec_id").alias("approx_id")
    )
    hit = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (F.col("exact_id") == F.col("approx_id")),
        "left",
    ).select(exact.query_id.alias("qid"), F.col("approx_id").isNotNull().cast("int").alias("hit"))
    return (
        hit.groupBy("qid")
        .agg((F.sum("hit") / F.count(F.lit(1))).alias("recall_at_5"))
        .orderBy("qid")
    )
