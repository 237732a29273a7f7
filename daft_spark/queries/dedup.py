"""Deduplication queries over the documents table — exact, normalized,
n-gram Jaccard (exact SQL oracle), MinHash LSH and SimHash (deterministic,
rows-only where the pipeline is not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    normalize_text,
    simhash_near_dups,
    verify_candidates_jaccard,
)
from daft_spark.queries import register


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@register(
    "dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text ORDER BY doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the smallest doc_id per identical text
    (deterministic representative — reference Distinct is arbitrary-row;
    ops/distinct.rs)."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


@register(
    "dedup_normalized",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM (SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents)
    GROUP BY norm ORDER BY doc_id
    """,
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup after canonical normalization (lower/strip-punct/collapse-ws)."""
    d = _docs(spark, sf_dir).withColumn("norm", normalize_text(F.col("text")))
    return (
        d.groupBy("norm")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT doc_id, source, list_distinct(
        string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS shingles
      FROM documents WHERE doc_id < {limit}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b
      ON a.doc_id < b.doc_id AND a.source = b.source
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.6
    ORDER BY id_a, id_b
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE.format(limit=300))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set (1-gram) Jaccard near-dup pairs, blocked by
    source — the brute-force baseline the LSH path approximates; oracle
    recomputes identical tokenization in DuckDB. (The synthetic corpus
    shares vocabulary but not word ORDER, so 3-gram jaccard is ~0 by
    construction — unigram overlap is the discriminative metric here;
    jaccard_pairs takes shingle_k for real corpora.)"""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    return jaccard_pairs(
        d, "text", "doc_id", threshold=0.6, shingle_k=1, block_cols=["source"]
    ).orderBy("id_a", "id_b")


@register("dedup_minhash_lsh", None)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16-band LSH candidates, exact-Jaccard verified at
    0.5 (reference minhash kernel: src/daft-minhash/, misc.py:428; the
    LSH pipeline is our scale extension). Deterministic (seeded
    xxhash64) but not SQL-expressible -> rows-only check."""
    d = _docs(spark, sf_dir)
    cands = minhash_lsh_candidates(d, "text", "doc_id", num_hashes=64, bands=16)
    return verify_candidates_jaccard(cands, d, "text", "doc_id", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


@register("dedup_simhash", None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dups, Hamming <= 6 via 4-block candidate join
    (reference simhash kernel: daft/functions/misc.py:462)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 1000)
    return simhash_near_dups(d, "text", "doc_id", max_hamming=6, blocks=4).orderBy(
        "id_a", "id_b"
    )


@register(
    "dedup_exact_keepmin",
    """
    SELECT d.doc_id, d.lang, d.source FROM documents d
    JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY lang, source) k
      ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_exact_keepmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact_dedup operator: deterministic representative row per
    (lang, source) key."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return exact_dedup(d, ["lang", "source"], "doc_id").select(
        "doc_id", "lang", "source"
    ).orderBy("doc_id")
