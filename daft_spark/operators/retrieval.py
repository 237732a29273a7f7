"""Lexical retrieval — BM25 scoring and top-k search over a document
corpus. The sparse half of a RAG retrieval stack (the dense half is
operators/similarity.py); also the standard relevance filter when
mining a crawl for query-like documents.

Engine mapping: everything is pure Column expressions. Query terms are
plan-time literals (a query has a handful of terms), so per-term
term-frequencies are in-row array_size(filter(tokens, = term)) — no
explode, no shuffle of token rows. The corpus statistics BM25 needs
(N, avgdl, per-term document frequencies) come from ONE global
aggregation whose partials are a fixed-width row (2 + n_terms
counters), broadcast back onto the corpus. Scoring + top-k is a
projection + TakeOrderedAndProject: a 100 TB corpus is scored in one
scan with two tiny exchanges of aggregated partials.

Reference surface: the reference has no BM25; this extends its text
family per SURVEY.md §2's pipeline column. Formula: Robertson/Lucene
BM25 with the +1 idf smoothing (idf = ln(1 + (N - df + 0.5) /
(df + 0.5))), k1/b defaults 1.2/0.75.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_score", "bm25_topk"]


def _tf(toks, term: str):
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query_terms``. Returns
    (id, doc_len int, score double, n_hit_terms int) with score
    rounded to 6 decimals (cross-engine float convention). Documents
    matching no term score 0.0 and are kept (filter downstream)."""
    from daft_spark.functions.text import words

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    toks = words(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("__t")).alias("avgdl"),
        *[
            F.sum((_tf(F.col("__t"), t) > 0).cast("long")).alias(f"__df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    dl = F.size("__t").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl / F.col("avgdl")
    )
    score = None
    hits = None
    for i, t in enumerate(terms):
        tf = _tf(F.col("__t"), t).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"__df_{i}") + F.lit(0.5))
            / (F.col(f"__df_{i}") + F.lit(0.5))
        )
        part = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        hit = (tf > 0).cast("int")
        score = part if score is None else score + part
        hits = hit if hits is None else hits + hit
    return scored.select(
        F.col(id_col),
        F.size("__t").cast("int").alias("doc_len"),
        F.round(score, 6).alias("score"),
        hits.cast("int").alias("n_hit_terms"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score, (score desc, id asc) tiebreak —
    orderBy+limit plans as TakeOrderedAndProject (plan-asserted in
    tests/test_plans.py), never a global sort."""
    s = bm25_score(df, query_terms, text_col, id_col, k1, b)
    return (
        s.filter(F.col("n_hit_terms") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
