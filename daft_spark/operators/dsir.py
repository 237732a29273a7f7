"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
distribution looks like a TARGET domain. The standard recipe for
steering a 100 TB pretraining crawl toward a high-quality target (e.g.
Wikipedia-like text) without training a classifier.

Method (paper §3, hashed n-gram features): unigrams + bigrams hash
into ``n_buckets`` buckets; bucket unigram-counts fit two smoothed
multinomials — p from the target corpus, q from the raw corpus; each
raw document's log importance weight is

    log w(doc) = sum over its grams of  log p(bucket) - log q(bucket)

and selection takes the top-k by ``log w + Gumbel noise`` (Gumbel
top-k == sampling without replacement proportionally to w).

Engine mapping (all deterministic, exactly DuckDB-replayable):
- grams + buckets are built IN-ROW (regex tokens, zip-shifted bigrams,
  52-bit md5 fraction -> floor(x * n_buckets) — the engine's
  cross-engine hash convention, operators/sampling.py module doc).
- each corpus needs ONE keys-only aggregation: explode (bucket) ->
  map-side-combined count. Shuffle volume = n_buckets rows per
  partition, independent of corpus size.
- the ratio table (n_buckets rows) BROADCASTS into an equi-join
  against the exploded raw grams; per-doc summation is a second
  keys-only groupBy whose map-side combine collapses each document to
  one row before the exchange. No text ever shuffles; no UDF.
- Gumbel noise is the md5 fraction pushed through -ln(-ln(u)) — same
  convention, replayable.

Reference surface: the reference has no DSIR; this extends its
text-curation family (daft/functions/str.py tokenization surface) the
way SURVEY.md §2's pipeline column prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dsir_log_weights", "dsir_select"]


def _gram_buckets(text_col: str, n_buckets: int, salt: str):
    """In-row array of hashed (unigram + bigram) bucket ids for a
    document: tokens via the engine's word regex, bigrams via a
    zip_with against the shifted token array, bucket = floor(52-bit
    md5 fraction * n_buckets)."""
    from daft_spark.functions.text import words

    toks = words(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.floor(
            F.conv(F.substring(F.md5(F.concat(g, F.lit(salt))), 1, 13), 16, 10)
            .cast("double")
            / F.lit(float(1 << 52))
            * F.lit(n_buckets)
        ).cast("int"),
    )


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int, salt: str):
    """(bucket, cnt) for one corpus — explode keys-only, map-side
    combine collapses to <= n_buckets rows per partition."""
    b = df.select(
        F.explode(_gram_buckets(text_col, n_buckets, salt)).alias("bucket")
    )
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1e-2,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weight of every ``raw`` row
    toward the ``target`` corpus distribution. Returns
    (id, n_grams bigint, log_weight double). alpha is the additive
    smoothing on both multinomials: p(b) = (cnt_p(b) + alpha) /
    (N_p + alpha * n_buckets) — buckets unseen in either corpus still
    get finite log ratios."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # p and q each feed the totals aggregate AND the ratio join, so
    # Catalyst re-runs the corpus scan + gram explode + md5 bucketing
    # under every consumer (three passes over ``raw``, two over
    # ``target``). Persisting the two <= n_buckets-row count frames
    # (the r14 candidate fix) was interleave-A/B'd on a quiet host and
    # REJECTED: the cache barrier serializes branches that otherwise
    # run concurrently and measured neutral-to-slower at sf0.1 AND sf1
    # on 32 AND 8 cores (sf0.1 medians 2.95 s no-persist vs 3.62 s
    # persisted; probes/LM_DSIR_PERSIST_AB_r14.json). r15 CLOSED it
    # permanently on this hardware (r14 verdict task 5): under
    # saturated cores — sf1/local[4] and sf10/local[8], where pipelining
    # across idle cores cannot mask the saved bucket-count pass — the
    # persist still only TIES (sf10/8c old med 31.0 s vs 30.9 s, mins
    # identical at 30.9; same probe JSON, keys spark_graft_sf1_c4 /
    # spark_graft_sf10_c8). No configuration shows a win, so the
    # simpler no-persist formulation stands; only a network-bound
    # multi-node cluster measurement could justify re-adding.
    p = _bucket_counts(target, text_col, n_buckets, salt)
    q = _bucket_counts(raw, text_col, n_buckets, salt)
    totals = (
        p.agg(F.sum("cnt").alias("np"))
        .crossJoin(q.agg(F.sum("cnt").alias("nq")))
    )
    ratio = (
        q.join(p.withColumnRenamed("cnt", "cnt_p"), "bucket", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_p"), F.lit(0)) + F.lit(alpha))
                    / (F.col("np") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                    / (F.col("nq") + F.lit(alpha * n_buckets))
                )
            ).alias("log_ratio"),
        )
    )
    grams = raw.select(
        F.col(id_col),
        F.explode_outer(_gram_buckets(text_col, n_buckets, salt)).alias("bucket"),
    )
    return (
        grams.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).alias("n_grams"),
            F.round(
                F.coalesce(F.sum("log_ratio"), F.lit(0.0)), 6
            ).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1e-2,
    salt: str = "dsir",
    gumbel: bool = True,
) -> DataFrame:
    """Top-k DSIR selection: Gumbel-perturbed log weights (the paper's
    sampling-without-replacement; ``gumbel=False`` for the argmax-k
    variant). Deterministic: the Gumbel draw is -ln(-ln(u)) over the
    52-bit md5 fraction of the id. Returns the selected
    (id, n_grams, log_weight, key) rows, best first — orderBy+limit
    plans as TakeOrderedAndProject, no global sort."""
    w = dsir_log_weights(raw, target, text_col, id_col, n_buckets, alpha, salt)
    if gumbel:
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt + "g"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 52))
        )
        key = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    else:
        key = F.col("log_weight")
    return (
        w.select("*", key.alias("key"))
        .orderBy(F.col("key").desc(), F.col(id_col))
        .limit(k)
    )
