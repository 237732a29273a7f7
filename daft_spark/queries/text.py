"""Text-analysis queries over documents: token counting, quality
scoring, language ID, fingerprinting — all pure JVM expressions with
DuckDB oracles replicating the identical formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.functions.text import (
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from daft_spark.io.readers import load_table
from daft_spark.queries import register


def _docs(spark, sf_dir):
    # spread(): regex scoring is CPU-bound and only as parallel as the
    # scan's split count — a single-file fixture serializes it onto one
    # task; no-op on real multi-file inputs (operators/spread.py)
    from daft_spark.operators.spread import spread

    return spread(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_count",
    """
    SELECT lang,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-za-z0-9]+'))) AS BIGINT) AS total_tokens,
           avg(len(regexp_extract_all(lower(text), '[a-za-z0-9]+'))) AS avg_tokens,
           CAST(max(len(regexp_extract_all(lower(text), '[a-za-z0-9]+'))) AS INT) AS max_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language bucket."""
    d = _docs(spark, sf_dir).withColumn("n_tok", token_count(F.col("text")))
    return (
        d.groupBy("lang")
        .agg(
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.avg("n_tok").alias("avg_tokens"),
            F.max("n_tok").alias("max_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "text_quality",
    """
    WITH q AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS punct_r
      FROM documents)
    SELECT doc_id, CAST(n_tok AS INT) AS n_tok, punct_r
    FROM q WHERE n_tok >= 5 AND punct_r <= 0.2
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter: keep docs with >= 5 tokens and <= 20% punctuation
    (C4-style heuristics; composite score in functions/text.py)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        punct_ratio(F.col("text")).alias("punct_r"),
    )
    return d.filter((F.col("n_tok") >= 5) & (F.col("punct_r") <= 0.2)).orderBy("doc_id")


# The fixed STOPWORDS_EN / LANG_MARKERS lexicons (functions/text.py:20-28)
# restated as DuckDB list literals so the oracle recomputes the identical
# heuristics — these queries were rows-only in round 1; the lexicons are
# compile-time constants, so full value oracles are possible.
_SW_SQL = "['the','and','of','to','in','is','that','with','a','an','it','for','on','as','are','was']"
_MARKERS_SQL = {
    "en": "['the','and','of','to','in','is','that','with']",
    "de": "['der','die','und','das','ist','nicht','mit','ein']",
    "fr": "['le','la','et','les','des','est','pas','une']",
    "es": "['el','de','la','que','los','una','por','con']",
    "zh": "['的','是','在','了','我','有','他','这']",
}
_TOKS_SQL = "regexp_extract_all(lower(text), '[a-za-z0-9]+')"


@register(
    "text_quality_score_dist",
    f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKS_SQL}) AS n_tok,
             CAST(coalesce(list_sum([length(t) FOR t IN {_TOKS_SQL}]), 0) AS DOUBLE)
               / greatest(len({_TOKS_SQL}), 1) AS mwl,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS pr,
             CAST(len(list_filter({_TOKS_SQL}, t -> list_contains({_SW_SQL}, t))) AS DOUBLE)
               / greatest(len({_TOKS_SQL}), 1) AS swr
      FROM documents)
    SELECT (CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 0.25 ELSE 0.0 END
          + CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
          + CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END
          + CASE WHEN swr >= 0.01 THEN 0.25 ELSE 0.0 END) AS q,
           CAST(count(*) AS BIGINT) AS n
    FROM m GROUP BY q ORDER BY q
    """,
)
def text_quality_score_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of the composite C4/Gopher-style quality score; the
    oracle recomputes the full composite (length band, mean word length,
    punctuation ratio, stopword ratio) in DuckDB."""
    d = _docs(spark, sf_dir).withColumn("q", quality_score(F.col("text")))
    return d.groupBy("q").agg(F.count(F.lit(1)).alias("n")).orderBy("q")


def _lang_scores_sql() -> str:
    cols = ", ".join(
        f"len(list_filter({_TOKS_SQL}, t -> list_contains({m}, t))) AS s_{c}"
        for c, m in _MARKERS_SQL.items()
    )
    return f"SELECT lang, {cols} FROM documents"


@register(
    "text_langid_agreement",
    f"""
    WITH s AS ({_lang_scores_sql()}),
    p AS (
      SELECT lang,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                  ELSE 'zh' END AS pred
      FROM s)
    SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY lang, pred ORDER BY lang, pred
    """,
)
def text_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID vs the dataset's lang label — confusion
    counts. The oracle replays the same marker-lexicon argmax (earliest
    lexicon-order language wins ties, 'und' when no hits)."""
    d = _docs(spark, sf_dir).withColumn("pred", lang_id(F.col("text")))
    return (
        d.groupBy("lang", "pred").agg(F.count(F.lit(1)).alias("n")).orderBy("lang", "pred")
    )


@register(
    "text_fingerprint",
    """
    SELECT count(*) AS n_docs,
           count(DISTINCT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS n_unique
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint invariant: distinct 64-bit fingerprints == distinct
    normalized texts (collision-free at corpus scale)."""
    d = _docs(spark, sf_dir).withColumn("fp", fingerprint(F.col("text")))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_unique"),
    )


@register(
    "text_stats_by_source",
    """
    SELECT source,
           avg(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1)) AS avg_punct,
           avg(CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
                THEN (SELECT sum(length(t)) FROM unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS u(t))
                     / CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE)
                ELSE 0.0 END) AS avg_word_len,
           count(*) AS n
    FROM documents GROUP BY source ORDER BY source
    """,
)
def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics (punct ratio, mean word length)."""
    d = _docs(spark, sf_dir).select(
        "source",
        punct_ratio(F.col("text")).alias("punct_r"),
        mean_word_length(F.col("text")).alias("mwl"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.avg("punct_r").alias("avg_punct"),
            F.avg("mwl").alias("avg_word_len"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("source")
    )


@register(
    "text_stopword_filter",
    f"""
    WITH m AS (
      SELECT round(CAST(len(list_filter({_TOKS_SQL}, t -> list_contains({_SW_SQL}, t))) AS DOUBLE)
                   / greatest(len({_TOKS_SQL}), 1), 2) AS sw_bucket
      FROM documents)
    SELECT sw_bucket, CAST(count(*) AS BIGINT) AS n
    FROM m GROUP BY sw_bucket ORDER BY sw_bucket
    """,
)
def text_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio distribution buckets; oracle recomputes the ratio
    with the same fixed lexicon in DuckDB."""
    d = _docs(spark, sf_dir).withColumn(
        "sw_bucket", F.round(stopword_ratio(F.col("text")), 2)
    )
    return d.groupBy("sw_bucket").agg(F.count(F.lit(1)).alias("n")).orderBy("sw_bucket")
