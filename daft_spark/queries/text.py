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


# ---------------------------------------------------------------------------
# Gopher / C4 document-quality rules, repetition, PII, contamination.
#
# The synthetic corpus is punctuation-free word salad, so these queries
# first derive an ENRICHED document deterministically from (text,
# doc_id) — the identical derivation in Spark and the DuckDB oracle
# (the established fixture pattern: the derivation is part of the query
# contract, the rule engine is what's under test).


def _enrich(d):
    """text + deterministic structural blocks keyed by doc_id: bullets,
    ellipses, lorem-ipsum, code braces, markdown hashes, PII strings,
    duplicated lines, and a terminal three-sentence closer."""
    did = F.col("doc_id")

    def when_mod(m, s):
        return F.when(did % m == 0, F.lit(s)).otherwise(F.lit(""))

    return d.withColumn(
        "doc2",
        F.concat(
            F.col("text"),
            when_mod(3, "\n• bullet item one\n• bullet item two"),
            when_mod(4, "\nto be continued..."),
            when_mod(5, "\nlorem ipsum dolor sit amet"),
            when_mod(9, "\nfunction() { return 0; }"),
            when_mod(7, "\n### header ###"),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit("\ncontact user"),
                    did.cast("string"),
                    F.lit("@example.com ip 10.0."),
                    (did % 256).cast("string"),
                    F.lit(".77 call +555 123-4567 ssn 123-45-6789"),
                ),
            ).otherwise(F.lit("")),
            when_mod(6, "\nrepeated line\nrepeated line"),
            F.lit("\nThis is a closing sentence. It has three parts. Done?"),
        ),
    )


# The same derivation as a DuckDB CTE (chr(10) newlines, chr(8226) = •).
_ENRICH_SQL = """
  SELECT *, text
    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(8226) || ' bullet item one' || chr(10) || chr(8226) || ' bullet item two' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'to be continued...' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet' ELSE '' END
    || CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'function() { return 0; }' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '### header ###' ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77 call +555 123-4567 ssn 123-45-6789' ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'repeated line' || chr(10) || 'repeated line' ELSE '' END
    || chr(10) || 'This is a closing sentence. It has three parts. Done?' AS doc2
  FROM documents
"""

_TOKS2_SQL = "regexp_extract_all(lower(doc2), '[a-z0-9]+')"
_LINES2_SQL = "string_split(doc2, chr(10))"


@register(
    "text_gopher_rules",
    f"""
    WITH e AS ({_ENRICH_SQL}),
    m AS (
      SELECT lang,
        {_TOKS2_SQL} AS toks,
        {_LINES2_SQL} AS ls,
        CAST(coalesce(list_sum(list_transform({_TOKS2_SQL}, x -> length(x))), 0) AS DOUBLE)
          / greatest(len({_TOKS2_SQL}), 1) AS mwl,
        CAST(length(doc2) - length(replace(doc2, '#', ''))
             + len(regexp_extract_all(doc2, '\\.\\.\\.')) AS DOUBLE) AS n_sym,
        doc2
      FROM e),
    r AS (
      SELECT lang,
        len(toks) >= 30 AND len(toks) <= 100000 AS word_count_ok,
        mwl >= 3.0 AND mwl <= 10.0 AS mean_word_length_ok,
        n_sym / greatest(len(toks), 1) <= 0.1 AS symbol_ratio_ok,
        CAST(len(list_filter(ls, x -> regexp_matches(x, '^({chr(8226)}|- |\\* )'))) AS DOUBLE)
          / greatest(len(ls), 1) <= 0.9 AS bullet_ok,
        CAST(len(list_filter(ls, x -> regexp_matches(x, '(\\.\\.\\.|{chr(8230)})$'))) AS DOUBLE)
          / greatest(len(ls), 1) <= 0.3 AS ellipsis_ok,
        CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
          / greatest(len(toks), 1) >= 0.8 AS alpha_ok,
        len(list_intersect(list_distinct(toks),
            ['the','be','to','of','and','that','have','with'])) >= 2 AS stopword_ok
      FROM m)
    SELECT lang,
      CAST(sum(CASE WHEN word_count_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_word_count_ok,
      CAST(sum(CASE WHEN mean_word_length_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl_ok,
      CAST(sum(CASE WHEN symbol_ratio_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol_ok,
      CAST(sum(CASE WHEN bullet_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet_ok,
      CAST(sum(CASE WHEN ellipsis_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis_ok,
      CAST(sum(CASE WHEN alpha_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_ok,
      CAST(sum(CASE WHEN stopword_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_stopword_ok,
      CAST(sum(CASE WHEN word_count_ok AND mean_word_length_ok AND symbol_ratio_ok
                     AND bullet_ok AND ellipsis_ok AND alpha_ok AND stopword_ok
               THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      CAST(count(*) AS BIGINT) AS n_docs
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher (Rae et al. 2021, A1.1) document-quality rules over the
    enriched corpus: per-language counts of documents passing each rule
    and all rules. Pure Column expressions (functions/text.py
    gopher_rules) — the oracle restates every rule formula in SQL."""
    from daft_spark.functions.text import gopher_rules

    d = _enrich(_docs(spark, sf_dir)).select(
        "lang", gopher_rules(F.col("doc2"), min_words=30).alias("g")
    )

    def n_of(field, alias):
        return (
            F.sum(F.when(F.col(f"g.{field}"), 1).otherwise(0))
            .cast("long")
            .alias(alias)
        )

    return (
        d.groupBy("lang")
        .agg(
            n_of("word_count_ok", "n_word_count_ok"),
            n_of("mean_word_length_ok", "n_mwl_ok"),
            n_of("symbol_ratio_ok", "n_symbol_ok"),
            n_of("bullet_ok", "n_bullet_ok"),
            n_of("ellipsis_ok", "n_ellipsis_ok"),
            n_of("alpha_ok", "n_alpha_ok"),
            n_of("stopword_ok", "n_stopword_ok"),
            n_of("keep", "n_keep"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .orderBy("lang")
    )


@register(
    "text_c4_rules",
    f"""
    WITH e AS ({_ENRICH_SQL}),
    r AS (
      SELECT lang,
        NOT contains(lower(doc2), '{{') AS no_curly,
        NOT contains(lower(doc2), 'lorem ipsum') AS no_lorem,
        len(regexp_extract_all(doc2, '[.!?]')) >= 3 AS min_sent,
        CAST(len(list_filter({_LINES2_SQL}, x -> regexp_matches(x, '[.!?]$'))) AS DOUBLE)
          / greatest(len({_LINES2_SQL}), 1) AS term_frac
      FROM e)
    SELECT lang,
      CAST(sum(CASE WHEN no_curly THEN 1 ELSE 0 END) AS BIGINT) AS n_no_curly,
      CAST(sum(CASE WHEN no_lorem THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lorem,
      CAST(sum(CASE WHEN min_sent THEN 1 ELSE 0 END) AS BIGINT) AS n_min_sentences,
      avg(term_frac) AS avg_terminal_frac,
      CAST(sum(CASE WHEN no_curly AND no_lorem AND min_sent THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      CAST(count(*) AS BIGINT) AS n_docs
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (Raffel et al. 2020, 2.2) cleaning rules over the enriched
    corpus: curly-brace / lorem-ipsum / sentence-count filters plus the
    terminal-punctuation line ratio, aggregated per language."""
    from daft_spark.functions.text import c4_rules

    d = _enrich(_docs(spark, sf_dir)).select(
        "lang", c4_rules(F.col("doc2")).alias("c")
    )
    return (
        d.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("c.no_curly_brace"), 1).otherwise(0))
            .cast("long").alias("n_no_curly"),
            F.sum(F.when(F.col("c.no_lorem_ipsum"), 1).otherwise(0))
            .cast("long").alias("n_no_lorem"),
            F.sum(F.when(F.col("c.min_sentences_ok"), 1).otherwise(0))
            .cast("long").alias("n_min_sentences"),
            F.avg(F.col("c.terminal_punct_frac")).alias("avg_terminal_frac"),
            F.sum(F.when(F.col("c.keep"), 1).otherwise(0))
            .cast("long").alias("n_keep"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .orderBy("lang")
    )


# PII patterns restated for the oracle (RE2 == Java semantics for these
# character-class patterns); the redaction chain applies in the same
# order with DuckDB's 'g' flag (replace-all, Spark's default).
_PII_SQL = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone": "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}",
    "ssn": "\\b\\d{3}-\\d{2}-\\d{4}\\b",
}
_REDACT_SQL = "doc2"
for _name in ("email", "ssn", "phone", "ipv4"):
    _REDACT_SQL = (
        f"regexp_replace({_REDACT_SQL}, '{_PII_SQL[_name]}', '[PII]', 'g')"
    )


@register(
    "text_pii_scrub",
    f"""
    WITH e AS ({_ENRICH_SQL})
    SELECT source,
      CAST(sum(len(regexp_extract_all(doc2, '{_PII_SQL["email"]}'))) AS BIGINT) AS n_email,
      CAST(sum(len(regexp_extract_all(doc2, '{_PII_SQL["ipv4"]}'))) AS BIGINT) AS n_ipv4,
      CAST(sum(len(regexp_extract_all(doc2, '{_PII_SQL["phone"]}'))) AS BIGINT) AS n_phone,
      CAST(sum(len(regexp_extract_all(doc2, '{_PII_SQL["ssn"]}'))) AS BIGINT) AS n_ssn,
      CAST(sum(length(doc2) - length({_REDACT_SQL})) AS BIGINT) AS redacted_delta
    FROM e GROUP BY source ORDER BY source
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction audit per source: per-category match
    counts (pii_counts) and the total character delta after redact_pii
    — the oracle recomputes both with the identical patterns and
    replacement chain, so a pattern or ordering drift hash-mismatches."""
    from daft_spark.functions.text import pii_counts, redact_pii

    d = _enrich(_docs(spark, sf_dir)).select(
        "source",
        pii_counts(F.col("doc2")).alias("p"),
        (F.length("doc2") - F.length(redact_pii(F.col("doc2")))).alias("delta"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.sum("p.email").cast("long").alias("n_email"),
            F.sum("p.ipv4").cast("long").alias("n_ipv4"),
            F.sum("p.phone").cast("long").alias("n_phone"),
            F.sum("p.ssn").cast("long").alias("n_ssn"),
            F.sum("delta").cast("long").alias("redacted_delta"),
        )
        .orderBy("source")
    )


@register(
    "text_repetition",
    f"""
    WITH e AS ({_ENRICH_SQL}),
    m AS (
      SELECT lang,
        1.0 - CAST(len(list_distinct({_LINES2_SQL})) AS DOUBLE)
              / greatest(len({_LINES2_SQL}), 1) AS dup_frac
      FROM e)
    SELECT lang,
      avg(dup_frac) AS avg_dup_line_frac,
      CAST(sum(CASE WHEN dup_frac > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_dups,
      CAST(count(*) AS BIGINT) AS n_docs
    FROM m GROUP BY lang ORDER BY lang
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signal: per-language mean duplicate-line
    fraction and how many documents contain any duplicated line."""
    from daft_spark.functions.text import duplicate_line_fraction

    d = _enrich(_docs(spark, sf_dir)).select(
        "lang", duplicate_line_fraction(F.col("doc2")).alias("dup_frac")
    )
    return (
        d.groupBy("lang")
        .agg(
            F.avg("dup_frac").alias("avg_dup_line_frac"),
            F.sum(F.when(F.col("dup_frac") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_with_dups"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .orderBy("lang")
    )


_GOPHER_KEEP_SQL = f"""
      (len({_TOKS2_SQL}) >= 30 AND len({_TOKS2_SQL}) <= 100000)
      AND (CAST(coalesce(list_sum(list_transform({_TOKS2_SQL}, x -> length(x))), 0) AS DOUBLE)
           / greatest(len({_TOKS2_SQL}), 1) BETWEEN 3.0 AND 10.0)
      AND (CAST(length(doc2) - length(replace(doc2, '#', ''))
                + len(regexp_extract_all(doc2, '\\.\\.\\.')) AS DOUBLE)
           / greatest(len({_TOKS2_SQL}), 1) <= 0.1)
      AND (CAST(len(list_filter({_LINES2_SQL}, x -> regexp_matches(x, '^({chr(8226)}|- |\\* )'))) AS DOUBLE)
           / greatest(len({_LINES2_SQL}), 1) <= 0.9)
      AND (CAST(len(list_filter({_LINES2_SQL}, x -> regexp_matches(x, '(\\.\\.\\.|{chr(8230)})$'))) AS DOUBLE)
           / greatest(len({_LINES2_SQL}), 1) <= 0.3)
      AND (CAST(len(list_filter({_TOKS2_SQL}, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           / greatest(len({_TOKS2_SQL}), 1) >= 0.8)
      AND (len(list_intersect(list_distinct({_TOKS2_SQL}),
               ['the','be','to','of','and','that','have','with'])) >= 2)
"""

_C4_KEEP_SQL = """
      NOT contains(lower(doc2), '{')
      AND NOT contains(lower(doc2), 'lorem ipsum')
      AND len(regexp_extract_all(doc2, '[.!?]')) >= 3
"""

_SHINGLE3_SQL = """
      list_distinct(list_transform(range(1, len(t)+1),
         i -> t[i] || chr(31) || coalesce(t[i+1],'') || chr(31) || coalesce(t[i+2],'')))
"""


@register(
    "pipeline_corpus_curation",
    f"""
    WITH e AS ({_ENRICH_SQL}),
    passed AS (
      SELECT doc_id, lang, text FROM e
      WHERE ({_GOPHER_KEEP_SQL}) AND ({_C4_KEEP_SQL})),
    keepers AS (SELECT min(doc_id) AS doc_id FROM passed GROUP BY text),
    dsurv AS (SELECT p.* FROM passed p JOIN keepers USING (doc_id)),
    norm AS (
      SELECT doc_id, lang, text,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
      FROM dsurv),
    bench_t AS (
      SELECT string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
      FROM documents WHERE doc_id % 41 = 0),
    bench_sh AS (SELECT DISTINCT unnest({_SHINGLE3_SQL}) AS g FROM bench_t),
    cont AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id, unnest({_SHINGLE3_SQL}) AS g FROM norm) d
      JOIN bench_sh USING (g)),
    clean AS (
      SELECT n.* FROM norm n LEFT JOIN cont c ON n.doc_id = c.doc_id
      WHERE c.doc_id IS NULL),
    s1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pass FROM passed GROUP BY lang),
    s2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup FROM dsurv GROUP BY lang),
    s3 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_clean,
                  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS tokens_clean
           FROM clean GROUP BY lang)
    SELECT l.lang,
           coalesce(s1.n_pass, 0) AS n_pass,
           coalesce(s2.n_dedup, 0) AS n_dedup,
           coalesce(s3.n_clean, 0) AS n_clean,
           coalesce(s3.tokens_clean, 0) AS tokens_clean
    FROM (SELECT DISTINCT lang FROM documents) l
    LEFT JOIN s1 ON l.lang = s1.lang
    LEFT JOIN s2 ON l.lang = s2.lang
    LEFT JOIN s3 ON l.lang = s3.lang
    ORDER BY l.lang
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation — the flagship training-data shape:
    quality rules (Gopher + C4) -> exact dedup (keep-min over hashed
    text, keys-only exchange) -> benchmark decontamination (broadcast
    shingle set) -> per-language survivor counts + token budget. Every
    stage is the scale-correct operator the individual queries verify;
    the oracle restates the WHOLE pipeline, so stage wiring (filter
    before dedup, dedup before decontamination, bench drawn from the
    full corpus) is part of the checked contract."""
    from daft_spark.functions.text import c4_rules, gopher_rules, token_count
    from daft_spark.operators.dedup import benchmark_contamination, exact_dedup

    raw = _docs(spark, sf_dir)
    bench = raw.filter(F.col("doc_id") % 41 == 0)
    e = _enrich(raw).select(
        "doc_id", "lang", "text",
        gopher_rules(F.col("doc2"), min_words=30).alias("g"),
        c4_rules(F.col("doc2")).alias("c"),
    )
    passed = e.filter(F.col("g.keep") & F.col("c.keep")).select(
        "doc_id", "lang", "text"
    )
    dsurv = exact_dedup(passed, ["text"], "doc_id", keep="min")
    cont = benchmark_contamination(dsurv, bench, "text", "doc_id", shingle_k=3)
    clean = dsurv.join(
        cont.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    langs = raw.select("lang").distinct()
    s1 = passed.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_pass"))
    s2 = dsurv.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_dedup"))
    s3 = clean.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_clean"),
        F.sum(token_count(F.col("text"))).cast("long").alias("tokens_clean"),
    )
    return (
        langs.join(s1, "lang", "left")
        .join(s2, "lang", "left")
        .join(s3, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_pass", F.lit(0)).alias("n_pass"),
            F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("tokens_clean", F.lit(0)).alias("tokens_clean"),
        )
        .orderBy("lang")
    )


@register(
    "text_lm_perplexity",
    r"""
    WITH toks0 AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
             generate_subscripts(string_split_regex(lower(trim(text)), '\s+'), 1) AS ord
      FROM documents
    ),
    toks AS (SELECT * FROM toks0 WHERE tok <> ''),
    big AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS v FROM toks),
    sc AS (
      SELECT big.doc_id,
             count(*) AS n_bigrams,
             sum(CAST(round(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 9)
                      AS DECIMAL(28,9))) AS lsum
      FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY big.doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(CAST(lsum AS DOUBLE) / n_bigrams, 6) AS avg_logprob,
           round(exp(-round(CAST(lsum AS DOUBLE) / n_bigrams, 6)), 4) AS perplexity
    FROM sc ORDER BY doc_id
    """,
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity scoring under a corpus-trained add-k
    bigram LM (operators/lm.py) — the quality-filter stage real LLM
    pipelines run with KenLM, restated engine-native so the whole
    model fit + scoring is one oracle-checkable distributed plan."""
    from daft_spark.operators.lm import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "text_stratified_sample",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) WHERE rn <= 30
    ORDER BY doc_id
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quota sampling in the DETERMINISTIC md5
    order (operators/sampling.py) — reproducible across runs,
    partitionings, and engines, unlike rand(seed)."""
    from daft_spark.operators.sampling import stratified_sample

    return (
        stratified_sample(_docs(spark, sf_dir), ["lang"], 30, "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "pipeline_token_budget_mix",
    """
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '[a-za-z0-9]+')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
           CAST(max(cum) AS BIGINT) AS budget_used
    FROM c WHERE cum <= 2000
    GROUP BY source ORDER BY source
    """,
)
def pipeline_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: fill a 2000-token budget per source
    in the deterministic md5 order (operators/sampling.py
    token_budget_select) and report the achieved mixture — the
    composition-assembly step of a training-data pipeline."""
    from daft_spark.operators.sampling import token_budget_select

    d = _docs(spark, sf_dir).withColumn("n_tok", token_count(F.col("text")))
    kept = token_budget_select(d, ["source"], "n_tok", 2000, "doc_id")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_kept"),
            F.sum("n_tok").cast("long").alias("tokens_kept"),
            F.max("__cum").cast("long").alias("budget_used"),
        )
        .orderBy("source")
    )


@register(
    "text_ngram_repetition",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
      FROM documents),
    g2 AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
      FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t), 1))) AS i) u
      WHERE len(t) >= 2),
    c2 AS (
      SELECT doc_id, s, count(*) AS c, length(s) AS l
      FROM g2 GROUP BY doc_id, s),
    top2 AS (
      SELECT doc_id,
             round(CAST(max(c * l) AS DOUBLE) / sum(c * l), 6) AS top2gram_char_frac
      FROM c2 GROUP BY doc_id),
    g5 AS (
      SELECT doc_id, array_to_string(t[i:i+4], ' ') AS s
      FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - 3, 1))) AS i) u
      WHERE len(t) >= 5),
    c5 AS (
      SELECT doc_id, s, count(*) AS c, length(s) AS l
      FROM g5 GROUP BY doc_id, s),
    dup5 AS (
      SELECT doc_id,
             round(CAST(sum(CASE WHEN c > 1 THEN c * l ELSE 0 END) AS DOUBLE)
                   / sum(c * l), 6) AS dup5gram_char_frac
      FROM c5 GROUP BY doc_id)
    SELECT top2.doc_id, top2gram_char_frac, dup5gram_char_frac
    FROM top2 JOIN dup5 USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's n-gram repetition rules (operators/repetition.py):
    top-2-gram and duplicate-5-gram character fractions per document —
    the within-document boilerplate signals the line-level rule
    misses. The oracle restates the identical tokenization, n-gram
    assembly, and char-weighted fractions."""
    from daft_spark.operators.repetition import ngram_repetition_fractions

    return ngram_repetition_fractions(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "text_perplexity_buckets",
    r"""
    WITH toks0 AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
             generate_subscripts(string_split_regex(lower(trim(text)), '\s+'), 1) AS ord
      FROM documents
    ),
    toks AS (SELECT * FROM toks0 WHERE tok <> ''),
    big AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS v FROM toks),
    sc AS (
      SELECT big.doc_id,
             count(*) AS n_bigrams,
             sum(CAST(round(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 9)
                      AS DECIMAL(28,9))) AS lsum
      FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY big.doc_id
    ),
    px AS (
      SELECT doc_id, n_bigrams,
             round(exp(-round(CAST(lsum AS DOUBLE) / n_bigrams, 6)), 4) AS perplexity
      FROM sc
    ),
    bk AS (
      SELECT px.doc_id, d.lang, px.n_bigrams, px.perplexity,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY px.perplexity, px.doc_id) AS bucket
      FROM px JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang,
           CAST(n_bigrams AS BIGINT) AS n_bigrams, perplexity,
           CAST(bucket AS INT) AS bucket,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket_label
    FROM bk ORDER BY doc_id
    """,
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing per language
    (operators/lm.py perplexity_buckets — Wenzek et al. §4.3, the
    stage that decides each document's sampling rate). The oracle
    refits the identical add-k bigram LM and replays the ntile over
    the same deterministic (perplexity, doc_id) order, so the scores
    AND the bucket boundaries are value-checked."""
    from daft_spark.operators.lm import perplexity_buckets

    return perplexity_buckets(
        _docs(spark, sf_dir), "text", "doc_id", n_buckets=3, by=["lang"]
    ).orderBy("doc_id")


@register(
    "pipeline_pack_sequences",
    """
    WITH n AS (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '[a-za-z0-9]+')) + 1 AS nt
      FROM documents),
    c AS (
      SELECT doc_id, source, nt,
             sum(nt) OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS e
      FROM n)
    SELECT doc_id, source,
           CAST(nt AS BIGINT) AS n_tokens,
           CAST(e - nt AS BIGINT) AS start_offset,
           CAST((e - nt) // 2048 AS BIGINT) AS first_seq,
           CAST((e - 1) // 2048 AS BIGINT) AS last_seq,
           CAST((e - 1) // 2048 - (e - nt) // 2048 + 1 AS BIGINT)
             AS n_seqs_spanned
    FROM c ORDER BY doc_id
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence-packing plan per source shard
    (operators/sampling.py pack_sequences): deterministic md5
    concatenation order, 2048-token sequences, 1 EOD token per doc.
    The oracle replays the identical token counts, ordering, running
    sums, and boundary arithmetic, so every document's placement is
    value-checked."""
    from daft_spark.operators.sampling import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), "text", "doc_id",
        seq_len=2048, eod_tokens=1, by=["source"],
    ).orderBy("doc_id")


@register(
    "pipeline_hash_split",
    """
    WITH u AS (
      SELECT doc_id, lang,
             list_sum(list_transform(range(1, 14), i ->
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || 'r9'), i, 1)) - 1)
               * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 AS x
      FROM documents),
    s AS (
      SELECT doc_id, lang,
             CASE WHEN x < 0.8 THEN 'train'
                  WHEN x < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM u)
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM s GROUP BY split, lang ORDER BY split, lang
    """,
)
def pipeline_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(id || salt)
    (operators/sampling.py hash_split) — stable under re-runs,
    insertions, and repartitioning, unlike randomSplit. The oracle
    recomputes the identical 52-bit md5 fraction per id via hex-nibble
    arithmetic and compares per-(split, lang) membership through
    count/min/max/sum of ids — a single reassigned document
    mismatches."""
    from daft_spark.operators.sampling import hash_split

    d = hash_split(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="doc_id", salt="r9",
    )
    return (
        d.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("split", "lang")
    )


@register(
    "pipeline_corpus_curation_v2",
    f"""
    WITH RECURSIVE e AS ({_ENRICH_SQL}),
    passed AS (
      SELECT doc_id, lang, text FROM e
      WHERE ({_GOPHER_KEEP_SQL}) AND ({_C4_KEEP_SQL})),
    keepers AS (SELECT min(doc_id) AS doc_id FROM passed GROUP BY text),
    dsurv AS (SELECT p.* FROM passed p JOIN keepers USING (doc_id)),
    norm AS (
      SELECT doc_id, lang, text,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
      FROM dsurv),
    -- containment resolve over the exact-dedup survivors
    csh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLE3_SQL}) AS s FROM norm),
    crare AS (SELECT s FROM csh GROUP BY s HAVING count(*) <= 200),
    ckept AS (SELECT csh.doc_id, csh.s FROM csh JOIN crare USING (s)),
    cden AS (SELECT doc_id, count(*) AS na FROM ckept GROUP BY doc_id),
    cinter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
      FROM ckept a JOIN ckept b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    cpair AS (
      SELECT id_a, id_b FROM cinter JOIN cden ON cden.doc_id = id_a
      WHERE round(CAST(n AS DOUBLE) / na, 6) >= 0.8),
    cedges AS (SELECT id_a, id_b FROM cpair UNION SELECT id_b, id_a FROM cpair),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM dsurv
      UNION
      SELECT ce.id_b, r.lbl FROM reach r JOIN cedges ce ON ce.id_a = r.node),
    comp AS (SELECT node AS doc_id, min(lbl) AS cid FROM reach GROUP BY node),
    reps AS (
      SELECT n.* FROM norm n JOIN comp ON n.doc_id = comp.doc_id
      WHERE comp.doc_id = comp.cid),
    -- exact-substring span removal (keep-first) over the representatives
    w AS (
      SELECT doc_id, i, array_to_string(t[i:i+19], chr(31)) AS s
      FROM reps, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - 18, 1))) AS i) u),
    nd AS (
      SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS ndocs FROM w GROUP BY s)
      WHERE ndocs >= 2),
    rk AS (
      SELECT w.doc_id, w.i,
             row_number() OVER (PARTITION BY w.s ORDER BY w.doc_id, w.i) AS rn
      FROM w JOIN nd USING (s)),
    rm AS (SELECT doc_id, i FROM rk WHERE rn > 1),
    tok AS (
      SELECT doc_id, unnest(t) AS tk, generate_subscripts(t, 1) AS p FROM reps),
    cov AS (
      SELECT DISTINCT tk.doc_id, tk.p
      FROM tok tk JOIN rm ON rm.doc_id = tk.doc_id
       AND tk.p >= rm.i AND tk.p < rm.i + 20),
    spanout AS (
      SELECT r.doc_id, r.lang,
             coalesce(ks.clean_text, '') AS clean_text,
             coalesce(cnt.nrem, 0) AS n_removed
      FROM reps r
      LEFT JOIN (SELECT tk.doc_id, string_agg(tk.tk, ' ' ORDER BY tk.p) AS clean_text
                 FROM tok tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.p = tk.p
                 WHERE cov.p IS NULL GROUP BY tk.doc_id) ks ON ks.doc_id = r.doc_id
      LEFT JOIN (SELECT doc_id, count(*) AS nrem FROM cov GROUP BY doc_id) cnt
        ON cnt.doc_id = r.doc_id),
    -- decontamination of the CLEANED text against the benchmark split
    bench_t AS (
      SELECT string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
      FROM documents WHERE doc_id % 41 = 0),
    bench_sh AS (SELECT DISTINCT unnest({_SHINGLE3_SQL}) AS g FROM bench_t),
    sp_t AS (SELECT doc_id, lang, clean_text, n_removed,
                    string_split(clean_text, ' ') AS t FROM spanout),
    contam AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id, unnest({_SHINGLE3_SQL}) AS g FROM sp_t) d
      JOIN bench_sh USING (g)),
    clean AS (
      SELECT s.* FROM sp_t s LEFT JOIN contam c ON s.doc_id = c.doc_id
      WHERE c.doc_id IS NULL),
    s2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup FROM dsurv GROUP BY lang),
    s3 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_resolved FROM reps GROUP BY lang),
    s4 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_clean,
                  CAST(sum(n_removed) AS BIGINT) AS span_tokens_removed,
                  CAST(sum(len(regexp_extract_all(lower(clean_text), '[a-z0-9]+'))) AS BIGINT)
                    AS tokens_clean
           FROM clean GROUP BY lang)
    SELECT l.lang,
           coalesce(s2.n_dedup, 0) AS n_dedup,
           coalesce(s3.n_resolved, 0) AS n_resolved,
           coalesce(s4.n_clean, 0) AS n_clean,
           coalesce(s4.span_tokens_removed, 0) AS span_tokens_removed,
           coalesce(s4.tokens_clean, 0) AS tokens_clean
    FROM (SELECT DISTINCT lang FROM documents) l
    LEFT JOIN s2 ON l.lang = s2.lang
    LEFT JOIN s3 ON l.lang = s3.lang
    LEFT JOIN s4 ON l.lang = s4.lang
    ORDER BY l.lang
    """,
)
def pipeline_corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation v2 — the full Lee-et-al-shaped loop the r9
    operators complete: quality rules (Gopher + C4) -> exact dedup ->
    CONTAINMENT-edge resolution (embedded-document dups, unified
    resolve API) -> exact-substring SPAN REMOVAL (keep-first) on the
    survivors -> decontamination of the CLEANED text -> per-language
    survivor counts, span-removed token counts, and the final token
    budget. Every stage is deterministic, so the oracle replays the
    ENTIRE pipeline including the containment components (recursive
    CTE) and the rebuilt clean text — the stage WIRING (dedup before
    resolution, span removal before decontamination, benchmark drawn
    from the raw corpus) is part of the checked contract."""
    from daft_spark.functions.text import c4_rules, gopher_rules
    from daft_spark.operators.dedup import (
        benchmark_contamination,
        exact_dedup,
        near_dup_resolve,
        remove_duplicated_spans,
    )

    raw = _docs(spark, sf_dir)
    bench = raw.filter(F.col("doc_id") % 41 == 0)
    e = _enrich(raw).select(
        "doc_id", "lang", "text",
        gopher_rules(F.col("doc2"), min_words=30).alias("g"),
        c4_rules(F.col("doc2")).alias("c"),
    )
    passed = e.filter(F.col("g.keep") & F.col("c.keep")).select(
        "doc_id", "lang", "text"
    )
    dsurv = exact_dedup(passed, ["text"], "doc_id", keep="min").persist()
    res = near_dup_resolve(
        dsurv, "text", "doc_id",
        edge_sources=("containment",),
        containment_threshold=0.8, containment_max_doc_freq=200,
    )
    reps = (
        res.filter(F.col("is_representative"))
        .select("doc_id", "lang", "text")
        .persist()
    )
    spans = remove_duplicated_spans(reps, "text", "doc_id", window_k=20)
    sp = reps.select("doc_id", "lang").join(spans, "doc_id").persist()
    cont = benchmark_contamination(
        sp,
        bench.select("doc_id", F.col("text").alias("clean_text")),
        "clean_text", "doc_id", shingle_k=3,
    )
    clean = sp.join(
        cont.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    langs = raw.select("lang").distinct()
    s2 = dsurv.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_dedup"))
    s3 = reps.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_resolved"))
    from daft_spark.functions.text import token_count

    s4 = clean.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_clean"),
        F.sum("n_removed").cast("long").alias("span_tokens_removed"),
        F.sum(token_count(F.col("clean_text"))).cast("long").alias("tokens_clean"),
    )
    return (
        langs.join(s2, "lang", "left")
        .join(s3, "lang", "left")
        .join(s4, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
            F.coalesce("n_resolved", F.lit(0)).alias("n_resolved"),
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("span_tokens_removed", F.lit(0)).alias("span_tokens_removed"),
            F.coalesce("tokens_clean", F.lit(0)).alias("tokens_clean"),
        )
        .orderBy("lang")
    )


@register(
    "pipeline_mixture_weights",
    """
    WITH g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE)
               AS weight
      FROM documents GROUP BY source),
    tot AS (SELECT sum(weight) AS t FROM g),
    tgt(source, share) AS (VALUES
      ('src0', 0.4 / 1.0), ('src1', 0.3 / 1.0),
      ('src2', 0.2 / 1.0), ('src3', 0.1 / 1.0)),
    sc AS (
      SELECT g.source, g.n_rows, g.weight,
             g.weight / tot.t AS cur,
             coalesce(tgt.share, 0.0) AS tshare
      FROM g CROSS JOIN tot LEFT JOIN tgt USING (source)),
    mx AS (SELECT max(CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) AS m FROM sc)
    SELECT sc.source, sc.n_rows, sc.weight,
           round(cur, 6) AS current_share,
           round(tshare, 6) AS target_share,
           round(CASE WHEN mx.m > 0 THEN (CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) / mx.m
                 ELSE 0 END, 6) AS sample_rate,
           round(sc.weight * round(CASE WHEN mx.m > 0
                 THEN (CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) / mx.m
                 ELSE 0 END, 6), 6) AS kept_weight
    FROM sc CROSS JOIN mx ORDER BY sc.source
    """,
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-reweighting plan (operators/sampling.py mixture_weights):
    token-weighted per-source sampling rates toward a 40/30/20/10
    target over four sources (everything else dropped) under the
    downsample-only constraint — the mixing step DoReMi-style recipes
    publish. The oracle replays shares, the binding max-ratio group,
    and the rounded rates exactly."""
    from daft_spark.functions.text import token_count
    from daft_spark.operators.sampling import mixture_weights

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).cast("double").alias("toks")
    )
    return mixture_weights(
        d, ["source"],
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        weight_col="toks",
    ).orderBy("source")


@register(
    "pipeline_apply_mixture",
    """
    WITH g AS (
      SELECT source,
             CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE)
               AS weight
      FROM documents GROUP BY source),
    tot AS (SELECT sum(weight) AS t FROM g),
    tgt(source, share) AS (VALUES
      ('src0', 0.4 / 1.0), ('src1', 0.3 / 1.0),
      ('src2', 0.2 / 1.0), ('src3', 0.1 / 1.0)),
    sc AS (
      SELECT g.source, g.weight / tot.t AS cur,
             coalesce(tgt.share, 0.0) AS tshare
      FROM g CROSS JOIN tot LEFT JOIN tgt USING (source)),
    mx AS (SELECT max(CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) AS m FROM sc),
    rates AS (
      SELECT source,
             round(CASE WHEN mx.m > 0
                   THEN (CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) / mx.m
                   ELSE 0 END, 6) AS rate
      FROM sc CROSS JOIN mx),
    u AS (
      SELECT doc_id, source,
             list_sum(list_transform(range(1, 14), i ->
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || 'mix10'), i, 1)) - 1)
               * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 AS x
      FROM documents),
    kept AS (
      SELECT u.doc_id, u.source FROM u JOIN rates USING (source)
      WHERE u.x < rates.rate)
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM kept GROUP BY source ORDER BY source
    """,
)
def pipeline_apply_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTING half of domain reweighting (operators/sampling.py
    apply_mixture): mixture_weights computes per-source sample rates
    toward the 40/30/20/10 target, apply_mixture materializes the
    reweighted corpus — keep a row iff its md5-uniform fraction
    u(doc_id || salt) is below its source's rate. Per-row membership
    depends only on (id, salt, rate), so the oracle replays BOTH halves
    exactly: the rate computation (shares -> binding max-ratio ->
    rounded rates) and the per-document selection via the identical
    hex-nibble 52-bit fraction, compared through per-source
    count/min/max/sum of kept ids — one reassigned document
    mismatches. The corpus never shuffles: the rates frame
    broadcast-joins onto the scan (plan-audited in
    tests/test_operators_extra.py)."""
    from daft_spark.functions.text import token_count
    from daft_spark.operators.sampling import apply_mixture, mixture_weights

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).cast("double").alias("toks")
    )
    rates = mixture_weights(
        d, ["source"],
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        weight_col="toks",
    )
    kept = apply_mixture(
        d, rates, ["source"], id_col="doc_id", salt="mix10"
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_mix_split_pack",
    """
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE)
               AS toks
      FROM documents),
    g AS (SELECT source, sum(toks) AS weight FROM d GROUP BY source),
    tot AS (SELECT sum(weight) AS t FROM g),
    tgt(source, share) AS (VALUES
      ('src0', 0.4 / 1.0), ('src1', 0.3 / 1.0),
      ('src2', 0.2 / 1.0), ('src3', 0.1 / 1.0)),
    sc AS (
      SELECT g.source, g.weight / tot.t AS cur,
             coalesce(tgt.share, 0.0) AS tshare
      FROM g CROSS JOIN tot LEFT JOIN tgt USING (source)),
    mx AS (SELECT max(CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) AS m FROM sc),
    rates AS (
      SELECT source,
             round(CASE WHEN mx.m > 0
                   THEN (CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) / mx.m
                   ELSE 0 END, 6) AS rate
      FROM sc CROSS JOIN mx),
    kept AS (
      SELECT d.doc_id, d.source, d.toks FROM d JOIN rates USING (source)
      WHERE list_sum(list_transform(range(1, 14), i ->
              (strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR) || 'mix10'), i, 1)) - 1)
              * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 < rates.rate),
    sp AS (
      SELECT doc_id, source, toks,
             CASE WHEN list_sum(list_transform(range(1, 14), i ->
                    (strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR) || 'sp10'), i, 1)) - 1)
                    * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 < 0.9
                  THEN 'train' ELSE 'val' END AS split
      FROM kept),
    packed AS (
      SELECT doc_id, split, source,
             CAST(toks + 1 AS BIGINT) AS n_tokens,
             CAST(sum(toks + 1) OVER (
               PARTITION BY split, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS ending
      FROM sp)
    SELECT doc_id, split, source, n_tokens,
           ending - n_tokens AS start_offset,
           CAST(floor((ending - n_tokens) / 512.0) AS BIGINT) AS first_seq,
           CAST(floor((ending - 1) / 512.0) AS BIGINT) AS last_seq,
           CAST(floor((ending - 1) / 512.0)
                - floor((ending - n_tokens) / 512.0) + 1 AS BIGINT)
             AS n_seqs_spanned
    FROM packed ORDER BY doc_id
    """,
)
def pipeline_mix_split_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELECTION-TO-LAYOUT loop in one checked composition:
    mixture_weights (rates toward the 40/30/20/10 source target) ->
    apply_mixture (md5-uniform membership, salt 'mix10') -> hash_split
    (90/10 train/val, independent salt 'sp10') -> pack_sequences
    (per-(split, source) streams, seq_len 512) — what a pretraining
    data build actually runs after curation. Every stage is an
    md5-deterministic pure function of (id, group, rates), so the
    oracle replays the WHOLE composition per document: rates, kept
    membership, split assignment, and the exact packed placement
    (running sum in the same md5 order, identical floor arithmetic).
    One reassigned, re-split, or re-ordered document mismatches.
    Scale shape: two broadcast-joined small frames + one window per
    (split, source) group; the corpus text never shuffles (the packing
    window moves (id, n_tokens) only)."""
    from daft_spark.functions.text import token_count
    from daft_spark.operators.sampling import (
        apply_mixture,
        hash_split,
        mixture_weights,
        pack_sequences,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", "text",
        token_count(F.col("text")).cast("double").alias("toks"),
    )
    rates = mixture_weights(
        d, ["source"],
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        weight_col="toks",
    )
    kept = apply_mixture(d, rates, ["source"], id_col="doc_id", salt="mix10")
    sp = hash_split(
        kept, {"train": 0.9, "val": 0.1}, id_col="doc_id", salt="sp10"
    )
    return pack_sequences(
        sp, "text", "doc_id", seq_len=512, eod_tokens=1, by=["split", "source"]
    ).orderBy("doc_id")


@register(
    "pipeline_chunk_text",
    """
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents WHERE doc_id < 300),
    st AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - 8, 1) + 1, 24)) AS i
      FROM toks)
    SELECT doc_id,
           CAST((i - 1) / 24 AS INT) AS chunk_id,
           CAST(i - 1 AS INT) AS start_token,
           CAST(len(t[i:i+31]) AS INT) AS n_tokens,
           array_to_string(t[i:i+31], ' ') AS chunk_text
    FROM st ORDER BY doc_id, chunk_id
    """,
)
def pipeline_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-prep token-window chunking (operators/sampling.py
    chunk_text): 32-token windows with 8-token overlap (stride 24) —
    one row per chunk with its 0-based id, start offset, size, and the
    space-joined window text. Everything is in-row (token array +
    sequence of starts + slice/join fuse into one codegen projection;
    no shuffle, no UDF), and the oracle replays the identical
    tokenization, stride arithmetic (starts capped at n - overlap so
    no tail chunk is fully contained in its predecessor — r10 verdict
    task 4), and window slices — the chunk TEXT itself is
    value-checked, so an off-by-one in either the starts or the slice
    mismatches."""
    from daft_spark.operators.sampling import chunk_text

    return chunk_text(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 300),
        "text", "doc_id", chunk_tokens=32, overlap=8,
    ).orderBy("doc_id", "chunk_id")


@register(
    "text_top_ngrams",
    """
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             array_to_string(t[i:i+1], ' ') AS ngram
      FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i) u)
    SELECT ngram,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram ASC LIMIT 50
    """,
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-50 bigram frequencies (operators/repetition.py
    top_ngrams — the counting stage of vocabulary construction):
    occurrence AND document counts per n-gram, deterministic
    lexicographic tiebreak. The oracle replays the identical
    tokenization, in-row bigram assembly, and ordering; the plan is
    partial-agg + TakeOrderedAndProject (asserted in
    tests/test_plans.py), never a global sort."""
    from daft_spark.operators.repetition import top_ngrams

    return top_ngrams(_docs(spark, sf_dir), "text", "doc_id", n=2, k=50)


@register(
    "pipeline_dsir_weights",
    """
    WITH toks AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, source,
             unnest(list_concat(t,
               list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])))
               AS g
      FROM toks),
    b AS (
      SELECT doc_id, source,
             CAST(floor(
               list_sum(list_transform(range(1, 14), i ->
                 (strpos('0123456789abcdef',
                         substr(md5(g || 'dsir'), i, 1)) - 1)
                 * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 * 1024) AS INT)
               AS bucket
      FROM grams),
    qc AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket),
    pc AS (SELECT bucket, count(*) AS cnt_p FROM b WHERE source = 'src0'
           GROUP BY bucket),
    tot AS (
      SELECT (SELECT sum(cnt_p) FROM pc) AS np,
             (SELECT sum(cnt) FROM qc) AS nq),
    ratio AS (
      SELECT coalesce(qc.bucket, pc.bucket) AS bucket,
             ln((coalesce(cnt_p, 0) + 0.01) / (np + 0.01 * 1024))
             - ln((coalesce(cnt, 0) + 0.01) / (nq + 0.01 * 1024)) AS lr
      FROM qc FULL JOIN pc ON qc.bucket = pc.bucket CROSS JOIN tot)
    SELECT d.doc_id,
           CAST(count(b.bucket) AS BIGINT) AS n_grams,
           round(coalesce(sum(r.lr), 0.0), 6) AS log_weight
    FROM documents d
    LEFT JOIN b ON d.doc_id = b.doc_id
    LEFT JOIN ratio r ON b.bucket = r.bucket
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/dsir.py dsir_log_weights —
    Xie et al. 2023 importance resampling): every document's hashed
    unigram+bigram log p_target/q_raw weight toward the src0 domain.
    The oracle replays the identical tokenization, bigram assembly,
    52-bit md5 bucket hash, smoothed multinomials, and per-doc log-sum
    — every weight value-checked. Plan shape: two keys-only bucket
    aggregations + a broadcast ratio join; text never shuffles
    (asserted in tests/test_plans.py)."""
    from daft_spark.operators.dsir import dsir_log_weights

    d = _docs(spark, sf_dir)
    return dsir_log_weights(
        d, d.filter(F.col("source") == "src0")
    ).orderBy("doc_id")


@register(
    "pipeline_dsir_select",
    """
    WITH toks AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, source,
             unnest(list_concat(t,
               list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])))
               AS g
      FROM toks),
    b AS (
      SELECT doc_id, source,
             CAST(floor(
               list_sum(list_transform(range(1, 14), i ->
                 (strpos('0123456789abcdef',
                         substr(md5(g || 'dsir'), i, 1)) - 1)
                 * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 * 1024) AS INT)
               AS bucket
      FROM grams),
    qc AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket),
    pc AS (SELECT bucket, count(*) AS cnt_p FROM b WHERE source = 'src0'
           GROUP BY bucket),
    tot AS (
      SELECT (SELECT sum(cnt_p) FROM pc) AS np,
             (SELECT sum(cnt) FROM qc) AS nq),
    ratio AS (
      SELECT coalesce(qc.bucket, pc.bucket) AS bucket,
             ln((coalesce(cnt_p, 0) + 0.01) / (np + 0.01 * 1024))
             - ln((coalesce(cnt, 0) + 0.01) / (nq + 0.01 * 1024)) AS lr
      FROM qc FULL JOIN pc ON qc.bucket = pc.bucket CROSS JOIN tot),
    w AS (
      SELECT d.doc_id,
             CAST(count(b.bucket) AS BIGINT) AS n_grams,
             round(coalesce(sum(r.lr), 0.0), 6) AS log_weight
      FROM documents d
      LEFT JOIN b ON d.doc_id = b.doc_id
      LEFT JOIN ratio r ON b.bucket = r.bucket
      GROUP BY d.doc_id),
    u AS (
      SELECT doc_id, n_grams, log_weight,
             list_sum(list_transform(range(1, 14), i ->
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || 'dsirg'), i, 1))
                - 1) * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 AS x
      FROM w)
    SELECT doc_id, n_grams, log_weight,
           round(log_weight - ln(-ln(x)), 6) AS key
    FROM u ORDER BY key DESC, doc_id LIMIT 25
    """,
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel top-k selection (operators/dsir.py dsir_select —
    the paper's sampling-without-replacement): top-25 documents by
    log_weight + Gumbel(md5) noise toward the src0 domain. Exact
    oracle: the deterministic Gumbel draw and the (key desc, id)
    ordering replay bit-identically; the plan is
    TakeOrderedAndProject, never a global sort."""
    from daft_spark.operators.dsir import dsir_select

    d = _docs(spark, sf_dir)
    return dsir_select(d, d.filter(F.col("source") == "src0"), k=25)


@register(
    "text_bm25_topk",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    stats AS (
      SELECT count(*) AS n, avg(len(t)) AS avgdl,
             sum(CASE WHEN len(list_filter(t, x -> x = 'hash')) > 0
                 THEN 1 ELSE 0 END) AS df0,
             sum(CASE WHEN len(list_filter(t, x -> x = 'join')) > 0
                 THEN 1 ELSE 0 END) AS df1,
             sum(CASE WHEN len(list_filter(t, x -> x = 'spark')) > 0
                 THEN 1 ELSE 0 END) AS df2
      FROM toks),
    scored AS (
      SELECT doc_id, CAST(len(t) AS INT) AS doc_len,
             round(
               ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
                 * CAST(len(list_filter(t, x -> x = 'hash')) AS DOUBLE) * 2.2
                 / (CAST(len(list_filter(t, x -> x = 'hash')) AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
               + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
                 * CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) * 2.2
                 / (CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
               + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
                 * CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) * 2.2
                 / (CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * len(t) / avgdl)), 6) AS score,
             CAST((CASE WHEN len(list_filter(t, x -> x = 'hash')) > 0
                   THEN 1 ELSE 0 END)
                + (CASE WHEN len(list_filter(t, x -> x = 'join')) > 0
                   THEN 1 ELSE 0 END)
                + (CASE WHEN len(list_filter(t, x -> x = 'spark')) > 0
                   THEN 1 ELSE 0 END) AS INT) AS n_hit_terms
      FROM toks CROSS JOIN stats)
    SELECT doc_id, doc_len, score, n_hit_terms
    FROM scored WHERE n_hit_terms > 0
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 retrieval (operators/retrieval.py bm25_topk —
    Robertson/Lucene idf, k1=1.2 b=0.75) for the query
    'hash join spark' over the corpus. The oracle replays the exact
    per-term tf/df/idf arithmetic and the (score desc, id) tiebreak —
    every score value-checked to 6 decimals. Plan: one fixed-width
    stats aggregation broadcast onto a single corpus scan +
    TakeOrderedAndProject (asserted in tests/test_plans.py)."""
    from daft_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        _docs(spark, sf_dir), ["hash", "join", "spark"], k=20
    )


@register(
    "pipeline_quality_classifier",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_scored,
           TRUE AS auc_ge_090,
           TRUE AS scores_in_unit_interval
    FROM documents
    """,
    comparable=False,
)
def pipeline_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier curation stage (operators/classifier.py —
    the GPT-3/LLaMA recipe: logistic regression on hashed n-gram
    features, positives = target corpus, negatives = raw sample; score
    the whole corpus and filter). Trained here on a content-defined
    target (documents mentioning 'vector' >= 3 times) against docs
    with <= 1 mention, then scores EVERY document. Gradient sums are
    float-order dependent (weights carry ~1e-12 drift across
    partitionings), so the driver checks INVARIANTS computed from the
    real model + scores: row conservation (exact), ROC AUC >= 0.9 on
    the labeled subset (the classifier must actually recover the
    generating rule from hashed buckets; measured ~0.99), and every
    score inside [0, 1]."""
    from daft_spark.functions.text import words
    from daft_spark.operators.classifier import (
        quality_auc,
        score_quality,
        train_quality_classifier,
    )

    d = _docs(spark, sf_dir)
    vcnt = F.size(F.filter(words(F.col("text")), lambda t: t == F.lit("vector")))
    lab = d.select("doc_id", "text", vcnt.alias("__v"))
    train = lab.filter(F.col("doc_id") < 400)
    model = train_quality_classifier(
        train.filter(F.col("__v") >= 3),
        train.filter(F.col("__v") <= 1),
        iters=8,
    )
    scores = score_quality(d, model).persist()
    labels = lab.filter(F.col("__v") != 2).select(
        "doc_id", (F.col("__v") >= 3).alias("y")
    )
    auc = quality_auc(scores, labels)
    rng = scores.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("quality_score").alias("lo"),
        F.max("quality_score").alias("hi"),
    ).collect()[0]
    return spark.createDataFrame(
        [(rng["n"], bool(auc >= 0.9), bool(0.0 <= rng["lo"] and rng["hi"] <= 1.0))],
        "n_scored bigint, auc_ge_090 boolean, scores_in_unit_interval boolean",
    )


@register(
    "pipeline_temperature_mix",
    """
    WITH g AS (
      SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS c
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT 0.5 * sum(c) AS b FROM g),
    base AS (SELECT lang, c, sqrt(c) AS p, 1.0 * c AS cap FROM g),
    r AS (SELECT lang, c, p, cap, cap / p AS r FROM base),
    w AS (
      SELECT lang, c, p, cap, r,
             sum(cap) OVER (ORDER BY r, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cap AS sprev,
             sum(p) OVER (ORDER BY r, lang
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pafter,
             lag(r) OVER (ORDER BY r, lang) AS rprev
      FROM r
    ),
    cand AS (
      SELECT *,
             ((SELECT b FROM tot) - sprev) / pafter AS theta_cand
      FROM w
    ),
    theta AS (
      SELECT max(CASE WHEN (rprev IS NULL OR rprev <= theta_cand)
                       AND theta_cand < r
                      THEN theta_cand END) AS th
      FROM cand
    ),
    alloc AS (
      SELECT lang, c, cap, p,
             CASE WHEN (SELECT th FROM theta) IS NULL
                    OR r <= (SELECT th FROM theta)
                  THEN cap ELSE (SELECT th FROM theta) * p END AS a
      FROM r
    )
    SELECT lang, c AS weight, cap AS capacity,
           round(p / (SELECT sum(p) FROM base), 6) AS pref_share,
           round(a, 6) AS alloc,
           round(a / c, 6) AS epochs,
           round(a / (SELECT b FROM tot), 6) AS budget_share
    FROM alloc ORDER BY lang
    """,
)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax temperature-sampling budget allocation (operators/
    sampling.py temperature_mixture; Chung et al. 2023): per-language
    char weights, preference c^(1/2) (temperature 2 — IEEE-exact sqrt
    in any engine), epoch cap 1.0, budget = half the corpus. The
    closed-form water-filling (sort by cap/pref, cumulative sums, one
    consistent water level) is replayed verbatim by the oracle —
    a wrong saturation set or water level mismatches every allocation.
    The budget is derived from ONE collected aggregate row (audit-size;
    the corpus itself never leaves executors)."""
    from daft_spark.operators.sampling import temperature_mixture

    d = _docs(spark, sf_dir)
    total = d.agg(F.sum(F.col("n_chars").cast("double"))).collect()[0][0]
    return temperature_mixture(
        d, ["lang"], budget=0.5 * float(total),
        temperature=2.0, max_epochs=1.0, weight_col="n_chars",
    ).orderBy("lang")


@register(
    "pipeline_length_histogram",
    """
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    )
    SELECT CAST(length(bin(n)) - 1 AS INT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(min(n) AS BIGINT) AS min_tokens,
           CAST(max(n) AS BIGINT) AS max_tokens,
           CAST(sum((n + 63) // 64 * 64 - n) AS BIGINT) AS pad_tokens,
           round(sum((n + 63) // 64 * 64 - n)
                 / (sum((n + 63) // 64 * 64 - n) + sum(n)), 6) AS pad_frac
    FROM t WHERE n >= 1
    GROUP BY bucket ORDER BY bucket
    """,
)
def pipeline_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length audit for packing decisions (operators/
    sampling.py length_histogram): log2 buckets of per-doc token
    counts via bit-length integer arithmetic (no floating log2) plus
    the padding waste a one-doc-per-sequence layout pays at context
    64. Pure integer math end to end — the oracle replays it
    digit-exactly."""
    from daft_spark.operators.sampling import length_histogram

    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return length_histogram(d, "n_tokens", context_len=64)


@register(
    "text_top_ngrams_sketch",
    """
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             array_to_string(t[i:i+1], ' ') AS ngram
      FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i) u)
    SELECT CAST(count(*) AS BIGINT) AS n_grams,
           TRUE AS bounds_hold,
           TRUE AS heavy_covered,
           TRUE AS nonvacuous
    FROM g
    """,
    comparable=False,
)
def text_top_ngrams_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy-hitter sketch over corpus bigrams (operators/
    repetition.py top_ngrams_sketch) checked against the EXACT counts:
    (a) every sketched estimate obeys the MG sandwich true -
    floor(N/(cap+1)) <= est <= true, and (b) every gram whose exact
    count exceeds the error bound appears in the merged summary — the
    published guarantees, verified from the real output (the
    dedup_resolve invariant pattern; per-partition summaries are not
    SQL-replicable). The oracle recomputes the exact total gram count
    N cross-engine, so a tokenization or stream-length drift also
    mismatches. capacity=2000 caps executor memory regardless of
    corpus size — the 100 TB contract."""
    from daft_spark.operators.repetition import top_ngrams_sketch

    d = _docs(spark, sf_dir)
    sk = top_ngrams_sketch(
        d, "text", "doc_id", n=2, k=1_000_000, capacity=2000
    ).persist()
    from daft_spark.operators.repetition import _gram_rows

    exact = (
        _gram_rows(d, "text", "doc_id", 2)
        .select(F.col("__g").alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("true_count"))
    ).persist()
    n_grams = exact.agg(F.sum("true_count").cast("long").alias("n_grams"))
    joined = sk.join(exact, "ngram", "left")
    bounds = joined.agg(
        F.min(
            (F.col("est_count") <= F.col("true_count"))
            & (F.col("est_count") >= F.col("true_count") - F.col("err_bound"))
        ).alias("bounds_hold")
    )
    bound_row = sk.agg(F.max("err_bound").alias("__b"))
    heavy = (
        exact.crossJoin(F.broadcast(bound_row))
        .filter(F.col("true_count") > F.col("__b"))
        .join(sk.select("ngram", F.lit(1).alias("__in")), "ngram", "left")
        .agg(
            F.min(F.col("__in").isNotNull()).alias("heavy_covered"),
            (F.count(F.lit(1)) > 0).alias("nonvacuous"),
        )
    )
    return (
        n_grams.crossJoin(F.broadcast(bounds)).crossJoin(F.broadcast(heavy))
    )


@register(
    "pipeline_corpus_curation_v3",
    """
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    lined AS (
      SELECT doc_id, lang,
             list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS INT)), i ->
               array_to_string(toks[i * 12 + 1 : (i + 1) * 12], ' ')) AS lines
      FROM t),
    ex AS (
      SELECT doc_id, lang, unnest(lines) AS line,
             generate_subscripts(lines, 1) AS i
      FROM lined),
    marked AS (
      SELECT doc_id, lang, line, i,
             count(*) OVER (PARTITION BY line) AS cnt
      FROM ex),
    rebuilt AS (
      SELECT doc_id, lang, string_agg(line, chr(10) ORDER BY i) AS clean
      FROM marked WHERE cnt < 2 GROUP BY doc_id, lang),
    survivors AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(clean, '[ \n]')) AS BIGINT) AS tok
      FROM rebuilt
      WHERE len(string_split_regex(clean, '[ \n]')) >= 20),
    g AS (SELECT lang, CAST(sum(tok) AS DOUBLE) AS c FROM survivors GROUP BY lang),
    tot AS (SELECT 0.5 * sum(c) AS b FROM g),
    r AS (SELECT lang, c, sqrt(c) AS p, 1.0 * c AS cap,
                 (1.0 * c) / sqrt(c) AS r FROM g),
    w AS (
      SELECT lang, c, p, cap, r,
             sum(cap) OVER (ORDER BY r, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cap AS sprev,
             sum(p) OVER (ORDER BY r, lang
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pafter,
             lag(r) OVER (ORDER BY r, lang) AS rprev
      FROM r),
    cand AS (
      SELECT *, ((SELECT b FROM tot) - sprev) / pafter AS theta_cand FROM w),
    theta AS (
      SELECT max(CASE WHEN (rprev IS NULL OR rprev <= theta_cand)
                       AND theta_cand < r THEN theta_cand END) AS th
      FROM cand),
    rates AS (
      SELECT lang,
             round(CASE WHEN (SELECT th FROM theta) IS NULL
                          OR r <= (SELECT th FROM theta)
                        THEN cap
                        ELSE (SELECT th FROM theta) * p END / c, 6) AS rate
      FROM r),
    sel AS (
      SELECT s.doc_id, s.lang, s.tok
      FROM survivors s JOIN rates USING (lang)
      WHERE list_sum(list_transform(range(1, 14), i ->
              (strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR) || 'v3'), i, 1)) - 1)
              * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 < rates.rate)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS tok_sum,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM sel GROUP BY lang ORDER BY lang
    """,
)
def pipeline_corpus_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEW-FAMILY curation loop in one checked composition:
    corpus-level line dedup (remove-all boilerplate, RefinedWeb mode)
    -> min-length quality gate on the CLEANED text -> UniMax
    temperature-2 budget allocation over languages (budget = half the
    surviving token mass) -> apply_mixture materializing the epochs as
    md5-membership rates (salt 'v3'). Every stage is deterministic, so
    the oracle replays the WHOLE pipeline — line counting, keep
    decisions, string rebuild, token gating, the water-filling level,
    the 6-dp rates, and each document's membership draw — and compares
    per-language doc counts, token mass, and the id-sum membership
    digest. One resurrected line or reassigned document mismatches.
    Scale shape: line hashes shuffle keys-only, water-filling runs on
    the #langs audit frame, rates broadcast — the corpus never
    shuffles."""
    from daft_spark.operators.dedup import remove_duplicated_lines
    from daft_spark.operators.sampling import apply_mixture, temperature_mixture

    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    nl = F.ceil(F.size(toks) / F.lit(12.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 12 + 1, 12)),
    )
    lined = d.select("doc_id", "lang", F.concat_ws("\n", lines).alias("text"))
    deduped = remove_duplicated_lines(
        lined, "text", "doc_id", sep="\n", min_occurrences=2, keep="none"
    )
    survivors = (
        deduped.filter(F.col("clean_text") != "")
        .join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("clean_text"), "[ \n]")).cast("long").alias("tok"),
        )
        .filter(F.col("tok") >= 20)
    )
    survivors = survivors.persist()
    total = survivors.agg(F.sum(F.col("tok").cast("double"))).collect()[0][0]
    if total is None:
        # an all-duplicate corpus (e.g. a x10 replicated fixture) leaves
        # no survivors; the mix over an empty frame is empty
        return survivors.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("tok_sum"),
            F.sum("doc_id").alias("id_sum"),
        )
    tm = temperature_mixture(
        survivors, ["lang"], budget=0.5 * float(total),
        temperature=2.0, max_epochs=1.0, weight_col="tok",
    )
    rates = tm.select("lang", F.col("epochs").alias("sample_rate"))
    sel = apply_mixture(survivors, rates, ["lang"], id_col="doc_id", salt="v3")
    return (
        sel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("tok_sum"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


@register(
    "pipeline_bpe_train",
    """
    WITH w AS (
      SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS word
      FROM documents)
    SELECT CAST(count(DISTINCT word) AS BIGINT) AS n_words,
           10 AS n_merges,
           TRUE AS roundtrip_ok,
           TRUE AS compressed,
           TRUE AS serving_parity
    FROM w WHERE word <> ''
    """,
    comparable=False,
)
def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE-merge training (operators/bpe_train.py,
    Sennrich et al. 2016): 10 merges learned from the corpus word
    table, checked against the algorithm's defining invariants from
    the REAL output — lossless segmentation (every word's final
    symbols concatenate back to the word), strict compression (the
    merged table holds fewer total symbols than the char-split
    start), and serving parity (re-applying the learned merge list
    to a fresh char split reproduces the training-final segmentation
    EXACTLY — the determinism a deployed vocabulary needs). The
    argmax-per-round loop is not SQL-replicable; the oracle instead
    recomputes the distinct-word count cross-engine so the trained
    table's fixture is verified too."""
    from daft_spark.operators.bpe_train import (
        bpe_apply_merges,
        bpe_train,
    )

    d = _docs(spark, sf_dir)
    merges, final = bpe_train(d, "text", num_merges=10)
    final = final.persist()
    n_words = final.agg(F.count(F.lit(1)).alias("n_words"))
    roundtrip = final.agg(
        F.min(F.concat_ws("", F.col("syms")) == F.col("word")).alias("roundtrip_ok")
    )
    totals = final.agg(
        (F.sum(F.size("syms")) < F.sum(F.length("word"))).alias("compressed")
    )
    from daft_spark.operators.bpe_train import char_split

    fresh = final.select("word", "freq", char_split(F.col("word")).alias("syms"))
    reapplied = bpe_apply_merges(fresh, merges).select(
        "word", F.col("syms").alias("syms2")
    )
    parity = (
        final.join(reapplied, "word")
        .agg(F.min(F.col("syms") == F.col("syms2")).alias("serving_parity"))
    )
    n_merges = spark.range(1).select(
        F.lit(len(merges)).cast("int").alias("n_merges")
    )
    return (
        n_words.crossJoin(F.broadcast(n_merges))
        .crossJoin(F.broadcast(roundtrip))
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(parity))
    )


@register(
    "text_winnow_fingerprints",
    """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS s
      FROM documents),
    h AS (
      SELECT doc_id,
             list_transform(range(1, len(s) - 8 + 2), i ->
               CAST(list_sum(list_transform(range(1, 14), j ->
                 (strpos('0123456789abcdef',
                         substr(md5(substr(s, i, 8)), j, 1)) - 1)
                 * 2.0 ** (4 * (13 - j)))) AS BIGINT)) AS hs
      FROM n WHERE len(s) >= 11),
    w AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3])))) AS fps
      FROM h)
    SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp
    FROM w ORDER BY doc_id, fp
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators/winnow.py — Schleimer et al.
    2003, the MOSS selection): md5-52bit hashes of char 8-grams over
    the normalized text, minimum of each 4-hash window, distinct per
    doc. In-row column expressions only (no UDF, text never shuffles);
    the oracle replays every hash, window minimum, and the k+w-1
    length domain condition bit-exactly."""
    from daft_spark.operators.winnow import winnow_fingerprints

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return winnow_fingerprints(d, "text", "doc_id", k=8, w=4).orderBy(
        "doc_id", "fp"
    )


@register(
    "text_source_divergence",
    """
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
    st AS (SELECT source, sum(n) AS tot FROM c GROUP BY 1),
    lt AS (SELECT lang, sum(n) AS ln_ FROM c GROUP BY 1),
    tot AS (SELECT sum(n) AS all_n FROM c),
    grid AS (
      SELECT s.source, l.lang, s.tot,
             coalesce(c.n, 0) AS n, l.ln_, t.all_n
      FROM (SELECT DISTINCT source, tot FROM st) s
      CROSS JOIN (SELECT DISTINCT lang, ln_ FROM lt) l
      CROSS JOIN tot t
      LEFT JOIN c ON c.source = s.source AND c.lang = l.lang),
    pq AS (
      SELECT source, lang,
             CAST(n AS DOUBLE) / tot AS p,
             CAST(ln_ AS DOUBLE) / all_n AS q
      FROM grid)
    SELECT source,
           round(sum(CASE WHEN p > 0 THEN p * ln(p / q) ELSE 0 END), 6)
             AS kl_pq,
           round(0.5 * sum(CASE WHEN p > 0
                                THEN p * ln(p / ((p + q) / 2)) ELSE 0 END)
                 + 0.5 * sum(q * ln(q / ((p + q) / 2))), 6) AS js,
           CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_langs
    FROM pq GROUP BY source ORDER BY source
    """,
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-COMPOSITION AUDIT: per-source language-distribution
    divergence from the corpus — KL(p_source || q_corpus) and
    Jensen-Shannon (finite even where a source misses languages) —
    the drift metric data-mixing recipes monitor per shard/snapshot.
    Pure aggregations over (source, lang) counts: two tiny groupBys +
    a dimension-grid join; the document text never moves. The oracle
    replays both divergences term-for-term (natural log, zero-p terms
    dropped from KL, q-side terms always present in JS)."""
    d = load_table(spark, sf_dir, "documents")
    # The (source, lang, n) contingency table is provably tiny
    # (n_sources x n_langs rows) and the plan below reads it four
    # times — collect it once and rebuild as a local DataFrame instead
    # of persist(): same single computation, no cached blocks left
    # behind in a long-lived session.
    c_rows = (
        d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    c = spark.createDataFrame(c_rows, "source string, lang string, n long")
    st = c.groupBy("source").agg(F.sum("n").alias("tot"))
    lt = c.groupBy("lang").agg(F.sum("n").alias("ln_"))
    all_n = c.agg(F.sum("n").alias("all_n"))
    grid = (
        st.crossJoin(lt)
        .crossJoin(F.broadcast(all_n))
        .join(c, ["source", "lang"], "left")
        .select(
            "source", "lang",
            (F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("tot")
             ).alias("p"),
            (F.col("ln_").cast("double") / F.col("all_n")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    return (
        grid.groupBy("source")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("p") > 0,
                        F.col("p") * F.log(F.col("p") / F.col("q")),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            ).alias("kl_pq"),
            F.round(
                F.lit(0.5)
                * F.sum(
                    F.when(
                        F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)
                    ).otherwise(F.lit(0.0))
                )
                + F.lit(0.5) * F.sum(F.col("q") * F.log(F.col("q") / m)),
                6,
            ).alias("js"),
            F.sum(F.when(F.col("p") > 0, 1).otherwise(0)).alias("n_langs"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_calibrated_filter",
    """
    WITH m AS (
      SELECT doc_id, source,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                  AS DOUBLE) / greatest(length(text), 1) AS pr
      FROM documents),
    c AS (
      SELECT source, quantile_cont(pr, 0.7) AS cutoff FROM m GROUP BY source)
    SELECT m.source, CAST(count(*) AS BIGINT) AS n_kept,
           round(any_value(c.cutoff), 6) AS cutoff
    FROM m JOIN c ON m.source = c.source
    WHERE m.pr <= c.cutoff
    GROUP BY m.source ORDER BY m.source
    """,
)
def pipeline_calibrated_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE CALIBRATED quality filter (operators/sampling.py
    calibrated_group_filter): each source keeps its own cleanest 70%
    by punctuation ratio — the adaptive-threshold curation move (one
    global cutoff over-prunes clean domains, under-prunes noisy ones).
    Exact per-group percentile cutoffs broadcast back; the oracle
    replays metric, quantile_cont cutoff, and membership exactly."""
    from daft_spark.operators.sampling import calibrated_group_filter

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", punct_ratio(F.col("text")).alias("pr")
    )
    kept = calibrated_group_filter(d, "pr", "source", 0.7, keep="below")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.any_value("cutoff"), 6).alias("cutoff"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_curriculum_order",
    f"""
    WITH m AS (
      SELECT doc_id,
             (CASE WHEN len({_TOKS_SQL}) BETWEEN 5 AND 100000
                   THEN 0.25 ELSE 0.0 END
            + CASE WHEN CAST(coalesce(list_sum(
                     [length(t) FOR t IN {_TOKS_SQL}]), 0) AS DOUBLE)
                     / greatest(len({_TOKS_SQL}), 1) BETWEEN 2.0 AND 12.0
                   THEN 0.25 ELSE 0.0 END
            + CASE WHEN CAST(length(regexp_replace(text, '[A-Za-z0-9 ]',
                     '', 'g')) AS DOUBLE) / greatest(length(text), 1) <= 0.2
                   THEN 0.25 ELSE 0.0 END
            + CASE WHEN CAST(len(list_filter({_TOKS_SQL},
                     t -> list_contains({_SW_SQL}, t))) AS DOUBLE)
                     / greatest(len({_TOKS_SQL}), 1) >= 0.01
                   THEN 0.25 ELSE 0.0 END) AS q
      FROM documents),
    u AS (
      SELECT doc_id, q,
             list_sum(list_transform(range(1, 14), i ->
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR) || 'curriculum'),
                              i, 1)) - 1)
               * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 AS x
      FROM m)
    SELECT doc_id, q AS quality_bucket,
           CAST(row_number() OVER (ORDER BY q DESC, x, doc_id) AS BIGINT)
             AS curriculum_rank
    FROM u ORDER BY curriculum_rank
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM DATA ORDERING (operators/sampling.py
    curriculum_order): global training order = quality bucket
    descending (the composite C4/Gopher score), md5-shuffled within a
    bucket — computed WITHOUT a global sort (per-bucket row_number +
    broadcast bucket offsets; no single-partition window). The oracle
    replays the bucket score, the md5 shuffle key, and the dense
    1-based global rank exactly."""
    from daft_spark.operators.sampling import curriculum_order

    d = _docs(spark, sf_dir).select(
        "doc_id", quality_score(F.col("text")).alias("quality_bucket")
    )
    out = curriculum_order(d, "quality_bucket", "doc_id")
    return out.select(
        "doc_id", "quality_bucket",
        F.col("curriculum_rank"),
    ).orderBy("curriculum_rank")


@register(
    "text_zipf_audit",
    """
    WITH toks AS (
      SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
             ' ')) AS t
      FROM documents),
    counts AS (
      SELECT t, count(*) AS c FROM toks WHERE t <> '' GROUP BY t),
    top AS (
      SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS r
      FROM counts ORDER BY c DESC, t LIMIT 1000),
    stats AS (
      SELECT regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE)))
               AS slope,
             regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))) AS r2,
             max(CASE WHEN r = 1 THEN c END) AS c1,
             sum(c) AS ctot,
             count(*) AS k
      FROM top)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM counts)
             AS n_distinct_tokens,
           CAST(k AS BIGINT) AS top_k,
           round(slope, 6) AS zipf_slope,
           round(r2, 6) AS zipf_r2,
           round(CAST(c1 AS DOUBLE) / ctot, 6) AS top1_share
    FROM stats
    """,
)
def text_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-HEALTH Zipf audit (operators/repetition.py zipf_audit):
    OLS fit of ln(count) ~ ln(rank) over the top-1000 unigrams plus
    the top-1 token share — the per-shard drift alarm run beside
    text_source_divergence (template spam or a broken extractor bends
    the curve long before eyeballs catch it). Token counts collapse
    map-side (Zipf itself shrinks the exchange), the fit runs over
    1000 rows. The oracle replays tokenization, counts, deterministic
    tie-ranked top-k, and the regression sums exactly (both engines'
    regr_slope/regr_r2 are the same OLS arithmetic; round-6 absorbs
    summation-order digits)."""
    from daft_spark.operators.repetition import zipf_audit

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return zipf_audit(d, "text", "doc_id", top_k=1000)


@register(
    "pipeline_corpus_curation_v4",
    """
    WITH RECURSIVE corpus AS (
      SELECT doc_id, source, text FROM documents
      WHERE doc_id % 7 <> 0 AND length(text) >= 50),
    norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS s
      FROM documents),
    hh AS (
      SELECT doc_id,
             list_transform(range(1, len(s) - 8 + 2), i ->
               CAST(list_sum(list_transform(range(1, 14), j ->
                 (strpos('0123456789abcdef',
                         substr(md5(substr(s, i, 8)), j, 1)) - 1)
                 * 2.0 ** (4 * (13 - j)))) AS BIGINT)) AS hs
      FROM norm WHERE len(s) >= 11),
    fp_all AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3])))) AS fp
      FROM hh),
    uniq AS (SELECT min(doc_id) AS rep, text FROM corpus GROUP BY text),
    rep_fp AS (
      SELECT f.doc_id, f.fp FROM fp_all f JOIN uniq u ON u.rep = f.doc_id),
    rare AS (SELECT fp FROM rep_fp GROUP BY fp HAVING count(*) <= 200),
    kept AS (SELECT r.doc_id, r.fp FROM rep_fp r JOIN rare USING (fp)),
    wn AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2),
    star AS (
      SELECT u.rep AS id_a, c.doc_id AS id_b
      FROM corpus c JOIN uniq u ON c.text = u.text AND c.doc_id <> u.rep),
    edges AS (
      SELECT id_a, id_b FROM wn UNION SELECT id_b, id_a FROM wn
      UNION SELECT id_a, id_b FROM star UNION SELECT id_b, id_a FROM star),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.id_b, r.lbl FROM reach r JOIN edges e ON e.id_a = r.node),
    clu AS (SELECT node AS doc_id, min(lbl) AS cluster_id
            FROM reach GROUP BY node),
    ranked AS (
      SELECT c.doc_id, c.cluster_id,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY length(d.text) DESC, c.doc_id)
               AS rn
      FROM clu c JOIN corpus d ON d.doc_id = c.doc_id),
    keepers AS (SELECT doc_id FROM ranked WHERE rn = 1),
    bfp AS (
      SELECT DISTINCT fp FROM fp_all WHERE doc_id % 7 = 0),
    shared AS (
      SELECT f.doc_id, count(*) AS n_shared
      FROM fp_all f JOIN keepers k ON k.doc_id = f.doc_id
      JOIN bfp USING (fp)
      GROUP BY f.doc_id),
    final AS (
      SELECT k.doc_id FROM keepers k
      LEFT JOIN shared s ON s.doc_id = k.doc_id
      WHERE coalesce(s.n_shared, 0) < 2)
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(count(k.doc_id) AS BIGINT) AS n_kept,
           CAST(count(k.doc_id) - count(f.doc_id) AS BIGINT)
             AS n_contaminated,
           CAST(count(f.doc_id) AS BIGINT) AS n_final,
           CAST(coalesce(sum(CASE WHEN f.doc_id IS NOT NULL
                             THEN length(c.text) END), 0) AS BIGINT)
             AS chars_final
    FROM corpus c
    LEFT JOIN keepers k ON k.doc_id = c.doc_id
    LEFT JOIN final f ON f.doc_id = c.doc_id
    GROUP BY c.source ORDER BY c.source
    """,
)
def pipeline_corpus_curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WINNOW-FAMILY curation loop in one checked composition
    (r13's capstone, the v1/v2/v3 convention): min-length gate ->
    exact collapse -> winnow pair mining over reps -> connected
    components -> BEST-QUALITY keeper per cluster (longest text, min
    id ties) -> winnow decontamination of the keepers against the
    benchmark split (doc_id % 7 == 0) -> per-source funnel report
    (docs in, kept, contaminated, final, chars). Every stage is
    deterministic (md5-52 fingerprints, length ranking), so the
    oracle replays the ENTIRE pipeline — one lost edge, a wrong
    keeper, or a missed contamination flag shifts a funnel count and
    hash-mismatches. Scale: text rides no exchange (collapse keys,
    (doc,fp) index rows, id-only CC labels); benchmark fps broadcast;
    the funnel is three id-keyed joins + one groupBy."""
    from daft_spark.operators.dedup import (
        exact_dedup,
        near_dup_resolve,
        resolve_keep_best,
    )
    from daft_spark.operators.winnow import (
        winnow_decontaminate,
        winnow_similarity,
    )

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    bench = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(
        (F.col("doc_id") % 7 != 0) & (F.length("text") >= 50)
    )
    reps = exact_dedup(corpus.select("doc_id", "text"), ["text"], "doc_id")
    edges = winnow_similarity(
        reps, "text", "doc_id", k=8, w=4, min_shared=2, max_doc_freq=200
    ).select("id_a", "id_b")
    clustered = near_dup_resolve(
        corpus.select("doc_id", "text"), "text", "doc_id",
        edge_sources=(), extra_edges=edges,
    ).join(corpus.select("doc_id", F.length("text").alias("__ql")), "doc_id")
    keepers = (
        resolve_keep_best(clustered, "__ql", "doc_id")
        .filter(F.col("is_kept"))
        .select("doc_id")
    )
    kept_docs = corpus.join(keepers, "doc_id")
    dec = winnow_decontaminate(
        kept_docs, bench, "text", "doc_id", k=8, w=4, min_shared=2
    )
    final_ids = dec.filter(~F.col("contaminated")).select("doc_id")
    funnel = (
        corpus.select("doc_id", "source", F.length("text").alias("__chars"))
        .join(keepers.withColumn("__k", F.lit(1)), "doc_id", "left")
        .join(final_ids.withColumn("__f", F.lit(1)), "doc_id", "left")
    )
    return (
        funnel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.count("__k").alias("n_kept"),
            (F.count("__k") - F.count("__f")).alias("n_contaminated"),
            F.count("__f").alias("n_final"),
            F.coalesce(
                F.sum(F.when(F.col("__f").isNotNull(), F.col("__chars"))),
                F.lit(0),
            ).alias("chars_final"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_pack_audit",
    """
    WITH n AS (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '[a-za-z0-9]+')) + 1 AS nt
      FROM documents),
    c AS (
      SELECT doc_id, source, nt,
             sum(nt) OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS e
      FROM n),
    p AS (
      SELECT source, nt, e,
             (e - nt) // 2048 AS first_seq,
             (e - 1) // 2048 AS last_seq
      FROM c)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(max(last_seq) + 1 AS BIGINT) AS n_sequences,
           round(sum(nt) / ((max(last_seq) + 1) * 2048.0), 6) AS fill_rate,
           CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_straddling,
           round(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
                 / (1.0 * count(*)), 6) AS straddle_rate,
           CAST(sum(e - least(e, (first_seq + 1) * 2048)) AS BIGINT)
             AS trunc_loss_tokens,
           round(sum(e - least(e, (first_seq + 1) * 2048))
                 / (1.0 * sum(nt)), 6) AS trunc_loss_rate,
           CAST(sum(CASE WHEN last_seq = first_seq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_span1,
           CAST(sum(CASE WHEN last_seq - first_seq = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_span2,
           CAST(sum(CASE WHEN last_seq - first_seq >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_span3plus
    FROM p GROUP BY source ORDER BY source
    """,
)
def pipeline_pack_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACKING-EFFICIENCY audit (operators/sampling.py
    pack_efficiency_audit) over the pipeline_pack_sequences plan:
    per-source fill rate (padding waste = final partial sequence
    only), boundary-straddle rate, the token loss a
    truncate-at-boundary loader would pay instead, and the
    sequences-spanned histogram — the numbers that pick seq_len and
    the packing policy before a 100 TB tokenization run. The oracle
    replays the token counts, md5 packing order, running sums, and
    every boundary aggregate exactly."""
    from daft_spark.operators.sampling import pack_efficiency_audit

    return pack_efficiency_audit(
        _docs(spark, sf_dir), "text", "doc_id",
        seq_len=2048, eod_tokens=1, by=["source"],
    ).orderBy("source")


@register(
    "pipeline_corpus_curation_v5",
    """
WITH RECURSIVE corpus AS (
  SELECT doc_id, source, text FROM documents
  WHERE doc_id >= 32 AND length(text) >= 50),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS s
  FROM documents),
hh AS (
  SELECT doc_id,
         list_transform(range(1, len(s) - 8 + 2), i ->
           CAST(list_sum(list_transform(range(1, 14), j ->
             (strpos('0123456789abcdef',
                     substr(md5(substr(s, i, 8)), j, 1)) - 1)
             * 2.0 ** (4 * (13 - j)))) AS BIGINT)) AS hs
  FROM norm WHERE len(s) >= 11),
fp_all AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3])))) AS fp
  FROM hh),
uniq AS (SELECT min(doc_id) AS rep, text FROM corpus GROUP BY text),
rep_fp AS (
  SELECT f.doc_id, f.fp FROM fp_all f JOIN uniq u ON u.rep = f.doc_id),
rare AS (SELECT fp FROM rep_fp GROUP BY fp HAVING count(*) <= 50),
kept AS (SELECT r.doc_id, r.fp FROM rep_fp r JOIN rare USING (fp)),
wn AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 20),
star AS (
  SELECT u.rep AS id_a, c.doc_id AS id_b
  FROM corpus c JOIN uniq u ON c.text = u.text AND c.doc_id <> u.rep),
edges AS (
  SELECT id_a, id_b FROM wn UNION SELECT id_b, id_a FROM wn
  UNION SELECT id_a, id_b FROM star UNION SELECT id_b, id_a FROM star),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.id_b, r.lbl FROM reach r JOIN edges e ON e.id_a = r.node),
clu AS (SELECT node AS doc_id, min(lbl) AS cluster_id
        FROM reach GROUP BY node),
ranked AS (
  SELECT c.doc_id, c.cluster_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY length(d.text) DESC, c.doc_id) AS rn
  FROM clu c JOIN corpus d ON d.doc_id = c.doc_id),
keepers AS (SELECT doc_id FROM ranked WHERE rn = 1),
bfp AS (
  SELECT DISTINCT fp FROM fp_all WHERE doc_id < 32),
nfp AS (
  SELECT f.doc_id, count(*) AS total
  FROM fp_all f JOIN keepers k ON k.doc_id = f.doc_id GROUP BY 1),
shared AS (
  SELECT f.doc_id, count(*) AS n_shared
  FROM fp_all f JOIN keepers k ON k.doc_id = f.doc_id
  JOIN bfp USING (fp)
  GROUP BY f.doc_id),
final AS (
  SELECT k.doc_id FROM keepers k
  LEFT JOIN nfp t ON t.doc_id = k.doc_id
  LEFT JOIN shared s ON s.doc_id = k.doc_id
  WHERE NOT (coalesce(t.total, 0) > 0 AND
             CAST(coalesce(s.n_shared, 0) AS DOUBLE)
               / coalesce(t.total, 1) >= 0.95)),
curated AS (
  SELECT c.doc_id, c.source, c.text,
         CAST(len(regexp_extract_all(lower(c.text), '[a-z0-9]+'))
              AS DOUBLE) AS toks
  FROM corpus c JOIN final f ON f.doc_id = c.doc_id),
g AS (SELECT source, sum(toks) AS weight FROM curated GROUP BY source),
tot AS (SELECT sum(weight) AS t FROM g),
tgt(source, share) AS (VALUES
  ('src0', 0.4 / 1.0), ('src1', 0.3 / 1.0),
  ('src2', 0.2 / 1.0), ('src3', 0.1 / 1.0)),
sc AS (
  SELECT g.source, g.weight / tot.t AS cur,
         coalesce(tgt.share, 0.0) AS tshare
  FROM g CROSS JOIN tot LEFT JOIN tgt USING (source)),
mx AS (SELECT max(CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) AS m
       FROM sc),
rates AS (
  SELECT source,
         round(CASE WHEN mx.m > 0
               THEN (CASE WHEN cur > 0 THEN tshare / cur ELSE 0 END) / mx.m
               ELSE 0 END, 6) AS rate
  FROM sc CROSS JOIN mx),
mixed AS (
  SELECT c.doc_id, c.source, c.toks FROM curated c
  JOIN rates USING (source)
  WHERE list_sum(list_transform(range(1, 14), i ->
          (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR) || 'mix14'), i, 1)) - 1)
          * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 < rates.rate),
sp AS (
  SELECT doc_id, source, toks,
         CASE WHEN list_sum(list_transform(range(1, 14), i ->
                (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR) || 'sp14'), i, 1)) - 1)
                * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 < 0.9
              THEN 'train' ELSE 'val' END AS split
  FROM mixed),
packed AS (
  SELECT doc_id, split, source,
         CAST(toks + 1 AS BIGINT) AS nt,
         CAST(sum(toks + 1) OVER (PARTITION BY split, source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
  FROM sp),
place AS (
  SELECT split, source, nt, e,
         CAST((e - nt) // 512 AS BIGINT) AS first_seq,
         CAST((e - 1) // 512 AS BIGINT) AS last_seq
  FROM packed)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       CAST(max(last_seq) + 1 AS BIGINT) AS n_sequences,
       round(sum(nt) / ((max(last_seq) + 1) * 512.0), 6) AS fill_rate,
       CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddling,
       round(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
             / (1.0 * count(*)), 6) AS straddle_rate,
       CAST(sum(e - least(e, (first_seq + 1) * 512)) AS BIGINT)
         AS trunc_loss_tokens,
       round(sum(e - least(e, (first_seq + 1) * 512))
             / (1.0 * sum(nt)), 6) AS trunc_loss_rate
FROM place GROUP BY split, source ORDER BY split, source
    """,
)
def pipeline_corpus_curation_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURATION -> LAYOUT -> AUDIT in one checked composition: the v4
    winnow-curation chain (tighter mining: min_shared=20 rare
    fingerprints, doc-freq cut 50 — over the boilerplate-heavy
    synthetic corpus the v4 defaults collapse everything into ONE
    cluster and the count-based decontamination rule flags every doc,
    see COVERAGE.md r14 notes) -> PROPORTIONAL winnow decontamination
    (contaminated iff >= 95% of a keeper's fingerprints appear in the
    benchmark split, doc_id < 32 — an ABSOLUTE-size benchmark, the
    realistic semantics: a benchmark is a fixed external artifact
    that does NOT grow with the corpus. The r14 scale receipts
    caught both degenerate alternatives: a 1/7 split's fingerprints
    cover the whole template corpus at sf1+ and a 1% split covers it
    by sf10 — every keeper flagged, funnel empty) ->
    mixture_weights toward the 40/30/20/10 source
    target computed over the CURATED corpus -> apply_mixture (salt
    'mix14') -> hash_split 90/10 (salt 'sp14') -> pack_sequences per
    (split, source) at seq_len 512 -> pack_efficiency_audit. The
    oracle replays the ENTIRE chain — fingerprints, closure, keeper
    ranking, proportional contamination, rates, membership, split,
    packing order, and every audit aggregate; one mis-kept or
    mis-packed document shifts a count and mismatches. Scale: text
    rides no exchange anywhere; the packing window moves
    (id, n_tokens) rows only; rates and benchmark fps broadcast."""
    from daft_spark.functions.text import token_count
    from daft_spark.operators.dedup import (
        exact_dedup,
        near_dup_resolve,
        resolve_keep_best,
    )
    from daft_spark.operators.sampling import (
        apply_mixture,
        hash_split,
        mixture_weights,
        pack_efficiency_audit,
    )
    from daft_spark.operators.winnow import (
        winnow_decontaminate,
        winnow_similarity,
    )

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    bench = d.filter(F.col("doc_id") < 32)
    corpus = d.filter(
        (F.col("doc_id") >= 32) & (F.length("text") >= 50)
    )
    reps = exact_dedup(corpus.select("doc_id", "text"), ["text"], "doc_id")
    edges = winnow_similarity(
        reps, "text", "doc_id", k=8, w=4, min_shared=20, max_doc_freq=50
    ).select("id_a", "id_b")
    clustered = near_dup_resolve(
        corpus.select("doc_id", "text"), "text", "doc_id",
        edge_sources=(), extra_edges=edges,
    ).join(corpus.select("doc_id", F.length("text").alias("__ql")), "doc_id")
    keepers = (
        resolve_keep_best(clustered, "__ql", "doc_id")
        .filter(F.col("is_kept"))
        .select("doc_id")
    )
    kept_docs = corpus.join(keepers, "doc_id")
    dec = winnow_decontaminate(
        kept_docs, bench, "text", "doc_id", k=8, w=4,
        min_shared_fraction=0.95,
    )
    final_ids = dec.filter(~F.col("contaminated")).select("doc_id")
    curated = corpus.join(final_ids, "doc_id").select(
        "doc_id", "source", "text",
        token_count(F.col("text")).cast("double").alias("toks"),
    )
    rates = mixture_weights(
        curated, ["source"],
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        weight_col="toks",
    )
    mixed = apply_mixture(curated, rates, ["source"], id_col="doc_id",
                          salt="mix14")
    sp = hash_split(mixed, {"train": 0.9, "val": 0.1}, id_col="doc_id",
                    salt="sp14")
    audit = pack_efficiency_audit(
        sp, "text", "doc_id", seq_len=512, eod_tokens=1,
        by=["split", "source"],
    )
    return audit.select(
        "split", "source", "n_docs", "total_tokens", "n_sequences",
        "fill_rate", "n_straddling", "straddle_rate",
        "trunc_loss_tokens", "trunc_loss_rate",
    ).orderBy("split", "source")


@register(
    "text_novelty_audit",
    """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS s
      FROM documents),
    h AS (
      SELECT doc_id,
             list_transform(range(1, len(s) - 8 + 2), i ->
               CAST(list_sum(list_transform(range(1, 14), j ->
                 (strpos('0123456789abcdef',
                         substr(md5(substr(s, i, 8)), j, 1)) - 1)
                 * 2.0 ** (4 * (13 - j)))) AS BIGINT)) AS hs
      FROM n WHERE len(s) >= 11),
    fp AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3])))) AS fp
      FROM h),
    first AS (SELECT fp, min(doc_id) AS f FROM fp GROUP BY fp),
    pd AS (
      SELECT p.doc_id, count(*) AS nf,
             sum(CASE WHEN first.f < p.doc_id THEN 1 ELSE 0 END) AS ns
      FROM fp p JOIN first USING (fp) GROUP BY 1)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg((nf - ns) / (1.0 * nf)), 6) AS avg_novelty,
           CAST(sum(CASE WHEN ns = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fully_novel,
           CAST(sum(CASE WHEN ns = nf THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fully_stale
    FROM pd JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """,
)
def text_novelty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content-novelty audit (operators/winnow.py
    novelty_report): share of each document's winnowed fingerprints
    first seen in THAT document (min doc_id = ingest-order proxy) —
    the is-this-crawl-adding-anything gate before paying to ingest
    another snapshot. The oracle replays hashes, window minima,
    first-occurrence assignment, and every per-source aggregate;
    novelty ratios come from exact integer (n_fps, n_seen) counts."""
    from daft_spark.operators.winnow import novelty_report

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    return novelty_report(
        d, "text", "doc_id", by="source", k=8, w=4
    ).orderBy("source")


@register(
    "text_vocab_growth",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(
                 lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
                 ' ')) AS t
      FROM documents),
    tk AS (SELECT doc_id, t FROM toks WHERE t <> ''),
    first AS (SELECT t, min(doc_id) AS f FROM tk GROUP BY t),
    dt AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
    mx AS (SELECT max(doc_id) AS m FROM documents),
    fr(fraction) AS (VALUES (CAST(0.25 AS DOUBLE)), (0.5), (0.75), (1.0)),
    cut AS (
      SELECT fraction, CAST(floor(mx.m * fraction) AS BIGINT) AS cutoff_id
      FROM fr CROSS JOIN mx),
    nd AS (
      SELECT c.fraction, c.cutoff_id,
             sum(CASE WHEN d.doc_id <= c.cutoff_id THEN 1 ELSE 0 END)
               AS n_docs
      FROM cut c CROSS JOIN documents d GROUP BY 1, 2),
    nt AS (
      SELECT c.fraction,
             coalesce(sum(CASE WHEN dt.doc_id <= c.cutoff_id
                               THEN dt.n END), 0) AS n_tokens
      FROM cut c CROSS JOIN dt GROUP BY 1),
    nv AS (
      SELECT c.fraction,
             coalesce(sum(CASE WHEN first.f <= c.cutoff_id
                               THEN 1 END), 0) AS n_vocab
      FROM cut c CROSS JOIN first GROUP BY 1)
    SELECT nd.fraction, nd.cutoff_id,
           CAST(nd.n_docs AS BIGINT) AS n_docs,
           CAST(nt.n_tokens AS BIGINT) AS n_tokens,
           CAST(nv.n_vocab AS BIGINT) AS n_vocab,
           CASE WHEN nt.n_tokens > 0
                THEN round(nv.n_vocab / (1.0 * nt.n_tokens), 6)
           END AS type_token_ratio
    FROM nd JOIN nt USING (fraction) JOIN nv USING (fraction)
    ORDER BY nd.fraction
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth audit (operators/repetition.py
    vocab_growth): distinct unigram vocabulary vs corpus prefix at
    25/50/75/100% ingest-order cutoffs — saturation-too-early is the
    template-spam alarm, the axis zipf_audit doesn't see. On the
    synthetic corpus the curve saturates immediately (tiny closed
    vocabulary) — the alarm firing as designed. The oracle replays
    tokenization, first occurrences, per-doc counts, cutoff
    arithmetic, and every conditional sum."""
    from daft_spark.operators.repetition import vocab_growth

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return vocab_growth(d, "text", "doc_id").orderBy("fraction")


@register(
    "pipeline_shard_manifest",
    """
    WITH s AS (
      SELECT CAST(floor(list_sum(list_transform(range(1, 14), i ->
                 (strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR) || 'shard'),
                                i, 1)) - 1)
                 * 2.0 ** (4 * (13 - i)))) / 2.0 ** 52 * 64) AS INT)
               AS shard,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt,
             length(text) AS nc
      FROM documents),
    per AS (
      SELECT shard, count(*) AS n_docs, sum(nt) AS n_tokens,
             sum(nc) AS n_chars
      FROM s GROUP BY shard),
    tot AS (SELECT sum(n_tokens) AS t FROM per)
    SELECT shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           round(n_tokens / (1.0 * tot.t), 6) AS token_share
    FROM per CROSS JOIN tot ORDER BY shard
    """,
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest + balance audit (operators/sampling.py
    shard_manifest): per-shard docs/tokens/chars/share under the
    deterministic md5 shard key pack_sequences uses — the pre-flight
    balance check before a 1000-worker data-parallel run (the slowest
    shard sets the epoch time). The oracle replays the 52-bit md5
    uniform, the floor(u*n) assignment, and every rollup."""
    from daft_spark.operators.sampling import shard_manifest

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return shard_manifest(d, "text", "doc_id", n_shards=64).orderBy("shard")
