"""Gopher-style n-gram repetition signals ("Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Rae et al. 2021,
Table A1): the fraction of a document's characters covered by (a) its
single MOST FREQUENT n-gram and (b) all n-grams that occur more than
once. functions/text.py's duplicate_line_fraction covers the
line-level rule; these are the n-gram rules that catch within-document
boilerplate loops (navigation bars, repeated boilerplate sentences)
that line-level signals miss.

100 TB posture: n-grams assemble INSIDE the row (transform over the
token array — whole-stage codegen) and the exploded frame carries
(doc_id, xxhash64(ngram), char_length) only — 20-byte keys at token
scale, never the n-gram strings; per-doc counting is one map-side-
combining groupBy. Char-fractions are count*len weighted, the
formulation the public curation stacks (NeMo-Curator, DataTrove) use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_repetition_fractions", "top_ngrams"]


def _gram_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, __g) — one row per n-gram occurrence, assembled by
    posexplode with the token ARRAY kept in scope so each gram is
    concat_ws(token, F.get(arr, p+1), ...) — the shingle_hashes shape.
    The transform(sequence(...), slice+concat) formulation evaluates
    INTERPRETED per element and measured ~20x slower at corpus scale
    (A/B at sf1: 108.6 s vs 5.3 s for the same 2.7M bigrams); this is
    the same defect class the dedup module's docstring records for
    windowed shingles. Docs with fewer than ``n`` tokens contribute
    nothing (the trailing F.get is NULL and filtered)."""
    from daft_spark.operators.dedup import tokens_of

    toks = df.select(
        F.col(id_col), tokens_of(F.col(text_col)).alias("__ts")
    )
    ex = toks.select(id_col, "__ts", F.posexplode("__ts").alias("__p", "__t"))
    neigh = [F.get("__ts", F.col("__p") + j) for j in range(1, n)]
    if neigh:
        ex = ex.filter(neigh[-1].isNotNull())
    return ex.select(
        id_col, F.concat_ws(" ", F.col("__t"), *neigh).alias("__g")
    )


def _ngram_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, __h, __len) — one row per n-gram occurrence, hashed and
    char-measured in-row."""
    return _gram_rows(df, text_col, id_col, n).select(
        id_col,
        F.xxhash64("__g").alias("__h"),
        F.length("__g").alias("__len"),
    )


def ngram_repetition_fractions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition signals, rounded to 6 decimals:

    - ``top{top_n}gram_char_frac``: chars covered by the most frequent
      top_n-gram (count * length / total n-gram chars) — high values
      mean one phrase dominates the document;
    - ``dup{dup_n}gram_char_frac``: chars covered by all dup_n-grams
      occurring more than once — high values mean looping boilerplate.

    Only documents with at least ``dup_n`` tokens return (they have
    both signals); Gopher drops shorter documents on word count first
    anyway."""
    def _per_doc(n: int, out_col: str, dup_only: bool) -> DataFrame:
        counts = (
            _ngram_frame(df, text_col, id_col, n)
            .groupBy(id_col, "__h", "__len")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        covered = F.col("__c") * F.col("__len")
        per = counts.groupBy(id_col).agg(
            F.sum(covered).alias("__total"),
            (
                F.sum(F.when(F.col("__c") > 1, covered).otherwise(F.lit(0)))
                if dup_only
                else F.max(covered)
            ).alias("__part"),
        )
        return per.select(
            id_col,
            F.round(F.col("__part") / F.col("__total"), 6).alias(out_col),
        )

    top = _per_doc(top_n, f"top{top_n}gram_char_frac", dup_only=False)
    dup = _per_doc(dup_n, f"dup{dup_n}gram_char_frac", dup_only=True)
    return top.join(dup, id_col)


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-level TOP-K n-gram frequencies — the counting stage of
    vocabulary construction and the standard corpus-composition audit.
    Returns (ngram, n_occurrences, n_docs) ordered by occurrences
    descending with a deterministic lexicographic tiebreak.

    Scale: n-grams assemble IN-ROW via the posexplode + F.get neighbor
    shape (``_gram_rows`` — the transform/slice formulation evaluated
    interpreted and was 20x slower, A/B'd at sf1); the count is one
    groupBy whose map-side partial aggregation collapses each
    partition's duplicate grams before the exchange (Zipf
    distributions collapse hard, so the shuffle moves far fewer rows
    than occurrences); the top-k is orderBy+limit, which Spark plans
    as TakeOrderedAndProject — per-partition heaps, never a global
    sort (plan-asserted)."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    ex = _gram_rows(df, text_col, id_col, n).select(
        F.col(id_col).alias("__id"), F.col("__g").alias("ngram")
    )
    return (
        ex.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("__id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def top_ngrams_sketch(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 100,
    capacity: int = 2000,
) -> DataFrame:
    """APPROXIMATE corpus top-k n-grams via a merged MISRA–GRIES
    summary — the fixed-memory counterpart of ``top_ngrams`` for
    streams where even the map-side-combined exact shuffle is too
    large (open-vocabulary n>=3 grams over 100 TB: the distinct-gram
    set exceeds executor memory; MG caps it at ``capacity`` counters
    per partition, full stop).

    Per partition, a batched Misra–Gries runs inside one
    ``mapInPandas`` pass (inherently stateful Python — the right tool;
    batches pre-aggregate through value_counts before touching the
    dict): whenever the counter set exceeds ``capacity``, the
    (capacity+1)-th largest count is subtracted from every counter and
    non-positive ones drop — each such cut removes >= (capacity+1) *
    cut occurrences of stream mass, which yields the classic MG
    guarantee per partition: undercount <= floor(n_p / (capacity+1)).
    Summaries merge by summing per-gram counts (MG summaries are
    mergeable, Agarwal et al. 2013), so globally: true_count -
    floor(N / (capacity+1)) <= estimate <= true_count, and every gram
    with true count > floor(N/(capacity+1)) survives in at least one
    partition. Returns the top ``k`` by estimate (deterministic
    lexicographic tiebreak) with the global ``err_bound`` attached.

    Scale: the exchange moves at most #partitions * capacity rows
    regardless of corpus size; the total-stream count N (for the
    bound) is one map-side-combining count aggregate."""
    from daft_spark.operators.dedup import tokens_of

    if n < 1 or k < 1 or capacity < 1:
        raise ValueError("n, k, capacity must be >= 1")
    ex = _gram_rows(df, text_col, id_col, n).select(F.col("__g").alias("ngram"))

    cap = int(capacity)

    def mg(batches):
        import pandas as pd

        # fully vectorized batched Misra-Gries: per batch one
        # value_counts + one aligned Series.add; the shrink subtracts
        # the (capacity+1)-th largest count from everyone (each such
        # cut removes >= (cap+1)*cut stream mass -> the MG bound).
        # A python dict loop here was 10x slower and dominated the
        # whole sketch at sf1.
        counters = pd.Series(dtype="int64")
        for b in batches:
            counters = counters.add(b["ngram"].value_counts(), fill_value=0)
            if len(counters) > cap:
                cut = counters.nlargest(cap + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        counters = counters.astype("int64")
        yield pd.DataFrame(
            {"ngram": counters.index.astype(str), "cnt": counters.to_numpy()}
        )

    summaries = ex.mapInPandas(mg, schema="ngram string, cnt long")
    merged = summaries.groupBy("ngram").agg(F.sum("cnt").alias("est_count"))
    total = ex.agg(F.count(F.lit(1)).alias("__n"))
    return (
        merged.crossJoin(F.broadcast(total))
        .select(
            "ngram",
            "est_count",
            F.floor(F.col("__n") / F.lit(cap + 1)).cast("long").alias("err_bound"),
        )
        .orderBy(F.col("est_count").desc(), F.col("ngram").asc())
        .limit(k)
    )


def zipf_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
) -> DataFrame:
    """CORPUS-HEALTH Zipf audit: OLS fit of ln(count) ~ ln(rank) over
    the ``top_k`` unigrams — natural-language corpora sit near slope
    -1 with r2 > 0.9; boilerplate floods, template spam, or a broken
    extraction stage bend the curve, so the (slope, r2, top-1 share)
    triple is the cheap per-shard drift alarm a 100 TB ingest runs
    beside source-divergence checks.

    ONE row out: n_distinct_tokens, top_k, zipf_slope, zipf_r2,
    top1_share. Shape: token counts are a map-side-combining groupBy
    (Zipf itself collapses the exchange: the head dominates), the
    top-k is TakeOrdered-sized, and the regression runs over k rows —
    driver never sees tokens. Deterministic: ties rank by token."""
    from pyspark.sql import Window

    from daft_spark.operators.dedup import tokens_of
    from daft_spark.operators.spread import spread as _spread

    toks = _spread(df).select(
        F.explode(tokens_of(F.col(text_col))).alias("__t")
    ).filter(F.col("__t") != "")
    counts = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy(F.col("__c").desc(), F.col("__t"))
    # the global window runs over the top_k survivors only (filter on
    # row_number over a pre-limited sort would shuffle everything;
    # orderBy+limit keeps it TakeOrdered-sized before the rank)
    top = counts.orderBy(F.col("__c").desc(), "__t").limit(top_k)
    ranked = top.withColumn("__r", F.row_number().over(w))
    x = F.log(F.col("__r").cast("double"))
    y = F.log(F.col("__c").cast("double"))
    stats = ranked.agg(
        F.regr_slope(y, x).alias("__slope"),
        F.regr_r2(y, x).alias("__r2"),
        F.max(F.when(F.col("__r") == 1, F.col("__c"))).alias("__c1"),
        F.sum("__c").alias("__ctot"),
        F.count(F.lit(1)).alias("__k"),
    )
    n_distinct = counts.agg(
        F.count(F.lit(1)).alias("n_distinct_tokens")
    )
    return n_distinct.crossJoin(stats).select(
        "n_distinct_tokens",
        F.col("__k").alias("top_k"),
        F.round("__slope", 6).alias("zipf_slope"),
        F.round("__r2", 6).alias("zipf_r2"),
        F.round(F.col("__c1") / F.col("__ctot"), 6).alias("top1_share"),
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fractions: list[float] | None = None,
) -> DataFrame:
    """CORPUS-HEALTH vocabulary-growth (Heaps' law) audit: distinct
    unigram vocabulary vs corpus prefix size at ingest-order cutoffs
    (``id_col`` quantiles of max id) — natural corpora keep minting
    types (V ~ n^beta, beta ~ 0.5); a curve that saturates early means
    template spam or a broken extraction stage, the same alarm family
    as zipf_audit read along the other axis. One row per fraction:
    (fraction, cutoff_id, n_docs, n_tokens, n_vocab, type_token_ratio).

    Shape: token first-occurrence (min id per token) is ONE
    map-side-combining aggregation — the cumulative-distinct-per-
    prefix rollup that would otherwise need a pass per cutoff falls
    out of it as conditional sums; per-doc occurrence counts are a
    second narrow agg; the max-id scalar broadcasts. Text never
    shuffles and nothing rescans per fraction."""
    from daft_spark.operators.dedup import tokens_of
    from daft_spark.operators.spread import spread as _spread

    fs = sorted(float(f) for f in (fractions or [0.25, 0.5, 0.75, 1.0]))
    if not fs or fs[0] <= 0 or fs[-1] > 1:
        raise ValueError("fractions must lie in (0, 1]")
    toks = (
        _spread(df)
        .select(F.col(id_col), F.explode(tokens_of(F.col(text_col))).alias("__t"))
        .filter(F.col("__t") != "")
    )
    first = toks.groupBy("__t").agg(F.min(id_col).alias("__first"))
    per_doc = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    mx = df.agg(F.max(id_col).alias("__mx"))

    def cut(i):
        return F.floor(F.col("__mx") * F.lit(fs[i])).cast("long")

    nd = df.select(F.col(id_col)).crossJoin(F.broadcast(mx)).agg(
        *[F.sum((F.col(id_col) <= cut(i)).cast("long")).alias(f"__d{i}")
          for i in range(len(fs))],
        F.max("__mx").alias("__mx"),
    )
    nt = per_doc.crossJoin(F.broadcast(mx)).agg(
        *[F.coalesce(
            F.sum(F.when(F.col(id_col) <= cut(i), F.col("__n"))), F.lit(0)
        ).alias(f"__t{i}") for i in range(len(fs))]
    )
    nv = first.crossJoin(F.broadcast(mx)).agg(
        *[F.coalesce(
            F.sum((F.col("__first") <= cut(i)).cast("long")), F.lit(0)
        ).alias(f"__v{i}") for i in range(len(fs))]
    )
    row = nd.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nv))
    stacked = ", ".join(
        f"CAST({fs[i]} AS DOUBLE), CAST(FLOOR(__mx * {fs[i]}) AS BIGINT), "
        f"__d{i}, __t{i}, __v{i}"
        for i in range(len(fs))
    )
    out = row.selectExpr(
        f"stack({len(fs)}, {stacked}) as "
        "(fraction, cutoff_id, n_docs, n_tokens, n_vocab)"
    )
    return out.select(
        "fraction", "cutoff_id", "n_docs", "n_tokens", "n_vocab",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_vocab") / F.col("n_tokens").cast("double"), 6),
        ).alias("type_token_ratio"),
    )
