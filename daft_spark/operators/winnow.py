"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm): hash every character k-gram of the normalized text, slide a
window of w consecutive hashes, keep each window's MINIMUM — the
selected set is guaranteed to share a fingerprint with any copy of a
substring longer than w+k-1 chars (the winnowing guarantee), at ~2/(w+1)
the density of full k-gram hashing.

Spark shape: everything is IN-ROW column expressions (substr/md5/conv
inside transform lambdas — whole-stage codegen, no UDF); the text never
shuffles, and the output is (doc_id, fp) pairs whose count per doc is
O(len/w). Hashes are the engine's deterministic-random convention — the
first 52 bits of md5 (operators/sampling.py module doc) — so a DuckDB
oracle replays every fingerprint bit-exactly.

Reference parity: the reference ships minhash (src/daft-functions/src/
minhash/) and hash functions for content fingerprinting; winnowing is
the position-robust fingerprint the plagiarism/dedup literature builds
on the same primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from daft_spark.operators.dedup import normalize_text


def _gram_hash52(gram: Column) -> Column:
    """First 52 bits of md5(gram) as a non-negative long — bit-exactly
    replayable in any engine with md5 + hex arithmetic."""
    return F.conv(F.substring(F.md5(gram), 1, 13), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """One (id, fp) row per distinct selected fingerprint. Documents
    whose normalized text is shorter than ``k + w - 1`` chars (no full
    window) yield no rows — the standard winnowing domain condition."""
    if k < 2 or w < 1:
        raise ValueError("k must be >= 2 and w >= 1")
    from pyspark.sql import Window

    # posexplode + per-row hash, NOT transform-lambdas: a lambda body
    # re-evaluates its input expression per element (the interpreted-
    # transform defect class documented in operators/repetition.py —
    # the inline formulation here re-ran the regex normalization and
    # the whole hash-array build per window, O(len^2) md5 calls).
    # Exploded, each gram hashes exactly once and the window minimum
    # is Spark's native sliding frame over (id, position) rows.
    norm_df = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__norm")
    ).filter(F.length("__norm") >= k + w - 1)
    grams = norm_df.select(
        F.col(id_col),
        F.length("__norm").alias("__len"),
        F.posexplode(
            F.sequence(F.lit(1), F.length("__norm") - F.lit(k - 1))
        ).alias("__p", "__i"),
        F.col("__norm"),
    ).select(
        F.col(id_col),
        (F.col("__len") - F.lit(k - 1)).alias("__ngrams"),
        F.col("__i"),
        _gram_hash52(F.col("__norm").substr(F.col("__i"), F.lit(k))).alias(
            "__h"
        ),
    )
    win = (
        Window.partitionBy(id_col).orderBy("__i").rowsBetween(0, w - 1)
    )
    return (
        grams.withColumn("__wmin", F.min("__h").over(win))
        .filter(F.col("__i") <= F.col("__ngrams") - F.lit(w - 1))
        .select(F.col(id_col), F.col("__wmin").alias("fp"))
        .distinct()
    )


def winnow_similarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 200,
) -> DataFrame:
    """Fingerprint-overlap candidate pairs: documents sharing >=
    ``min_shared`` winnowed fingerprints, with their fingerprint
    Jaccard over the post-cut fingerprint sets (the containment
    miner's denominator convention). The inverted-index join shape
    (fp -> docs), keys only — the text never shuffles; at 100 TB the
    fp table is ~2/(w+1) of a full shingle index and the join is an
    ordinary hash-partitioned equi-join on an 8-byte key.

    ``max_doc_freq`` drops STOP-FINGERPRINTS — fps appearing in more
    than that many docs — from the join (the containment miner's df
    cut, operators/dedup.py): a fingerprint shared by thousands of
    documents carries no pair signal but dominates the join
    quadratically (A/B at sf0.1: the uncut join ran 47 s vs 2.8 s cut,
    and grows ~quadratically in duplication factor).

    Cache lifecycle: ``fps``/``kept`` are persisted because the
    returned LAZY plan reads each of them 2-3 times (Spark does not
    reuse exchanges across self-join aliases), so this function cannot
    unpersist them itself — the dedup-module policy (operators/
    dedup.py module docstring). Blocks are LRU-evictable; long-lived
    sessions reclaim deterministically between pipelines with
    ``daft_spark.context.release_caches(spark)``."""
    if max_doc_freq < 1:
        raise ValueError("max_doc_freq must be >= 1")
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w).persist()
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_doc_freq)
        .select("fp")
    )
    kept = fps.join(rare, "fp").persist()
    sizes = kept.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    a = kept.select(F.col(id_col).alias("id_a"), "fp")
    b = kept.select(F.col(id_col).alias("id_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(F.col("__shared") >= min_shared)
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b",
            F.col("__shared").alias("shared_fps"),
            F.round(
                F.col("__shared")
                / (F.col("__na") + F.col("__nb") - F.col("__shared")),
                6,
            ).alias("jaccard"),
        )
    )


def winnow_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    min_shared_fraction: float | None = None,
) -> DataFrame:
    """VERBATIM-leak benchmark decontamination via winnowing: flag
    every corpus document sharing >= ``min_shared`` selected
    fingerprints with ANY benchmark document. The winnowing guarantee
    makes this a tunable literal-copy detector: any shared normalized
    character run longer than w+k-1 (= 11 at defaults) is certain to
    share a fingerprint — unlike token-shingle rules, robust to
    whitespace/punctuation edits, and unlike MinHash, deterministic
    (no banding miss probability). Returns every corpus row's
    (id_col, n_shared_fps, contaminated).

    ``min_shared_fraction`` switches to a PROPORTIONAL rule:
    contaminated when n_shared / n_fps >= fraction (the
    high-overlap-share discipline for boilerplate-heavy corpora,
    where an absolute count flags everything because templates alias
    fingerprints corpus-wide); the output then also carries ``n_fps``
    (the doc's distinct selected fingerprints) so the rule is
    auditable. Documents too short to fingerprint are never flagged
    under either rule.

    Scale shape: the benchmark side reduces to a DISTINCT fingerprint
    set and BROADCASTS (eval benchmarks are tiny next to a 100 TB
    corpus); the corpus side is the (id, fp) keys-only winnow frame,
    semi-joined executor-side — the only exchange is the per-doc count
    keyed by id, and the corpus text never shuffles."""
    bfp = (
        winnow_fingerprints(bench, text_col, id_col, k=k, w=w)
        .select("fp")
        .distinct()
    )
    cfp = winnow_fingerprints(corpus, text_col, id_col, k=k, w=w)
    shared = (
        cfp.join(F.broadcast(bfp), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
    if min_shared_fraction is None:
        return (
            corpus.select(id_col)
            .join(shared, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_shared_fps", F.lit(0)).alias("n_shared_fps"),
                (F.coalesce("n_shared_fps", F.lit(0)) >= min_shared).alias(
                    "contaminated"
                ),
            )
        )
    totals = cfp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fps"))
    n_sh = F.coalesce("n_shared_fps", F.lit(0))
    n_fp = F.coalesce("n_fps", F.lit(0))
    return (
        corpus.select(id_col)
        .join(shared, id_col, "left")
        .join(totals, id_col, "left")
        .select(
            id_col,
            n_sh.alias("n_shared_fps"),
            n_fp.alias("n_fps"),
            F.when(
                n_fp > 0,
                n_sh.cast("double") / n_fp.cast("double")
                >= F.lit(float(min_shared_fraction)),
            )
            .otherwise(F.lit(False))
            .alias("contaminated"),
        )
    )


def winnow_threshold_sweep(
    df: DataFrame,
    thresholds: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 200,
) -> DataFrame:
    """Near-dup THRESHOLD-SWEEP audit over winnowing-fingerprint
    Jaccard: for each candidate threshold, how much of the corpus a
    fingerprint-Jaccard dedup would remove — the dial you turn BEFORE
    committing a 100 TB near-dup run (the fingerprint-set analogue of
    operators/similarity.py semdedup_sweep; MOSS scores matches from
    exactly this fingerprint-overlap statistic, Schleimer et al. 2003
    §5). A document is removed at threshold t when any LOWER-id
    candidate partner has fingerprint Jaccard >= t (the min-id keeper
    used across the dedup family). Returns one row per threshold:
    (threshold, n_total, n_removed, n_kept, removal_rate).

    Shape: ONE winnow_similarity pass mines candidates (inverted-index
    equi-join on 8-byte fp keys, stop-fingerprint cut — never
    all-pairs, text never shuffles), one groupBy(id) max-Jaccard
    aggregation, then a single-row conditional aggregate unpivoted
    with stack — no per-threshold rescans. Jaccards are round-6 (from
    winnow_similarity) so an external replay decides identically;
    ``min_shared``/``max_doc_freq`` bound the candidate set exactly as
    in the production pair miner, so the curve measures the pipeline
    that would actually run."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = sorted(float(t) for t in thresholds)
    pairs = winnow_similarity(
        df, text_col, id_col,
        k=k, w=w, min_shared=min_shared, max_doc_freq=max_doc_freq,
    )
    nn = pairs.groupBy("id_b").agg(F.max("jaccard").alias("__nn"))
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


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """CROSS-SOURCE contamination matrix: for every pair of corpus
    slices (sources, crawls, snapshots), the winnowed-fingerprint
    overlap — which sources duplicate each other, the first question a
    multi-source 100 TB mixture audit asks (a high-containment pair
    means one source is substantially embedded in the other, so their
    mixture weights double-count). One row per overlapping unordered
    pair: (source_a, source_b, fps_a, fps_b, shared_fps, containment,
    jaccard), containment = shared / min(|A|, |B|).

    Shape: fingerprints collapse to DISTINCT (source, fp) before
    anything joins — per-source duplication factors out, so the join
    input is bounded by distinct corpus content, not corpus size; the
    pair join is fp-keyed (8-byte keys, fan-out per fp bounded by the
    source count squared) and the totals frame is |sources| rows,
    broadcast. Text never shuffles. The distinct frame is persisted
    because the lazy plan reads it three times (totals + both join
    sides) — dedup-module cache policy, reclaim via
    context.release_caches(spark)."""
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    src = df.select(F.col(id_col), F.col(by))
    sfp = fps.join(src, id_col).select(by, "fp").distinct().persist()
    tot = sfp.groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
    a = sfp.select(F.col(by).alias("source_a"), "fp")
    b = sfp.select(F.col(by).alias("source_b"), "fp")
    pair = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    ta = tot.select(F.col(by).alias("source_a"), F.col("__n").alias("fps_a"))
    tb = tot.select(F.col(by).alias("source_b"), F.col("__n").alias("fps_b"))
    return (
        pair.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a", "source_b", "fps_a", "fps_b", "shared_fps",
            F.round(
                F.col("shared_fps")
                / F.least("fps_a", "fps_b").cast("double"),
                6,
            ).alias("containment"),
            F.round(
                F.col("shared_fps")
                / (F.col("fps_a") + F.col("fps_b") - F.col("shared_fps")),
                6,
            ).alias("jaccard"),
        )
    )


def novelty_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Per-slice CONTENT-NOVELTY audit (Lee et al. 2022's dedup
    motivation read forward): a document's novelty is the fraction of
    its winnowed fingerprints whose FIRST corpus occurrence (minimum
    ``id_col``, the ingest-order proxy) is the document itself. A
    slice whose incoming documents are mostly re-fingerprints of
    earlier content adds tokens but no information — the go/no-go
    audit before paying to ingest another crawl snapshot. One row per
    ``by`` group: (source, n_docs, avg_novelty, n_fully_novel,
    n_fully_stale); documents too short to fingerprint are excluded
    (they have no novelty evidence either way).

    Shape: fp -> min(id) is one keys-only aggregation; the join back
    to (id, fp) is fp-keyed; the per-doc and per-source rollups carry
    integer counts (n_fps, n_seen), so novelty ratios are computed
    once per doc from exact integers. Text never shuffles; the
    fingerprint frame is persisted (read by first-occurrence agg and
    join) under the dedup-module cache policy."""
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w).persist()
    first = fps.groupBy("fp").agg(F.min(id_col).alias("__first"))
    per_doc = (
        fps.join(first, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__nf"),
            F.sum((F.col("__first") < F.col(id_col)).cast("long")).alias(
                "__ns"
            ),
        )
    )
    src = df.select(F.col(id_col), F.col(by))
    return (
        per_doc.join(src, id_col)
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.avg(
                    (F.col("__nf") - F.col("__ns"))
                    / F.col("__nf").cast("double")
                ),
                6,
            ).alias("avg_novelty"),
            F.sum((F.col("__ns") == 0).cast("long")).alias("n_fully_novel"),
            F.sum((F.col("__ns") == F.col("__nf")).cast("long")).alias(
                "n_fully_stale"
            ),
        )
    )
