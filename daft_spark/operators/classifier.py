"""Quality-classifier training + corpus scoring — the GPT-3/LLaMA-
lineage curation stage: train a linear classifier to separate a small
TARGET corpus (positives) from random raw-corpus documents
(negatives), then score the whole crawl and keep high-scoring
documents. (Brown et al. 2020 appendix A; Touvron et al. 2023 use the
same shape with a fastText model — a linear bag-of-n-grams classifier,
exactly what this trains.)

Features are the hashed unigram+bigram buckets shared with
operators/dsir.py (``_gram_buckets`` — 52-bit md5, cross-engine
deterministic), L2-normalized per document by gram count. Training is
full-batch logistic regression by gradient descent:

    sigma_d = sigmoid(sum_b x_db * w_b + w0);  r_d = sigma_d - y_d
    grad_b  = sum_d x_db * r_d / n + lambda * w_b

Engine mapping: the labeled training frame explodes ONCE to
(doc, bucket, tf) keys-only rows and persists; each iteration is two
narrow map-side-combined aggregations (per-doc margin, per-bucket
gradient) with the weight vector joining as a BROADCAST n_buckets-row
table; the driver holds only the (n_buckets + 1)-double weight vector.
Training data is a bounded labeled set (classifiers train on ~1e5
docs); SCORING is the 100 TB pass — one explode + broadcast join +
per-doc sum, the same keys-only shape as dsir_log_weights, text never
shuffles.

Gradient sums are float-order dependent, so trained weights carry
~1e-12 drift across partitionings: queries oracle INVARIANTS (held-out
AUC floor, score range, row conservation), not weight digests.

Reference surface: the reference has no classifier training; this
extends its text-curation family per SURVEY.md §2's pipeline column.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from daft_spark.operators.dsir import _gram_buckets

__all__ = ["train_quality_classifier", "score_quality", "quality_auc"]


def _doc_features(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(id, bucket, tf) rows: per-doc bucket term frequencies,
    normalized by the doc's gram count. Explode is keys-only; the
    map-side combine collapses each (doc, bucket) before any exchange."""
    g = df.select(
        F.col(id_col),
        F.explode(_gram_buckets(text_col, n_buckets, salt)).alias("bucket"),
    )
    per = g.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))
    tot = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return per.join(tot, id_col).select(
        id_col, "bucket", (F.col("c") / F.col("n")).alias("tf")
    )


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    iters: int = 12,
    lr: float = 2.0,
    l2: float = 1e-4,
    salt: str = "dsir",
) -> dict:
    """Full-batch logistic regression: returns a plain-python model
    {weights: {bucket: w}, bias: float, n_buckets, salt, iters}.
    ``positives``/``negatives`` are the labeled frames (target corpus
    vs raw sample); ids only need to be unique WITHIN each frame."""
    spark = positives.sparkSession
    pos = positives.select(
        F.concat(F.lit("p"), F.col(id_col).cast("string")).alias("__id"),
        F.col(text_col).alias("__text"),
        F.lit(1.0).alias("__y"),
    )
    neg = negatives.select(
        F.concat(F.lit("n"), F.col(id_col).cast("string")).alias("__id"),
        F.col(text_col).alias("__text"),
        F.lit(0.0).alias("__y"),
    )
    lab = pos.unionByName(neg)
    feats = _doc_features(lab, "__text", "__id", n_buckets, salt).join(
        lab.select("__id", "__y"), "__id"
    ).persist()
    n = feats.select("__id").distinct().count()
    if n < 2:
        feats.unpersist()
        raise ValueError("need at least one positive and one negative doc")
    w: dict[int, float] = {}
    bias = 0.0
    for _ in range(iters):
        wtab = spark.createDataFrame(
            [(int(b), float(v)) for b, v in w.items()] or [(-1, 0.0)],
            "bucket int, w double",
        )
        margins = (
            feats.join(F.broadcast(wtab), "bucket", "left")
            .groupBy("__id", "__y")
            .agg(F.sum(F.col("tf") * F.coalesce(F.col("w"), F.lit(0.0))).alias("m"))
            .select(
                "__id",
                "__y",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(bias))))
                    - F.col("__y")
                ).alias("r"),
            )
        )
        grad_rows = (
            feats.join(margins.select("__id", "r"), "__id")
            .groupBy("bucket")
            .agg(F.sum(F.col("tf") * F.col("r")).alias("g"))
            .collect()
        )
        gb = margins.agg(F.sum("r").alias("g0")).collect()[0]["g0"]
        for row in grad_rows:
            b = int(row["bucket"])
            w[b] = w.get(b, 0.0) - lr * (row["g"] / n + l2 * w.get(b, 0.0))
        bias -= lr * (gb / n)
    feats.unpersist()
    return {
        "weights": w,
        "bias": bias,
        "n_buckets": n_buckets,
        "salt": salt,
        "iters": iters,
    }


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: (id, n_grams, quality_score in [0,1]).
    The 100 TB pass — one keys-only explode, the weight table
    broadcast, per-doc sum map-side combined; text never shuffles.
    Gram-less documents score sigmoid(bias)."""
    spark = df.sparkSession
    wtab = spark.createDataFrame(
        [(int(b), float(v)) for b, v in model["weights"].items()] or [(-1, 0.0)],
        "bucket int, w double",
    )
    g = df.select(
        F.col(id_col),
        F.explode_outer(
            _gram_buckets(text_col, model["n_buckets"], model["salt"])
        ).alias("bucket"),
    )
    bias = float(model["bias"])
    return (
        g.join(F.broadcast(wtab), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(
                F.sum(F.coalesce(F.col("w"), F.lit(0.0))), F.lit(0.0)
            ).alias("__ws"),
        )
        .select(
            id_col,
            "n_grams",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            # margin = sum_b (c_b / n) w_b + bias; __ws is
                            # the unnormalized sum over gram occurrences
                            F.when(
                                F.col("n_grams") > 0,
                                F.col("__ws") / F.col("n_grams"),
                            ).otherwise(F.lit(0.0))
                            + F.lit(bias)
                        )
                    )
                )
            ).alias("quality_score"),
        )
    )


def quality_auc(scores: DataFrame, labels: DataFrame, id_col: str = "doc_id") -> float:
    """ROC AUC of ``scores`` (id, quality_score) against boolean
    ``labels`` (id, y) via the rank formula — one window-free
    aggregation pair (average rank of positives)."""
    j = scores.join(labels, id_col).select("quality_score", F.col("y").cast("int").alias("y"))
    from pyspark.sql import Window

    w = Window.orderBy("quality_score")
    ranked = j.withColumn("rk", F.row_number().over(w))
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("rk")).otherwise(F.lit(0))).alias("rs"),
        F.sum(F.col("y")).alias("npos"),
        F.count(F.lit(1)).alias("ntot"),
    ).collect()[0]
    npos, ntot = agg["npos"], agg["ntot"]
    nneg = ntot - npos
    if npos == 0 or nneg == 0:
        return float("nan")
    return (agg["rs"] - npos * (npos + 1) / 2) / (npos * nneg)
