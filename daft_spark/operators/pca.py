"""Distributed PCA / whitening over an embedding column — the standard
post-processing for retrieval embeddings (mean-centering + whitening
measurably improves cosine retrieval; also the 4-256x dimensionality
cut before ANN indexing at 100 TB).

Algorithm (the classic one-pass distributed PCA, same shape as Spark
MLlib's RowMatrix.computeGramianMatrix): every Arrow batch reduces to
a FIXED-SIZE partial — (count, sum vector, d x d Gramian) — via one
numpy matmul per batch inside ``mapInPandas``; the driver sums the
per-batch partials (numPartitions tiny rows), forms the covariance,
and eigendecomposes d x d locally (d = embedding width, e.g. 64 —
microseconds). No vector ever shuffles; the corpus is read ONCE and
the only data movement is numPartitions x (d*d + d + 1) doubles to
the driver. Projection is a second scan: components ship in the UDF
closure and each batch is one (batch x d) @ (d x k) numpy matmul.

Eigenvector sign is fixed deterministically (largest-|coefficient|
element made positive), so results are stable across runs up to
eigenvalue ties; the covariance partial-sum ORDER still varies with
partitioning, so downstream values carry ~1e-12 float drift — queries
oracle INVARIANTS (orthonormality, variance ordering, per-component
variance == eigenvalue, reconstruction error), not raw digests.

Reference surface: the reference has no PCA; this extends its
embedding family (daft/functions/ai/ embed_text, similarity kernels)
per SURVEY.md §2's pipeline column.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pca_fit", "pca_transform", "embedding_pca"]


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
) -> dict:
    """Fit PCA on ``df[vec_col]``. Returns a plain-python model dict:
    {mean: [d], components: [k][d] (rows = top eigenvectors),
    eigenvalues: [k], explained_variance_ratio: [k], n: int, dim: int}.
    """
    part_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, part_schema).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    if n < 2:
        raise ValueError("pca_fit: need >= 2 vectors")
    k = min(n_components, d)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # k x d
    # deterministic sign: largest-|coefficient| element positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.trace(cov))
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "eigenvalues": evals.tolist(),
        "explained_variance_ratio": (
            (evals / total_var).tolist() if total_var > 0 else [0.0] * k
        ),
        "n": int(n),
        "dim": int(d),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project ``vec_col`` onto the fitted components: out = W(x - mu),
    optionally whitened (divide each coordinate by sqrt(eigenvalue) so
    the projected corpus has unit variance per component). The model
    ships in the UDF closure (k*d doubles); each Arrow batch is one
    numpy matmul — no shuffle, a pure second scan."""
    mu = np.asarray(model["mean"])
    w = np.asarray(model["components"])  # k x d
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(np.asarray(model["eigenvalues"]), eps))
        w = w * scale[:, None]
    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.DoubleType()))
    ]
    schema = T.StructType(out_fields)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - mu) @ w.T
            pdf = pdf.copy()
            pdf[out_col] = list(y)
            yield pdf

    return df.mapInPandas(project, schema)


def embedding_pca(
    df: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    whiten: bool = False,
) -> tuple[DataFrame, dict]:
    """Fit + transform in one call: returns (projected DataFrame with
    ``proj`` appended, model dict)."""
    model = pca_fit(df, vec_col, n_components)
    return pca_transform(df, model, vec_col, whiten=whiten), model
