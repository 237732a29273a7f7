"""Embedding/distance functions — parity with the reference's
``daft/functions/distance.py`` (cosine_distance) and the Embedding
dtype's Spark-ML interop (SURVEY §1.2: ArrayType(Float) +
pyspark.ml.linalg.VectorUDT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from daft_spark.operators.similarity import (  # noqa: F401 (re-export)
    cosine_distance,
    cosine_similarity,
    dot,
    norm,
)


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize_vector(a: Column) -> Column:
    """Unit-normalize an array<float/double> (null if zero norm)."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n))


def to_ml_vector(col: Column | str) -> Column:
    """array<numeric> -> pyspark.ml DenseVector column (VectorUDT) for
    MLlib interop."""
    from pyspark.ml.functions import array_to_vector

    c = F.col(col) if isinstance(col, str) else col
    return array_to_vector(c.cast("array<double>"))


def from_ml_vector(col: Column | str) -> Column:
    """VectorUDT -> array<double>."""
    from pyspark.ml.functions import vector_to_array

    c = F.col(col) if isinstance(col, str) else col
    return vector_to_array(c)
