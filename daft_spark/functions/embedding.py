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


def _col(x):
    return F.col(x) if isinstance(x, str) else x


def hamming_distance(a, b):
    """reference distance.py hamming_distance — element-wise mismatch
    count of two equal-length vectors (codegen zip_with + aggregate)."""
    pairs = F.zip_with(_col(a), _col(b), lambda x, y: (x != y).cast("int"))
    return F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x)


def great_circle_distance(lat1, lon1, lat2, lon2, radius_km: float = 6371.0088):
    """reference spatial.py great_circle_distance — haversine over
    degree coordinates, pure column exprs (km)."""
    rlat1, rlat2 = F.radians(_col(lat1)), F.radians(_col(lat2))
    dlat = F.radians(_col(lat2) - _col(lat1))
    dlon = F.radians(_col(lon2) - _col(lon1))
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2 * radius_km) * F.asin(F.sqrt(h))


def jaccard_similarity(a, b):
    """reference distance.py jaccard_similarity — |A∩B| / |A∪B| of two
    array columns, pure set exprs."""
    ca, cb = _col(a), _col(b)
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))
