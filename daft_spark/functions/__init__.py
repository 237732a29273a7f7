"""daft_spark.functions — the scalar/aggregate function library
(SURVEY §2.6 parity). Submodules by family:

- strings, dt (datetime), numeric, lists, misc (hash/null/struct/map/
  binary/bitwise/json/url), aggs (product/count-modes/string_agg),
  text (tokenize/quality/langid/fingerprint), embedding (cosine/ML
  interop), columnar (horizontal reductions), partitioning (iceberg
  transforms).

Import a family: ``from daft_spark.functions import strings as S``.
"""

from daft_spark.functions import (  # noqa: F401
    aggs,
    columnar,
    dt,
    embedding,
    files,
    lists,
    misc,
    numeric,
    partitioning,
    strings,
    text,
    window_fns,
)
