"""Expression-method parity: the reference's Expression class exposes
~250 methods that each delegate to the flat ``daft.functions``
namespace (reference ``daft/expressions/expressions.py:138`` —
``expr.lower()`` == ``functions.lower(expr)``). Our Expression IS
pyspark.sql.Column, so this module attaches the missing method names
to Column at import, each delegating to ``daft_spark.functions`` with
the column as first argument.

Only names Column does not already define are added — nothing Spark
ships is overridden, so stock PySpark behavior is untouched. DataFrame-
stage operations that a column method cannot express (decode_image and
friends run mapInPandas over a whole frame) raise a TypeError pointing
at the df-stage API rather than silently mis-dispatching.

Caveat (inherent to Column attribute dispatch, same as Spark's own
methods): attribute-style STRUCT FIELD access (``col.year``) is
shadowed for the added names — use ``col["year"]`` / ``getField``,
the form Spark documentation already recommends.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Every public method of the reference Expression class (the class body
# sweep lives in tests/test_expression_parity.py). Hardcoded here: the
# product must not read the reference tree at runtime.
REFERENCE_EXPRESSION_METHODS = [
    "abs", "alias", "any_value", "apply", "approx_count_distinct",
    "approx_percentiles", "arccos", "arccosh", "arcsin", "arcsinh", "arctan",
    "arctan2", "arctanh", "as_py", "ascii", "avg", "between", "bitwise_and",
    "bitwise_or", "bitwise_xor", "bool_and", "bool_or", "capitalize", "cast",
    "cbrt", "ceil", "chunk", "clip", "coalesce", "column_name", "compress",
    "concat", "contains", "convert_image", "convert_time_zone", "cos", "cosh",
    "cosine_distance", "cosine_similarity", "cot", "count", "count_distinct",
    "count_matches", "crop", "csc", "damerau_levenshtein_distance", "date",
    "date_trunc", "day", "day_of_month", "day_of_week", "day_of_year",
    "decode", "decode_image", "decode_image_file", "decompress", "degrees",
    "deserialize", "dot_product", "download", "encode", "encode_image",
    "endswith", "eq_null_safe", "euclidean_distance", "exp", "explode",
    "expm1", "file_exists", "file_path", "file_size", "fill_nan", "fill_null",
    "find", "first_value", "floor", "get", "hamming_distance",
    "hamming_distance_str", "hash", "hdf5_attrs", "hdf5_keys",
    "hdf5_metadata", "hour", "ilike", "image_attribute", "image_channel",
    "image_file_metadata", "image_hash", "image_height", "image_mode",
    "image_to_tensor", "image_width", "is_column", "is_in", "is_inf",
    "is_literal", "is_nan", "is_null", "jaccard_similarity",
    "jaro_similarity", "jaro_winkler_similarity", "jq", "lag", "last_value",
    "lead", "left", "length", "length_bytes", "levenshtein_distance", "like",
    "list_agg", "list_agg_distinct", "list_append", "list_bool_and",
    "list_bool_or", "list_contains", "list_count", "list_distinct",
    "list_filter", "list_flatten", "list_join", "list_map", "list_max",
    "list_mean", "list_min", "list_sort", "list_sum", "ln", "log", "log10",
    "log1p", "log2", "lower", "lpad", "lstrip", "map_get", "map_keys", "max",
    "mean", "median", "microsecond", "millisecond", "min", "minhash",
    "minute", "month", "name", "nanosecond", "negate", "normalize",
    "not_nan", "not_null", "over", "parse_url", "partition_days",
    "partition_hours", "partition_iceberg_bucket",
    "partition_iceberg_truncate", "partition_months", "partition_years",
    "pearson_correlation", "percentile", "pow", "power", "quarter",
    "radians", "regexp", "regexp_count", "regexp_extract",
    "regexp_extract_all", "regexp_replace", "regexp_split", "repeat",
    "replace", "replace_time_zone", "resize", "reverse", "right", "round",
    "rpad", "rstrip", "sec", "second", "serialize", "shift_left",
    "shift_right", "sign", "simhash", "sin", "sinh", "skew", "slice",
    "soundex", "split", "sqrt", "startswith", "stddev", "strftime",
    "string_agg", "strip", "substr", "substring_index", "sum", "tan", "tanh",
    "time", "to_arrow_expr", "to_camel_case", "to_date", "to_datetime",
    "to_kebab_case", "to_snake_case", "to_title_case", "to_unix_epoch",
    "to_upper_camel_case", "to_upper_kebab_case", "to_upper_snake_case",
    "tokenize_decode", "tokenize_encode", "total_days", "total_hours",
    "total_microseconds", "total_milliseconds", "total_minutes",
    "total_nanoseconds", "total_seconds", "translate", "try_cast",
    "try_compress", "try_decode", "try_decompress", "try_deserialize",
    "try_encode", "udf", "unix_date", "unnest", "upload", "upper",
    "value_counts", "var", "video_frames", "video_keyframes",
    "video_metadata", "week_of_year", "year", "product",
]

# operations that run as DataFrame stages (mapInPandas over a frame) —
# a column method cannot express them
_DF_STAGE = {
    "decode_image", "decode_image_file", "resize", "crop", "convert_image",
    "encode_image", "image_to_tensor", "video_frames", "video_keyframes",
    "video_metadata", "hdf5_attrs", "hdf5_keys", "hdf5_metadata",
}

# reference Expression methods whose introspection has no pre-analysis
# Catalyst equivalent (a Column is unresolved until it meets a plan)
_NO_CATALYST = {"as_py", "to_arrow_expr", "is_column", "is_literal"}


def _generic(name):
    def method(self, *args, **kwargs):
        import daft_spark.functions as fns

        return getattr(fns, name)(self, *args, **kwargs)

    method.__name__ = name
    method.__doc__ = f"reference Expression.{name} -> daft_spark.functions.{name}(self, ...)."
    return method


def _df_stage_error(name):
    def method(self, *_a, **_k):
        raise TypeError(
            f"{name} is a DataFrame-stage operation (mapInPandas over a whole "
            f"frame), not a column expression — call "
            f"daft_spark.functions.{name}(df, ...) instead"
        )

    method.__name__ = name
    return method


def _no_catalyst(name):
    def method(self, *_a, **_k):
        raise NotImplementedError(
            f"{name}: Catalyst Columns are unresolved until bound to a plan, "
            "so literal/column introspection is not available pre-analysis"
        )

    method.__name__ = name
    return method


# methods whose argument order/shape differs from the flat function
def _log(self, base=None):
    return F.log(self) if base is None or base == math.e else F.log(float(base), self)


def _count(self, mode: str = "valid"):
    if mode == "null":
        from daft_spark.functions.aggs import count_null

        return count_null(self)
    return F.count(self) if mode == "valid" else F.count(F.lit(1))


def _date_trunc(self, unit: str):
    return F.date_trunc(unit, self)


def _fill_nan(self, value):
    return F.nanvl(self, value if isinstance(value, Column) else F.lit(value))


def _negate(self):
    return -self


def _is_inf(self):
    return (self == float("inf")) | (self == float("-inf"))


def _not_nan(self):
    return ~F.isnan(self)


def _length_bytes(self):
    return F.octet_length(self)


def _slice(self, start: int, end: int | None = None):
    """Reference list slice: 0-indexed, end-exclusive -> Spark's
    1-indexed (start, length)."""
    length = (end - start) if end is not None else (1 << 30)
    return F.slice(self, start + 1, length)


def _serialize(self, format: str = "json"):  # noqa: A002
    from daft_spark.functions.misc import serialize

    return serialize(self)


def _deserialize(self, format: str = "json", dtype=None):  # noqa: A002
    from daft_spark.functions.misc import deserialize

    return deserialize(self, dtype)


def _try_deserialize(self, format: str = "json", dtype=None):  # noqa: A002
    return _deserialize(self, format, dtype)


def _apply(self, fn, return_dtype: str = "string"):
    """reference Expression.apply — wrap a plain Python fn as a UDF and
    apply it (Arrow scalar path)."""
    from daft_spark.udf import func

    return func(return_dtype=return_dtype)(fn)(self)


def _udf(self, fn, return_dtype: str = "string"):
    return _apply(self, fn, return_dtype)


def _column_name(self):
    """Best-effort pre-analysis name (reference column_name): the
    trailing alias/name token of the unresolved expression."""
    text = str(self)  # Column<'... AS name'> or Column<'name'>
    inner = text[len("Column<'") : -len("'>")] if text.startswith("Column<'") else text
    if " AS " in inner:
        return inner.rsplit(" AS ", 1)[1]
    return inner


_ADAPTERS = {
    "log": _log,
    "count": _count,
    "date_trunc": _date_trunc,
    "fill_nan": _fill_nan,
    "negate": _negate,
    "is_inf": _is_inf,
    "not_nan": _not_nan,
    "length_bytes": _length_bytes,
    "slice": _slice,
    "serialize": _serialize,
    "deserialize": _deserialize,
    "try_deserialize": _try_deserialize,
    "apply": _apply,
    "udf": _udf,
    "column_name": _column_name,
}


def install() -> None:
    """Attach the missing reference Expression methods to Column.
    Idempotent; never overrides an attribute Spark defines."""
    for name in REFERENCE_EXPRESSION_METHODS:
        if hasattr(Column, name):
            continue
        if name in _ADAPTERS:
            setattr(Column, name, _ADAPTERS[name])
        elif name in _DF_STAGE:
            setattr(Column, name, _df_stage_error(name))
        elif name in _NO_CATALYST:
            setattr(Column, name, _no_catalyst(name))
        else:
            setattr(Column, name, _generic(name))


install()
