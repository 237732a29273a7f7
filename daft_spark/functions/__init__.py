"""daft_spark.functions — the scalar/aggregate function library
(SURVEY §2.6 parity). Submodules by family:

- strings, dt (datetime), numeric, lists, misc (hash/null/struct/map/
  binary/bitwise/json/url), aggs (product/count-modes/string_agg),
  text (tokenize/quality/langid/fingerprint), embedding (cosine/ML
  interop), columnar (horizontal reductions), partitioning (iceberg
  transforms).

Import a family: ``from daft_spark.functions import strings as S``.

FLAT NAMESPACE (reference parity): the reference exposes one flat
``daft.functions`` namespace (reference ``daft/functions/__init__.py``),
so this module also re-exports every family function at the top level
(list functions under their reference ``list_*`` spellings), and any
name not defined here falls through to ``pyspark.sql.functions`` via
PEP 562 module ``__getattr__`` — ``from daft_spark.functions import
lower, arccos, minhash, cosine_distance`` all resolve, matching the
import lines a reference user already has.
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

# ---------------------------------------------------------------------------
# flat re-exports

# trailing-underscore spellings (builtin-shadow avoidance in the family
# modules) -> the reference's flat names
_RENAMES = {
    "abs_": "abs",
    "bin_": "bin",
    "ascii_": "ascii_func",
    "chr_": "chr_func",
    "round_": "round",
    "pow_": "pow",
    "hash_": "hash",
    "slice_": "slice",
    "filter_": "filter",
    "count_": "count",
}


def _family_exports(mod):
    out = {}
    for n in dir(mod):
        if n.startswith("_"):
            continue
        fn = getattr(mod, n)
        if not callable(fn) or not getattr(fn, "__module__", "").startswith("daft_spark"):
            continue
        out[_RENAMES.get(n, n)] = fn
    return out


# precedence: earlier families win name collisions (reference `contains`
# is the string one; the list variant is `list_contains` below)
for _m in (strings, dt, numeric, misc, aggs, text, embedding, columnar, files, window_fns):
    for _n, _fn in _family_exports(_m).items():
        globals().setdefault(_n, _fn)

# list functions under the reference's list_* spellings
for _n, _fn in _family_exports(lists).items():
    globals().setdefault(_n if _n.startswith("list_") else f"list_{_n}", _fn)

# partitioning transforms under the reference's partition_* spellings
for _n, _fn in _family_exports(partitioning).items():
    globals().setdefault(f"partition_{_n}" if not _n.startswith("partition_") else _n, _fn)


# reference names implemented in other daft_spark modules (multimodal
# stages, dedup/similarity operators) — resolved lazily so importing
# the functions namespace never pulls pandas/multimodal machinery
_MODULE_ALIASES = {
    "simhash": ("daft_spark.operators.dedup", "simhash64"),
    "minhash_signature": ("daft_spark.operators.dedup", "minhash_signature"),
    "decode_image": ("daft_spark.multimodal.image", "decode_image"),
    "decode_image_file": ("daft_spark.multimodal.image", "decode_image_file"),
    "resize": ("daft_spark.multimodal.image", "resize"),
    "crop": ("daft_spark.multimodal.image", "crop"),
    "encode_image": ("daft_spark.multimodal.image", "encode_image"),
    "convert_image": ("daft_spark.multimodal.image", "convert_image"),
    "image_to_tensor": ("daft_spark.multimodal.image", "image_to_tensor"),
    "image_attribute": ("daft_spark.multimodal.image", "image_attribute"),
    "image_hash": ("daft_spark.multimodal.image", "image_hash"),
    "image_width": ("daft_spark.multimodal.image", "image_width"),
    "image_height": ("daft_spark.multimodal.image", "image_height"),
    "image_mode": ("daft_spark.multimodal.image", "image_mode"),
    "image_channel": ("daft_spark.multimodal.image", "image_channel"),
    "video_metadata": ("daft_spark.multimodal.av", "video_metadata"),
    "video_frames": ("daft_spark.multimodal.av", "video_frames"),
    "video_keyframes": ("daft_spark.multimodal.av", "video_keyframes"),
    "get_video_frame_by_idx": ("daft_spark.multimodal.av", "get_video_frame_by_idx"),
    "audio_metadata": ("daft_spark.multimodal.av", "audio_metadata"),
    "resample": ("daft_spark.multimodal.av", "resample"),
    "llm_generate": ("daft_spark.multimodal.llm", "llm_generate"),
    "embed_text": ("daft_spark.multimodal.llm", "embed_text"),
    "embed_image": ("daft_spark.multimodal.llm", "embed_image"),
    "classify_text": ("daft_spark.multimodal.llm", "classify_text"),
    "classify_image": ("daft_spark.multimodal.llm", "classify_image"),
    "prompt": ("daft_spark.multimodal.llm", "prompt"),
    "download": ("daft_spark.multimodal.url", "download"),
    "upload": ("daft_spark.multimodal.url", "upload"),
    "run_process": ("daft_spark.functions.process", "run_process"),
    "dot_product": ("daft_spark.functions.embedding", "dot"),
    "format": ("daft_spark.functions.strings", "format_string"),
    "chunk": ("daft_spark.functions.lists", "chunk"),
    "value_counts": ("daft_spark.functions.lists", "value_counts"),
    "jq": ("daft_spark.functions.misc", "jq"),
}

# reference spellings whose pyspark.sql.functions name differs
_SPARK_ALIASES = {
    "arccos": "acos",
    "arccosh": "acosh",
    "arcsin": "asin",
    "arcsinh": "asinh",
    "arctan": "atan",
    "arctan2": "atan2",
    "arctanh": "atanh",
    "is_in": "isin",
    "is_nan": "isnan",
    "is_null": "isnull",
    "fill_nan": "nanvl",
    "day_of_month": "dayofmonth",
    "day_of_week": "dayofweek",
    "day_of_year": "dayofyear",
    "week_of_year": "weekofyear",
    "string_agg": "listagg",
    "list_agg": "collect_list",
    "list_agg_distinct": "collect_set",
    "strip": "trim",
    "lstrip": "ltrim",
    "rstrip": "rtrim",
    "power": "pow",
    "to_list": "collect_list",
    "skew": "skewness",
    "var": "variance",
    "approx_percentiles": "percentile_approx",
    "list_sort": "sort_array",
    "list_map": "transform",
    "seq": "sequence",
    "pearson_correlation": "corr",
    "nanvl": "nanvl",
}


def __getattr__(name: str):
    """Fallback resolution, in order: (1) reference names implemented
    in other daft_spark modules, (2) pyspark.sql.functions under the
    reference spelling or an alias — flat-namespace parity without
    re-listing ~300 built-ins Spark already provides."""
    if name in _MODULE_ALIASES:
        import importlib

        mod, attr = _MODULE_ALIASES[name]
        return getattr(importlib.import_module(mod), attr)
    from pyspark.sql import functions as F

    target = _SPARK_ALIASES.get(name, name)
    fn = getattr(F, target, None)
    if fn is not None:
        return fn
    raise AttributeError(f"module 'daft_spark.functions' has no attribute {name!r}")
