"""Misc functions — Daft-name parity (reference:
``daft/functions/misc.py``, 1,040 LoC: monotonically_increasing_id,
uuid, random, eq_null_safe, cast/try_cast, null handling, is_in, hash,
minhash/simhash handles, length, concat, coalesce, when) + struct/map
accessors (``daft/functions/struct.py``, ``misc.py:658-814``) + binary
(``binary.py``) + bitwise (``bitwise.py``) + json (``str.py:13-175``)
+ url parsing (``url.py:149``).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


# --- identity / random ------------------------------------------------------
def monotonically_increasing_id():
    return F.monotonically_increasing_id()


def uuid4():
    """Random v4 UUID per row (reference misc.py:53). Non-deterministic
    across retries — same caveat as the reference."""
    return F.uuid()


def random_int(seed: int | None = None):
    return (F.rand(seed) * F.lit(2**31)).cast("long")


def uuid7():
    """Time-ordered v7 UUID per row (reference misc.py:53 uuid v7):
    48-bit unix-ms timestamp + random tail — generated in a pandas UDF
    (non-deterministic by design, like the reference)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _u7(s: pd.Series) -> pd.Series:
        import os
        import time

        out = []
        for _ in range(len(s)):
            ms = int(time.time() * 1000)
            rnd = os.urandom(10)
            b = ms.to_bytes(6, "big") + rnd
            b = bytearray(b)
            b[6] = (b[6] & 0x0F) | 0x70  # version 7
            b[8] = (b[8] & 0x3F) | 0x80  # variant
            h = bytes(b).hex()
            out.append(f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}")
        return pd.Series(out)

    return _u7(F.lit(1))


def uuid7_timestamp(col):
    """Extract the embedded ms timestamp from a v7 UUID (reference
    partitioning.py uuid7 extractors) — pure JVM expression."""
    c = _c(col)
    ms_hex = F.concat(F.substring(c, 1, 8), F.substring(c, 10, 4))
    return F.timestamp_millis(F.conv(ms_hex, 16, 10).cast("long"))


# --- comparisons / null handling -------------------------------------------
def eq_null_safe(a, b):
    return _c(a).eqNullSafe(_c(b))


def cast(col, dtype: str):
    return _c(col).cast(dtype)


def try_cast(col, dtype: str):
    return _c(col).try_cast(dtype)


def is_null(col):
    return _c(col).isNull()


def not_null(col):
    return _c(col).isNotNull()


def fill_null(col, value):
    return F.coalesce(_c(col), value if isinstance(value, Column) else F.lit(value))


def is_in(col, values):
    return _c(col).isin(*values)


def coalesce(*cols):
    return F.coalesce(*[_c(c) for c in cols])


def if_else(cond, if_true, if_false):
    return F.when(_c(cond), if_true).otherwise(if_false)


when = F.when  # re-export for WhenExpr parity (misc.py:905)


# --- hashing ----------------------------------------------------------------
def hash_(*cols, seed: int | None = None):
    """64-bit hash (reference misc.py:388 hash -> xxhash64)."""
    if seed is not None:
        return F.xxhash64(F.lit(seed), *[_c(c) for c in cols])
    return F.xxhash64(*[_c(c) for c in cols])


def minhash(col, num_hashes: int = 64, ngram_size: int = 3, seed: int = 1):
    """MinHash signature column (reference misc.py:428; kernels
    src/daft-minhash/). See operators/dedup.py for the scale pipeline."""
    from daft_spark.operators.dedup import minhash_signature, shingles_of

    return minhash_signature(shingles_of(_c(col), ngram_size), num_hashes)


def length(col):
    return F.length(_c(col))


def concat(*cols):
    return F.concat(*[_c(c) for c in cols])


# --- struct / map -----------------------------------------------------------
def to_struct(*cols, **named):
    parts = [_c(c) for c in cols] + [_c(v).alias(k) for k, v in named.items()]
    return F.struct(*parts)


def unnest(col):
    """struct -> columns: use df.select(unnest(c)) (reference struct.py:8)."""
    return _c(col)["*"]


def get_field(col, field: str):
    return _c(col).getField(field)


def map_get(col, key):
    return F.element_at(_c(col), key)


def map_keys(col):
    return F.map_keys(_c(col))


def map_values(col):
    return F.map_values(_c(col))


# --- binary -----------------------------------------------------------------
def encode(col, charset: str = "utf-8"):
    return F.encode(_c(col), charset.upper())


def decode(col, charset: str = "utf-8"):
    return F.decode(_c(col), charset.upper())


def base64_encode(col):
    return F.base64(_c(col))


def base64_decode(col):
    return F.unbase64(_c(col))


def hex_encode(col):
    return F.hex(_c(col))


def hex_decode(col):
    return F.unhex(_c(col))


def compress(col, codec: str = "gzip"):
    """Binary compression (reference binary.py compress — gzip/zlib).
    Pandas-UDF path: compression codecs are not Spark expressions."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gz(s):
        import gzip
        import zlib
        import pandas as pd

        fn = gzip.compress if codec == "gzip" else zlib.compress
        return pd.Series(
            [fn(x.encode() if isinstance(x, str) else x) if x is not None else None for x in s]
        )

    return _gz(_c(col))


def decompress(col, codec: str = "gzip"):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gunz(s):
        import gzip
        import zlib
        import pandas as pd

        fn = gzip.decompress if codec == "gzip" else zlib.decompress
        return pd.Series([fn(x) if x is not None else None for x in s])

    return _gunz(_c(col))


# --- bitwise (reference bitwise.py:8-41) ------------------------------------
def bitwise_and(a, b):
    return _c(a).bitwiseAND(_c(b))


def bitwise_or(a, b):
    return _c(a).bitwiseOR(_c(b))


def bitwise_xor(a, b):
    return _c(a).bitwiseXOR(_c(b))


def shift_left(col, n):
    return F.shiftleft(_c(col), n)


def shift_right(col, n):
    return F.shiftright(_c(col), n)


# --- json (reference str.py:13-175, src/daft-functions-json/) ---------------
def json_query(col, path: str):
    """jq-style query — Spark's get_json_object covers the common
    `$.a.b[0]` subset (reference `jq` full generality would need a UDF)."""
    return F.get_json_object(_c(col), path)


def deserialize(col, schema):
    return F.from_json(_c(col), schema)


def serialize(col):
    return F.to_json(_c(col))


def json_array_length(col, path: str | None = None):
    c = _c(col) if path is None else F.get_json_object(_c(col), path)
    return F.json_array_length(c)


def json_object_keys(col):
    return F.json_object_keys(_c(col))


def json_tuple(col, *fields):
    return F.json_tuple(_c(col), *fields)


# --- url (reference url.py:149 parse_url) -----------------------------------
def parse_url(col, part: str | None = None):
    """Reference parse_url: a STRUCT of the eight URL components
    (scheme, username, password, host, port, path, query, fragment) —
    all pure Column expressions over Spark's parse_url parts (userinfo
    split for the credentials, an authority-suffix regex for the
    port). Passing ``part`` keeps the Spark single-part extractor for
    callers that want one field without the struct."""
    c = _c(col)
    if part is not None:
        return F.parse_url(c, F.lit(part))
    userinfo = F.parse_url(c, F.lit("USERINFO"))
    creds = F.split(userinfo, ":", 2)
    authority = F.parse_url(c, F.lit("AUTHORITY"))
    port_s = F.regexp_extract(F.coalesce(authority, F.lit("")), r":(\d+)$", 1)
    return F.struct(
        F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
        F.when(userinfo.isNotNull(), F.element_at(creds, 1)).alias("username"),
        F.when(F.size(creds) > 1, F.element_at(creds, 2)).alias("password"),
        F.parse_url(c, F.lit("HOST")).alias("host"),
        F.when(port_s != "", port_s.cast("int")).alias("port"),
        F.parse_url(c, F.lit("PATH")).alias("path"),
        F.parse_url(c, F.lit("QUERY")).alias("query"),
        F.parse_url(c, F.lit("REF")).alias("fragment"),
    )


# --- python-object columns (reference DataType::Python, dtype.rs:146) --------
def py_serialize(col):
    """Arbitrary python objects -> BinaryType via cloudpickle — the
    SURVEY §1.2 convention for the reference's Python dtype. Round-trip
    cost is real; keep object columns out of hot paths."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _ser(s: pd.Series) -> pd.Series:
        from pyspark import cloudpickle

        return pd.Series([cloudpickle.dumps(x) if x is not None else None for x in s])

    return _ser(_c(col))


def py_deserialize(col):
    """BinaryType cloudpickle payload -> python objects (surfaces as
    object dtype inside pandas UDFs; bytes at the Spark level)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _de(s: pd.Series) -> pd.Series:
        # kept binary at the Spark boundary; decode where consumed
        return s

    return _de(_c(col))


def apply_on_pickled(col, fn, return_dtype: str = "string"):
    """Run ``fn(obj)`` over a cloudpickled object column — the usable
    form of Python-dtype computation (deserialize -> fn -> result)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(return_dtype)
    def _app(s: pd.Series) -> pd.Series:
        from pyspark import cloudpickle

        return pd.Series(
            [fn(cloudpickle.loads(x)) if x is not None else None for x in s]
        )

    return _app(_c(col))


def jq(col, path: str):
    """reference misc.py jq — JSONPath-style extraction; alias of
    json_query (get_json_object)."""
    return json_query(col, path)


def try_encode(col, charset: str = "utf-8"):
    """encode, null on failure (reference try_encode). Spark's encode
    never throws for supported charsets; unknown charsets -> null."""
    try:
        return encode(col, charset)
    except Exception:
        return F.lit(None).cast("binary")


def try_decode(col, charset: str = "utf-8"):
    """decode, null on failure (reference try_decode). Spark's decode
    substitutes U+FFFD for invalid bytes rather than throwing, so the
    try-variant differs only for unknown charsets (-> null)."""
    try:
        return decode(col, charset)
    except Exception:
        return F.lit(None).cast("string")


def try_compress(col, codec: str = "gzip"):
    """compress, null on unknown codec (reference try_compress —
    compress() itself defaults unknown codecs to zlib, so the codec
    check must happen here)."""
    if codec not in ("gzip", "zlib"):
        return F.lit(None).cast("binary")
    return compress(col, codec)


def try_decompress(col, codec: str = "gzip"):
    """decompress, null per-row on corrupt payload (reference
    try_decompress)."""
    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    if codec not in ("gzip", "zlib"):
        return F.lit(None).cast("binary")

    @pandas_udf("binary")
    def _try_gunz(s: pd.Series) -> pd.Series:
        import gzip as _g
        import zlib as _z

        def one(b):
            if b is None:
                return None
            try:
                return _g.decompress(bytes(b)) if codec == "gzip" else _z.decompress(bytes(b))
            except Exception:
                return None

        return pd.Series([one(b) for b in s])

    return _try_gunz(_c(col))


def try_deserialize(col, schema):
    """from_json is already permissive (null on malformed input), so
    this IS Spark's deserialize (reference try_deserialize)."""
    return deserialize(col, schema)


def extract_month_uuid7(col):
    """reference misc.py extract_month_uuid7 — calendar field of the
    uuid7 embedded timestamp."""
    return F.month(uuid7_timestamp(col))


def extract_day_uuid7(col):
    return F.dayofmonth(uuid7_timestamp(col))


def extract_hour_uuid7(col):
    return F.hour(uuid7_timestamp(col))


def extract_minute_uuid7(col):
    return F.minute(uuid7_timestamp(col))
