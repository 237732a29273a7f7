"""Type system mapping — SURVEY §1.2's table as code (reference:
``pub enum DataType``, ``src/daft-schema/src/dtype.rs:17-152``).

``to_spark_type(name)`` resolves a reference dtype name to the Spark
type, applying the documented widenings (unsigned -> next wider signed,
the pyarrow<->Spark convention; Float16 -> float; Time -> long µs;
ns timestamps -> µs).
"""

from __future__ import annotations

from pyspark.sql import types as T

# struct conventions for the multimodal dtypes (SURVEY §1.2)
IMAGE_TYPE = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)

TENSOR_TYPE = T.StructType(
    [
        T.StructField("data", T.ArrayType(T.DoubleType())),
        T.StructField("shape", T.ArrayType(T.LongType())),
    ]
)

SPARSE_TENSOR_TYPE = T.StructType(
    [
        T.StructField("values", T.ArrayType(T.DoubleType())),
        T.StructField("indices", T.ArrayType(T.LongType())),
        T.StructField("shape", T.ArrayType(T.LongType())),
    ]
)

FILE_TYPE = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("mime_type", T.StringType()),
    ]
)

_SCALARS: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # unsigned widening (dtype.rs:38-47 -> SURVEY §1.2)
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(),  # gap: widen
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),  # gap: µs/ns since midnight
    "duration": T.DayTimeIntervalType(),
    "interval": T.CalendarIntervalType(),
    "binary": T.BinaryType(),
    "fixed_size_binary": T.BinaryType(),  # + length invariant
    "uuid": T.StringType(),  # canonical form
    "utf8": T.StringType(),
    "string": T.StringType(),
    "python": T.BinaryType(),  # cloudpickle payload
    "image": IMAGE_TYPE,
    "tensor": TENSOR_TYPE,
    "sparse_tensor": SPARSE_TENSOR_TYPE,
    "file": FILE_TYPE,
}


def to_spark_type(name: str, *params) -> T.DataType:
    """Resolve a reference dtype name (lowercase) to a Spark type.

    Parameterized forms: ``to_spark_type('decimal', p, s)``,
    ``('timestamp', unit[, tz])`` (s/ms/us/ns all land on µs),
    ``('list', inner)``, ``('fixed_size_list', inner, n)``,
    ``('embedding', n)``, ``('map', k, v)``, ``('struct', fields_dict)``.
    """
    key = name.lower()
    if key in _SCALARS:
        return _SCALARS[key]
    if key == "decimal" or key == "decimal128":
        p, s = (params + (38, 18))[:2] if params else (38, 18)
        return T.DecimalType(p, s)
    if key == "timestamp":
        tz = params[1] if len(params) > 1 else None
        return T.TimestampType() if tz else T.TimestampNTZType()
    if key == "list":
        return T.ArrayType(_resolve(params[0]))
    if key == "fixed_size_list":
        return T.ArrayType(_resolve(params[0]))  # + length invariant
    if key == "embedding":
        return T.ArrayType(T.FloatType())
    if key == "map":
        return T.MapType(_resolve(params[0]), _resolve(params[1]))
    if key == "struct":
        fields = params[0]
        return T.StructType([T.StructField(k, _resolve(v)) for k, v in fields.items()])
    if key == "union":
        # gap: tagged struct encoding (dtype.rs:151)
        fields = params[0]
        return T.StructType(
            [T.StructField("tag", T.IntegerType())]
            + [T.StructField(f"f{i}", _resolve(v)) for i, v in enumerate(fields)]
        )
    raise ValueError(f"unknown dtype {name!r}")


def _resolve(x) -> T.DataType:
    if isinstance(x, T.DataType):
        return x
    return to_spark_type(x)
