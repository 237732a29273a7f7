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


# ---------------------------------------------------------------------------
# reference-style public type surface (daft.DataType / Schema / TimeUnit
# / media enums — reference daft/datatype.py, daft/schema.py)


class _DataTypeMeta(type):
    def __getattr__(cls, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def factory(*params):
            return to_spark_type(name, *params)

        factory.__name__ = name
        return factory


class DataType(metaclass=_DataTypeMeta):
    """daft.DataType parity: every reference constructor
    (``DataType.int64()``, ``DataType.string()``,
    ``DataType.list(inner)``, ``DataType.embedding(dim)``, ...) returns
    the mapped Spark type via :func:`to_spark_type` — the widening
    rules of SURVEY §1.2 apply."""

    @staticmethod
    def from_arrow_type(at):
        import pyarrow as pa  # noqa: F401
        from pyspark.sql.pandas.types import from_arrow_type as _fat

        return _fat(at)


# Schema is Spark's StructType (Delta inherited this serialization too);
# Series is the pandas Series (the per-column container crossing every
# Arrow UDF boundary); Expression is Spark's Column.
from pyspark.sql import Column as Expression  # noqa: E402, F401
from pyspark.sql.types import StructType as Schema  # noqa: E402, F401

try:  # pandas is a hard dep of pyspark's pandas-UDF path
    from pandas import Series  # noqa: F401
except ImportError:  # pragma: no cover
    Series = None


class TimeUnit:
    """reference TimeUnit — Spark timestamps are µs; s/ms widen, ns
    truncates on ingest (SURVEY §1.2)."""

    @staticmethod
    def s() -> str:
        return "s"

    @staticmethod
    def ms() -> str:
        return "ms"

    @staticmethod
    def us() -> str:
        return "us"

    @staticmethod
    def ns() -> str:
        return "ns"


class ImageMode:
    """reference ImageMode enum (pixel layouts)."""

    L = "L"
    LA = "LA"
    RGB = "RGB"
    RGBA = "RGBA"


class ImageFormat:
    """reference ImageFormat enum (container codecs)."""

    PNG = "PNG"
    JPEG = "JPEG"
    TIFF = "TIFF"
    GIF = "GIF"
    BMP = "BMP"


class ImageProperty:
    """reference ImageProperty enum (image_attribute accessors)."""

    HEIGHT = "height"
    WIDTH = "width"
    MODE = "mode"
    CHANNEL = "channel"


class UnionMode:
    """reference UnionMode — tagged-struct encoding on Spark."""

    SPARSE = "sparse"
    DENSE = "dense"


class MediaType:
    """reference MediaType — the typed-file kind tags
    (functions/files.py typed constructors)."""

    IMAGE = "image"
    AUDIO = "audio"
    VIDEO = "video"
    DOCUMENT = "document"
    UNKNOWN = "unknown"


class File:
    """Typed file reference (reference daft.File): path + lazily
    statted size/mime. The column-level counterpart is
    functions.files.file()."""

    kind = MediaType.UNKNOWN

    def __init__(self, path: str):
        self.path = path

    @property
    def size(self) -> int | None:
        import os

        p = self.path[7:] if self.path.startswith("file://") else self.path
        try:
            return os.path.getsize(p)
        except OSError:
            return None

    def read(self) -> bytes:
        p = self.path[7:] if self.path.startswith("file://") else self.path
        with open(p, "rb") as f:
            return f.read()

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.path!r})"


class ImageFile(File):
    kind = MediaType.IMAGE


class AudioFile(File):
    kind = MediaType.AUDIO


class VideoFile(File):
    kind = MediaType.VIDEO


class Hdf5File(File):
    """reference Hdf5File — reading requires h5py (absent from this
    container); the reference's hdf5 accessors are gated the same way."""

    kind = MediaType.DOCUMENT

    def keys(self):
        raise NotImplementedError("hdf5 access requires the h5py package")
