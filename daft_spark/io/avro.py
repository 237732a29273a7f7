"""Minimal pure-Python Avro Object Container File codec.

Iceberg's metadata tree (manifest lists and manifests) is stored as
Avro OCF — the container has no ``avro``/``fastavro`` package, so this
module implements the bounded subset of the Avro 1.11 spec
(https://avro.apache.org/docs/1.11.1/specification/) that table-format
metadata needs:

- types: null, boolean, int, long, float, double, bytes, string, fixed,
  enum, record, array, map, and unions thereof (including named-type
  references, which Iceberg manifests use for the partition struct)
- codecs: ``null`` and ``deflate`` (raw zlib) on read; ``null`` on write
- logical types are passed through untouched (Iceberg readers interpret
  them from the schema, not the bytes)

Decoding is schema-driven from the writer schema embedded in the file
header — no schema resolution/evolution (the reader sees exactly what
the writer wrote), which is the correct contract for replaying a
table's own metadata files.

This is metadata-plane code: manifests are KBs-to-MBs and parsed on the
driver; the data plane stays Spark's parquet scan.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive codecs


def _write_long(out: io.BytesIO, n: int) -> None:
    """zigzag + base-128 varint."""
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated avro varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated avro bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven encode/decode


def _resolve(schema, names: dict):
    """Resolve a named-type reference string to its definition."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _register(schema: dict, names: dict) -> None:
    if isinstance(schema, dict) and schema.get("name") and schema.get("type") in (
        "record",
        "fixed",
        "enum",
    ):
        names[schema["name"]] = schema


def encode(out: io.BytesIO, schema, value, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: branch index + value
        idx = _union_branch(schema, value, names)
        _write_long(out, idx)
        encode(out, schema[idx], value, names)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "fixed":
        out.write(bytes(value))
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            if f["name"] in value:
                fv = value[f["name"]]
            elif "default" in f:
                fv = f["default"]  # Avro writer-side default
            else:
                raise KeyError(f"record field {f['name']!r} missing and has no default")
            encode(out, f["type"], fv, names)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                encode(out, schema["items"], item, names)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                encode(out, schema["values"], v, names)
        _write_long(out, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _union_branch(union: list, value, names: dict) -> int:
    for i, branch in enumerate(union):
        b = _resolve(branch, names)
        bt = b["type"] if isinstance(b, dict) else b
        if value is None and bt == "null":
            return i
        if value is not None and bt != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {union}")


def decode(buf: io.BytesIO, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        return decode(buf, schema[_read_long(buf)], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        _register(schema, names)
        return {f["name"]: decode(buf, f["type"], names) for f in schema["fields"]}
    if t in ("array", "map"):
        out = [] if t == "array" else {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                if t == "array":
                    out.append(decode(buf, schema["items"], names))
                else:
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = decode(buf, schema["values"], names)
        return out
    raise NotImplementedError(f"avro type {t!r}")


def _collect_names(schema, names: dict) -> None:
    """Pre-register every named type in a schema tree (references may
    appear before use order when decoding sub-branches)."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
    elif isinstance(schema, dict):
        _register(schema, names)
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", []):
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema.get("items"), names)
        elif t == "map":
            _collect_names(schema.get("values"), names)


# ---------------------------------------------------------------------------
# object container files


def write_ocf(path: str, schema: dict, records: list[dict], metadata: dict | None = None) -> None:
    """Write an Avro OCF (codec null) atomically (temp + rename)."""
    names: dict = {}
    _collect_names(schema, names)
    sync = os.urandom(16)
    body = io.BytesIO()
    for rec in records:
        encode(body, schema, rec, names)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_bytes(out, body.getvalue())
        out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


def read_ocf(path: str) -> tuple[dict, dict, list[dict]]:
    """Read an Avro OCF -> (writer_schema, metadata, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path} is not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} (null/deflate supported)")
    sync = buf.read(16)
    names: dict = {}
    _collect_names(schema, names)
    records: list[dict] = []
    while True:
        try:
            count = _read_long(buf)
        except EOFError:
            break
        block = _read_bytes(buf)
        if buf.read(16) != sync:
            raise ValueError(f"avro sync marker mismatch in {path}")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(decode(bbuf, schema, names))
    return schema, meta, records
