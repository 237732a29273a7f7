"""Pure-Python Delta Lake table support — no connector JAR required.

Parity target: the reference reads Delta tables without Spark via the
``deltalake`` (delta-rs) package (reference ``daft/io/delta_lake/
_deltalake.py:22`` read_deltalake, ``daft/dataframe/dataframe.py``
write_deltalake). This container has neither delta-spark JARs nor
delta-rs, but the Delta transaction protocol is an open spec
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): a table is
a directory of parquet data files plus ``_delta_log/<version>.json``
commits, each a newline-delimited list of actions (protocol, metaData,
add, remove). This module implements the bounded subset a batch engine
needs:

- ``write_deltalake(df, path, mode)``: append / overwrite / error /
  ignore. Data files are written with Spark's parquet writer into the
  table directory; the commit JSON is staged to a temp file and
  os.rename()'d into the log — the same single-writer atomicity local
  delta-rs relies on for file:// tables.
- ``read_deltalake(path, version=None)``: replays the log (adds minus
  removes) up to ``version`` (time travel), then reads the active
  parquet files with the session's parquet reader, pinning the schema
  from the latest ``metaData.schemaString`` (which IS a Spark
  StructType JSON — Delta inherited Spark's schema serialization).
- Checkpoints: the writer emits a classic single-file parquet
  checkpoint (``<v>.checkpoint.parquet`` + ``_last_checkpoint``) every
  10 commits; the reader starts replay from the newest checkpoint at or
  below the requested version, so tables whose early JSON commits were
  vacuumed away (the normal state of any long-lived Delta table) still
  read correctly.
- Partitioned tables: hive-layout data files with
  ``metaData.partitionColumns``; the reader restores partition columns
  from each add action's ``partitionValues`` (one scan per live
  partition value combination, unioned — driver-side plan cost is
  O(live partitions), the same as delta-rs's file-pruning walk).

Deletion vectors (reader v3 tables whose only reader feature is
deletionVectors) are SUPPORTED merge-on-read: delete_deltalake_dv_py
tombstones matching rows into roaring-bitmap DV files (io/roaring.py —
the spec's RoaringBitmapArray portable format + the DV file framing
version/size/CRC32) without rewriting data, and the reader drops the
positions via _metadata.row_index anti-join.

Column mapping (PROTOCOL.md §Column Mapping) is SUPPORTED for read /
append / schema evolution: set_column_mapping_delta_py upgrades a
table in place (physical names = current names, the delta-spark
upgrade convention), evolve_delta_schema renames/adds/drops logical
columns metadata-only, readers resolve data files by physicalName and
key partition values by physical name. DML on mapped tables is gated.

Checkpoint READ covers every spec layout: classic single-file,
legacy multi-part (<v>.checkpoint.<o>.<p>.parquet, complete sets
only), and V2 (<v>.checkpoint.<uuid>.{json,parquet} manifests with
sidecar files under _delta_log/_sidecars/). The writer emits classic
checkpoints, which every Delta reader accepts.

Out of scope (raise cleanly): other v3 reader features,
nested-column mapping.

At 100 TB the log replay is driver-side metadata work (KBs per commit);
the data path is an ordinary multi-file parquet scan with the usual
pushdowns, so scale behavior is identical to reading raw parquet.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

_LOG_DIR = "_delta_log"
_MAX_SUPPORTED = {"minReaderVersion": 1, "minWriterVersion": 2}

# PROTOCOL.md: legacy protocol versions imply feature sets; an upgrade
# to table features (reader 3 / writer 7) must carry these forward so
# external writers keep enforcing them.
_LEGACY_WRITER_FEATURES = {
    2: ("appendOnly", "invariants"),
    3: ("checkConstraints",),
    4: ("changeDataFeed", "generatedColumns"),
    5: ("columnMapping",),
    6: ("identityColumns",),
}
_LEGACY_READER_FEATURES = {2: ("columnMapping",)}


def _current_protocol(table_path: str) -> dict:
    """Latest protocol action in the log (spec default reader1/writer2
    when none was ever written)."""
    proto: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
    ckpts = _checkpoint_versions(table_path)
    start_after = -1
    if ckpts:
        for row in _checkpoint_rows(table_path, ckpts[-1]):
            p = row.get("protocol")
            if p and p.get("minReaderVersion") is not None:
                proto = {k: v for k, v in p.items() if v is not None}
        start_after = ckpts[-1]
    for v in _list_versions(table_path):
        if v <= start_after:
            continue
        with open(_commit_file(table_path, v)) as f:
            for line in f:
                line = line.strip()
                if line:
                    a = json.loads(line)
                    if "protocol" in a:
                        proto = a["protocol"]
    return proto


def _upgraded_dv_protocol(table_path: str) -> dict:
    """The protocol action for a deletion-vector upgrade: (3, 7) with
    deletionVectors PLUS every feature the table's previous protocol
    implied (explicit feature lists carried as-is; legacy versions
    expanded via the PROTOCOL.md implication tables)."""
    prior = _current_protocol(table_path)
    r, w = prior.get("minReaderVersion", 1), prior.get("minWriterVersion", 2)
    reader_feats = set(prior.get("readerFeatures") or [])
    writer_feats = set(prior.get("writerFeatures") or [])
    if w < 7:
        for v in range(2, w + 1):
            writer_feats.update(_LEGACY_WRITER_FEATURES.get(v, ()))
    if r < 3:
        for v in range(2, r + 1):
            reader_feats.update(_LEGACY_READER_FEATURES.get(v, ()))
    reader_feats.add("deletionVectors")
    writer_feats.add("deletionVectors")
    return {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": sorted(reader_feats),
        "writerFeatures": sorted(writer_feats),
    }


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, _LOG_DIR)


def _commit_file(table_path: str, version: int) -> str:
    return os.path.join(_log_path(table_path), f"{version:020d}.json")


def _list_versions(table_path: str) -> list[int]:
    log = _log_path(table_path)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append(int(f[:-5]))
    return sorted(out)


def _checkpoint_files(table_path: str) -> dict[int, tuple[str, list[str]]]:
    """version -> (kind, files) for every discoverable checkpoint:
    ``classic`` (<v>.checkpoint.parquet), ``multipart`` (the legacy
    <v>.checkpoint.<o>.<p>.parquet series, complete sets only) and
    ``v2`` (<v>.checkpoint.<uuid>.{json,parquet} manifests with
    _sidecars/). A v2/classic checkpoint wins over a partial multipart
    set at the same version."""
    import re

    log = _log_path(table_path)
    if not os.path.isdir(log):
        return {}
    classic: dict[int, str] = {}
    v2: dict[int, str] = {}
    multi: dict[int, dict[int, tuple[int, str]]] = {}
    for f in os.listdir(log):
        m = re.fullmatch(r"(\d+)\.checkpoint\.parquet", f)
        if m:
            classic[int(m.group(1))] = f
            continue
        m = re.fullmatch(r"(\d+)\.checkpoint\.(\d+)\.(\d+)\.parquet", f)
        if m:
            v, o, p_ = int(m.group(1)), int(m.group(2)), int(m.group(3))
            multi.setdefault(v, {})[o] = (p_, f)
            continue
        m = re.fullmatch(r"(\d+)\.checkpoint\.[0-9a-fA-F-]{8,}\.(json|parquet)", f)
        if m:
            v2[int(m.group(1))] = f
    out: dict[int, tuple[str, list[str]]] = {}
    for v, parts in multi.items():
        total = next(iter(parts.values()))[0]
        if len(parts) == total and set(parts) == set(range(1, total + 1)):
            out[v] = ("multipart", [parts[i][1] for i in range(1, total + 1)])
    for v, f in classic.items():
        out[v] = ("classic", [f])
    for v, f in v2.items():
        out[v] = ("v2", [f])
    return out


def _checkpoint_versions(table_path: str) -> list[int]:
    return sorted(_checkpoint_files(table_path))


def _check_protocol(p: dict) -> None:
    """Reader v1 always; v2/v3 only when every reader feature is one we
    implement (deletionVectors). Anything else raises rather than
    silently misreading."""
    v = p.get("minReaderVersion", 1)
    if v <= _MAX_SUPPORTED["minReaderVersion"]:
        return
    if v == 2:
        return  # legacy columnMapping reader version (no feature lists)
    feats = set(p.get("readerFeatures") or [])
    if v <= 3 and feats <= {"deletionVectors", "columnMapping"}:
        return
    raise NotImplementedError(
        f"Delta minReaderVersion {v} with readerFeatures {sorted(feats)} is "
        "not supported by this pure-Python reader (deletionVectors + "
        "columnMapping only); use delta-spark"
    )


def _checkpoint_rows(table_path: str, version: int) -> list[dict]:
    """Action rows of the checkpoint at ``version``, whatever its
    layout: classic single-file, legacy MULTI-PART (all parts unioned —
    the spec lets actions land in any part), or V2 (manifest json/
    parquet holding checkpointMetadata + non-file actions plus
    sidecarFile pointers into _delta_log/_sidecars/, whose parquet
    carries the add/remove actions)."""
    import pyarrow.parquet as pq

    log = _log_path(table_path)
    kind, files = _checkpoint_files(table_path)[version]
    if kind in ("classic", "multipart"):
        rows: list[dict] = []
        for f in files:
            rows.extend(pq.read_table(os.path.join(log, f)).to_pylist())
        return rows
    # v2 manifest
    manifest = os.path.join(log, files[0])
    if manifest.endswith(".json"):
        rows = []
        with open(manifest) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    else:
        rows = pq.read_table(manifest).to_pylist()
    out: list[dict] = []
    for row in rows:
        sidecar = row.get("sidecarFile")
        if sidecar and sidecar.get("path"):
            sp = os.path.join(log, "_sidecars", os.path.basename(sidecar["path"]))
            out.extend(pq.read_table(sp).to_pylist())
        elif row.get("checkpointMetadata"):
            continue  # v2 marker action, no replay state
        else:
            out.append(row)
    return out


def _read_checkpoint(table_path: str, version: int):
    """Load replay state (schema_json, partition_cols, active adds,
    configuration, protocol) from the checkpoint at ``version`` (any
    spec layout — see _checkpoint_rows)."""
    rows = _checkpoint_rows(table_path, version)
    schema_json: str | None = None
    partition_cols: list[str] = []
    configuration: dict = {}
    protocol: dict = dict(_MAX_SUPPORTED)
    active: dict[str, dict] = {}
    for row in rows:
        p = row.get("protocol")
        if p:
            protocol = {k: v for k, v in p.items() if v is not None}
            _check_protocol(protocol)
        md = row.get("metaData")
        if md:
            schema_json = md["schemaString"]
            partition_cols = list(md.get("partitionColumns") or [])
            cfg = md.get("configuration") or {}
            configuration = dict(cfg) if not isinstance(cfg, dict) else cfg
        add = row.get("add")
        if add:
            pv = add.get("partitionValues") or {}
            if not isinstance(pv, dict):  # arrow MAP columns read back as tuples
                pv = dict(pv)
            entry = {
                "path": add["path"],
                "partitionValues": pv,
                "size": add.get("size") or 0,
                "modificationTime": add.get("modificationTime") or 0,
            }
            dv = add.get("deletionVector")
            # parquet null-struct rows read back as a dict of Nones
            if dv and dv.get("storageType"):
                entry["deletionVector"] = {k: v for k, v in dv.items() if v is not None}
            active[add["path"]] = entry
    return schema_json, partition_cols, active, configuration, protocol


def _replay_log_full(table_path: str, version: int | None = None):
    """Return (schema_json, partition_cols, active adds, configuration,
    protocol) after replaying the log up to and including ``version``
    (default: latest). Replay starts from the newest checkpoint at or
    below the target version when one exists (JSON commits older than
    the checkpoint may have been vacuumed)."""
    versions = _list_versions(table_path)
    ckpts = _checkpoint_versions(table_path)
    if not versions and not ckpts:
        raise FileNotFoundError(
            f"not a Delta table (no {_LOG_DIR}/*.json under {table_path})"
        )
    target = version if version is not None else max(versions + ckpts)
    if version is not None and version not in set(versions) | set(ckpts):
        raise ValueError(
            f"version {version} not found in Delta log (have {sorted(set(versions) | set(ckpts))})"
        )
    schema_json: str | None = None
    partition_cols: list[str] = []
    configuration: dict = {}
    protocol: dict = dict(_MAX_SUPPORTED)
    active: dict[str, dict] = {}
    start_after = -1
    usable = [c for c in ckpts if c <= target]
    if usable:
        schema_json, partition_cols, active, configuration, protocol = _read_checkpoint(
            table_path, usable[-1]
        )
        start_after = usable[-1]
    for v in versions:
        if v <= start_after or v > target:
            continue
        with open(_commit_file(table_path, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                    _check_protocol(protocol)
                elif "metaData" in action:
                    schema_json = action["metaData"]["schemaString"]
                    partition_cols = list(action["metaData"].get("partitionColumns") or [])
                    configuration = action["metaData"].get("configuration") or {}
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    if schema_json is None:
        raise ValueError(f"Delta log under {table_path} has no metaData action")
    return (
        schema_json,
        partition_cols,
        {k: active[k] for k in sorted(active)},
        configuration,
        protocol,
    )


def _replay_log(table_path: str, version: int | None = None):
    """(schema_json, partition_cols, active adds) — the 3-tuple most
    callers want; _replay_log_full adds configuration + protocol."""
    schema_json, partition_cols, adds, _cfg, _proto = _replay_log_full(
        table_path, version
    )
    return schema_json, partition_cols, adds


def _mapping_info(schema_json: str, config: dict):
    """(mode, logical->physical, physical->logical) for a column-mapped
    table (PROTOCOL.md §Column Mapping); mode None when disabled.
    Physical names come from each field's delta.columnMapping.
    physicalName metadata. Resolution is by physical NAME for both
    modes — delta-spark writes physicalName annotations in id mode too,
    and this writer always does. Nested mapped columns are gated."""
    mode = (config or {}).get("delta.columnMapping.mode")
    if mode in (None, "", "none"):
        return None, {}, {}
    if mode not in ("name", "id"):
        raise NotImplementedError(f"delta.columnMapping.mode {mode!r} is not supported")
    l2p: dict[str, str] = {}
    p2l: dict[str, str] = {}
    for f in json.loads(schema_json)["fields"]:
        if not isinstance(f.get("type"), str):
            raise NotImplementedError(
                "column mapping over nested columns is not supported by this "
                "pure-Python reader"
            )
        phys = (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        l2p[f["name"]] = phys
        p2l[phys] = f["name"]
    return mode, l2p, p2l


def _pv_sorted(groups: dict) -> list:
    """Partition-value groups in deterministic order. Keys are tuples
    of str-or-None (Delta serializes partition values as strings; null
    -> absent/None) — plain sorted() raises TypeError on a None vs str
    comparison, so nulls order first explicitly."""
    return sorted(
        groups.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    )


def version_at_timestamp_delta_py(path: str, timestamp_ms: int) -> int:
    """TIMESTAMP AS OF resolution (delta-spark's timestampAsOf): the
    latest version whose commit timestamp (commitInfo.timestamp,
    falling back to the commit file's mtime) is <= ``timestamp_ms``.
    Raises when the table's first commit is later than the timestamp,
    matching delta-spark's before-earliest-version error."""
    best = None
    json_versions = set(_list_versions(path))
    # Checkpoint-only versions survive log cleanup (_replay_log_full
    # reads them without their JSON commits) — timestamp travel must
    # resolve from them too, not error with "history starts later"
    # when the instant predates the oldest surviving JSON (r8 advice).
    ckpt_files = _checkpoint_files(path)
    for v in sorted(json_versions | set(ckpt_files)):
        ts = None
        if v in json_versions:
            try:
                with open(_commit_file(path, v)) as fh:
                    for line in fh:
                        line = line.strip()
                        if not line:
                            continue
                        action = json.loads(line)
                        if "commitInfo" in action:
                            ts = action["commitInfo"].get("timestamp")
                            break
                if ts is None:
                    ts = int(os.path.getmtime(_commit_file(path, v)) * 1000)
            except FileNotFoundError:
                pass  # cleaned between listing and read — fall through
        if ts is None and v in ckpt_files:
            # The JSON commit (and its commitInfo timestamp) is gone;
            # the closest surviving record of WHEN this state existed
            # is its data files' modificationTime in the checkpoint
            # rows (<= the commit's wall time — the checkpoint file's
            # own mtime is when the checkpoint was written, which can
            # be arbitrarily later).
            mods = [
                int(r["add"]["modificationTime"])
                for r in _checkpoint_rows(path, v)
                if r.get("add")
                and r["add"].get("modificationTime") is not None
            ]
            if mods:
                ts = max(mods)
            else:
                # No usable add timestamps (fully-deleted table state,
                # or adds without modificationTime — the field is
                # technically required but absent rows must not coerce
                # to 0 and falsely match every instant). The checkpoint
                # file's own mtime is an UPPER bound on the commit's
                # wall time: if even that is within the target instant,
                # the version certainly existed by then.
                _kind, files = ckpt_files[v]
                try:
                    ts = min(
                        int(os.path.getmtime(fp) * 1000) for fp in files
                    )
                except (FileNotFoundError, ValueError):
                    pass  # cleaned concurrently — skip this version
        if ts is not None and int(ts) <= int(timestamp_ms):
            best = v
    if best is None:
        raise ValueError(
            f"no Delta commit at or before timestamp {timestamp_ms} "
            f"(table history starts later)"
        )
    return best


def read_deltalake_py(
    path: str,
    spark: SparkSession,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Read a Delta table by replaying its checkpoint + JSON log.

    The result is a plain multi-file parquet scan — filter/column
    pushdown, split planning, and AQE all apply exactly as for
    read_parquet. ``version`` time-travels (reference read_deltalake's
    ``version`` kwarg); ``timestamp_ms`` is TIMESTAMP AS OF — the
    state at the latest commit not after that wall-clock instant
    (delta-spark's timestampAsOf). For partitioned tables the partition columns
    (absent from the data files, per the Delta spec) are restored from
    each add action's partitionValues: one scan per live partition
    combination, unioned."""
    from pyspark.sql import functions as F

    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version or timestamp_ms, not both")
        version = version_at_timestamp_delta_py(path, timestamp_ms)
    schema_json, partition_cols, adds, config, _proto = _replay_log_full(path, version)
    schema = StructType.fromJson(json.loads(schema_json))
    mode, l2p, p2l = _mapping_info(schema_json, config)
    # a clean logical schema (mapping annotations stripped) for results
    schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in schema.fields]
    )
    # metaData tracks partition columns by PHYSICAL name on mapped
    # tables (spec: partition values use physical names); normalize to
    # (logical, physical) pairs, tolerating logical-keyed metadata too
    part_pairs = [
        (p2l.get(c, c), l2p.get(p2l.get(c, c), c)) for c in partition_cols
    ]
    partition_cols = [lg for lg, _ph in part_pairs]
    phys_name = {lg: ph for lg, ph in part_pairs}
    if not adds:
        return spark.createDataFrame([], schema)
    dv_frame = _dv_positions_frame(spark, path, adds)

    def _physize(st: StructType) -> StructType:
        if mode is None:
            return st
        return StructType(
            [StructField(l2p.get(f.name, f.name), f.dataType, True) for f in st.fields]
        )

    def _logicalize(df, st: StructType):
        if mode is None:
            return df
        return df.select(
            *[F.col(l2p.get(f.name, f.name)).alias(f.name) for f in st.fields]
        )

    def _strip_dv(df):
        """Anti-join the deletion-vector positions by (normalized file
        path, parquet row ordinal) — the MoR application of Delta DVs,
        mirroring the Iceberg position-delete path."""
        if dv_frame is None:
            return df
        tagged = df.select(
            "*",
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/").alias(
                "__fp"
            ),
            F.col("_metadata.row_index").alias("__pos"),
        )
        return tagged.join(
            F.broadcast(dv_frame), ["__fp", "__pos"], "left_anti"
        ).drop("__fp", "__pos")

    if not partition_cols:
        scan = spark.read.schema(_physize(schema)).parquet(
            *[os.path.join(path, f) for f in adds]
        )
        return _logicalize(_strip_dv(scan), schema)

    part_types = {f.name: f.dataType for f in schema.fields if f.name in partition_cols}
    phys = StructType([f for f in schema.fields if f.name not in partition_cols])
    groups: dict[tuple, list[str]] = {}
    for rel, add in adds.items():
        pv = add.get("partitionValues") or {}
        # mapped tables key partitionValues by physical name
        key = tuple(pv.get(phys_name[c], pv.get(c)) for c in partition_cols)
        groups.setdefault(key, []).append(os.path.join(path, rel))
    parts = []
    for key, files in _pv_sorted(groups):
        df = _logicalize(_strip_dv(spark.read.schema(_physize(phys)).parquet(*files)), phys)
        for c, raw in zip(partition_cols, key):
            # Delta serializes partition values as strings (null -> absent)
            df = df.withColumn(c, F.lit(raw).cast(part_types[c]))
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _dv_read(table_path: str, desc: dict) -> list[int]:
    """Positions stored in one deletion-vector descriptor (storageType
    'p' = absolute path). File framing per the Delta spec: version byte
    1 at offset 0; at ``offset``: 4B big-endian data size, the
    RoaringBitmapArray bytes, 4B big-endian CRC32 of those bytes."""
    import struct
    import zlib

    from daft_spark.io.roaring import deserialize_rbm64

    st = desc.get("storageType")
    if st != "p":
        raise NotImplementedError(
            f"deletion vector storageType {st!r} not supported (only 'p')"
        )
    dv_path = desc["pathOrInlineDv"]
    with open(dv_path, "rb") as f:
        data = f.read()
    off = desc["offset"]
    (size,) = struct.unpack_from(">I", data, off)
    body = data[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", data, off + 4 + size)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError(f"deletion vector checksum mismatch in {dv_path}")
    return deserialize_rbm64(body)


def _dv_positions_frame(spark: SparkSession, table_path: str, adds: dict):
    """(__fp, __pos) frame of every deleted row position across the
    active adds, or None. Driver-side assembly is metadata-scale work
    (per-file cardinality is bounded by the file's row count, same
    order as the log replay itself); the frame broadcasts into the
    anti-join."""
    rows = []
    for rel, add in adds.items():
        desc = add.get("deletionVector")
        if not desc:
            continue
        abs_path = os.path.abspath(os.path.join(table_path, rel))
        rows.extend((abs_path, int(p)) for p in _dv_read(table_path, desc))
    if not rows:
        return None
    from pyspark.sql.types import LongType, StringType, StructField

    sch = StructType(
        [StructField("__fp", StringType()), StructField("__pos", LongType())]
    )
    return spark.createDataFrame(rows, sch)


def _dv_write(table_path: str, positions) -> dict:
    """Write one deletion-vector file (version byte + size/data/CRC32
    framing) and return its add-action descriptor."""
    import struct
    import zlib

    from daft_spark.io.roaring import serialize_rbm64

    vals = sorted(set(int(p) for p in positions))
    body = serialize_rbm64(vals)
    name = f"deletion_vector_{uuid.uuid4().hex}.bin"
    dst = os.path.join(table_path, name)
    with open(dst, "wb") as f:
        f.write(b"\x01")  # format version
        offset = f.tell()
        f.write(struct.pack(">I", len(body)))
        f.write(body)
        f.write(struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
    return {
        "storageType": "p",
        "pathOrInlineDv": dst,
        "offset": offset,
        "sizeInBytes": len(body),
        "cardinality": len(vals),
    }


def delete_deltalake_dv_py(path: str, spark: SparkSession, condition: str) -> None:
    """Merge-on-read DELETE via DELETION VECTORS: rows matching the SQL
    ``condition`` are tombstoned by parquet row ordinal into roaring
    bitmaps — no data file is rewritten (the commit retires each
    affected add and re-adds the same file with a deletionVector
    descriptor, upgrading the protocol to readerFeatures=
    [deletionVectors]). Existing DVs merge with the new positions.
    NULL-condition rows survive (three-valued DELETE). Prior versions
    stay time-travelable."""
    from pyspark.sql import functions as F

    _gate_column_mapping(path)
    schema_json, partition_cols, adds, cfg, _proto = _replay_log_full(path)
    if not adds:
        return
    # Match against the CURRENT state (existing DVs applied) so already-
    # deleted rows don't churn; capture (file, ordinal) via _metadata.
    t = _scan_adds_tagged(spark, path, adds, schema_json, partition_cols)
    matched = t.filter(F.expr(condition).eqNullSafe(F.lit(True)))
    by_file = _dv_write_distributed(matched, path, adds)
    if not by_file:
        return
    extra: list[dict] = []
    if _cdf_enabled(cfg):
        # CDF tables get explicit cdc actions in the SAME commit (the
        # delta-spark contract) — a DV commit's add/remove pair re-adds
        # the whole file, so change feeds can never be reconstructed
        # from it (r8 advice, medium).
        deleted = matched.drop("__fp", "__pos").withColumn(
            "_change_type", F.lit("delete")
        )
        extra = _write_cdc_file(path, deleted, partition_cols)
    _dv_commit(path, adds, by_file, extra, "DELETE", condition)


def _dv_write_distributed(matched, path: str, adds: dict) -> dict[str, dict]:
    """Aggregate matched ordinals per file and write each affected
    file's deletion-vector file FROM THE EXECUTOR TASK holding that
    file's aggregate (merging any pre-existing DV); the driver collects
    only (file, descriptor) rows. A DELETE touching every file of a
    huge table thus routes one metadata-sized row per file through the
    driver, never the position lists themselves. Requires the table
    path to be shared storage, which Delta assumes anyway."""
    import pandas as pd
    from pyspark.sql import functions as F

    old_descs = {
        os.path.abspath(os.path.join(path, rel)): add["deletionVector"]
        for rel, add in adds.items()
        if add.get("deletionVector")
    }

    def _write(batches):
        for pdf in batches:
            fps, descs = [], []
            for fp, positions in zip(pdf["__fp"], pdf["__positions"]):
                pos = [int(p) for p in positions]
                old = old_descs.get(fp)
                if old:
                    pos += _dv_read(path, old)
                fps.append(fp)
                descs.append(json.dumps(_dv_write(path, pos)))
            yield pd.DataFrame({"__fp": fps, "__desc": descs})

    rows = (
        matched.groupBy("__fp")
        .agg(F.sort_array(F.collect_list("__pos")).alias("__positions"))
        .mapInPandas(_write, "__fp string, __desc string")
        .collect()
    )
    return {r["__fp"]: json.loads(r["__desc"]) for r in rows}


def _dv_commit(
    path: str,
    adds: dict,
    by_file: dict[str, dict],
    extra_actions: list[dict],
    op: str,
    condition: str,
) -> None:
    """One DV commit: protocol upgrade, remove + re-add-with-DV for
    each affected file (descriptors pre-written executor-side by
    _dv_write_distributed, pre-existing DVs already merged), then any
    extra add actions (e.g. UPDATE's rewritten rows)."""
    now_ms = int(time.time() * 1000)
    abs_to_rel = {os.path.abspath(os.path.join(path, rel)): rel for rel in adds}
    actions: list[dict] = [{"protocol": _upgraded_dv_protocol(path)}]
    for abs_path, desc in sorted(by_file.items()):
        rel = abs_to_rel[abs_path]
        add = adds[rel]
        actions.append(
            {"remove": {"path": rel, "deletionTimestamp": now_ms, "dataChange": True}}
        )
        new_add = {
            "path": rel,
            "partitionValues": add.get("partitionValues") or {},
            "size": add.get("size") or 0,
            "modificationTime": now_ms,
            "dataChange": True,
            "deletionVector": desc,
        }
        actions.append({"add": new_add})
    actions.extend(extra_actions)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": op,
                "operationParameters": {"predicate": condition, "mode": "mor-dv"},
                "engineInfo": "daft_spark pure-python delta writer",
            }
        }
    )
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    tmp = os.path.join(_log_path(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    final = _commit_file(path, version)
    if os.path.exists(final):
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent Delta commit detected at version {version} ({path})"
        )
    os.rename(tmp, final)


def update_deltalake_dv_py(
    path: str, spark: SparkSession, condition: str, set_exprs: dict[str, str]
) -> None:
    """Merge-on-read UPDATE via DELETION VECTORS: rows matching
    ``condition`` are tombstoned by parquet ordinal (no data file
    rewritten) and their updated versions — ``set_exprs`` maps column
    name to a SQL expression over the old row — are appended as NEW
    data files in the SAME commit, exactly how DV-enabled engines run
    UPDATE. NULL-condition rows are untouched (three-valued UPDATE);
    prior versions stay time-travelable. Reference surface: the
    reference reads such tables through deltalake
    (daft/io/delta_lake/_deltalake.py:22); the commit layout follows
    the public Delta PROTOCOL.md deletion-vector rules."""
    from pyspark.sql import functions as F

    _gate_column_mapping(path)
    schema_json, partition_cols, adds, cfg, _proto = _replay_log_full(path)
    schema = StructType.fromJson(json.loads(schema_json))
    if not adds:
        return
    bad = set(set_exprs) - {f.name for f in schema.fields}
    if bad:
        raise ValueError(f"SET columns not in table schema: {sorted(bad)}")
    t = _scan_adds_tagged(spark, path, adds, schema_json, partition_cols)
    matched = t.filter(F.expr(condition).eqNullSafe(F.lit(True)))
    by_file = _dv_write_distributed(matched, path, adds)
    if not by_file:
        return
    types_by_name = {f.name: f.dataType for f in schema.fields}
    updated = matched
    for col, expr in set_exprs.items():
        updated = updated.withColumn(col, F.expr(expr).cast(types_by_name[col]))
    updated = updated.select(*[f.name for f in schema.fields])
    # Stage the rewritten rows exactly like write_deltalake_py does
    # (hive layout when partitioned), producing the commit's add actions.
    now_ms = int(time.time() * 1000)
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    new_adds = _stage_data_files(updated, path, version, partition_cols, now_ms)
    if _cdf_enabled(cfg):
        # pre/post images as explicit cdc actions (delta-spark's UPDATE
        # on CDF tables) — see delete_deltalake_dv_py for why DV commits
        # can't serve change feeds from add/remove reconstruction.
        pre = matched.drop("__fp", "__pos").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = updated.withColumn("_change_type", F.lit("update_postimage"))
        new_adds = new_adds + _write_cdc_file(
            path, pre.unionByName(post), partition_cols
        )
    _dv_commit(path, adds, by_file, new_adds, "UPDATE", condition)


def _all_txn_versions(table_path: str, version: int) -> dict[str, int]:
    """Latest txn version per appId at ``version`` (checkpoint rows +
    later JSON commits)."""
    out: dict[str, int] = {}
    ckpts = [c for c in _checkpoint_versions(table_path) if c <= version]
    start_after = -1
    if ckpts:
        import pyarrow.parquet as pq

        p = os.path.join(
            _log_path(table_path), f"{ckpts[-1]:020d}.checkpoint.parquet"
        )
        t = pq.read_table(p)
        if "txn" in t.column_names:
            for row in t.column("txn").to_pylist():
                if row and row.get("appId") is not None:
                    a = row["appId"]
                    out[a] = max(out.get(a, -1), int(row.get("version", -1)))
        start_after = ckpts[-1]
    for v in _list_versions(table_path):
        if v <= start_after or v > version:
            continue
        with open(_commit_file(table_path, v)) as f:
            for line in f:
                line = line.strip()
                if line:
                    a = json.loads(line)
                    if "txn" in a and a["txn"].get("appId") is not None:
                        aid = a["txn"]["appId"]
                        out[aid] = max(out.get(aid, -1), int(a["txn"].get("version", -1)))
    return out


def last_txn_version(path: str, app_id: str) -> int:
    """Highest ``txn`` action version committed for ``app_id`` (-1 when
    none) — the Delta protocol's application-transaction mechanism for
    idempotent writers (PROTOCOL.md "Transaction Identifiers"). Scans
    the newest checkpoint's txn rows plus every later JSON commit."""
    best = -1
    ckpts = _checkpoint_versions(path)
    start_after = -1
    if ckpts:
        import pyarrow.parquet as pq

        p = os.path.join(_log_path(path), f"{ckpts[-1]:020d}.checkpoint.parquet")
        t = pq.read_table(p)
        if "txn" in t.column_names:
            for row in t.column("txn").to_pylist():
                if row and row.get("appId") == app_id:
                    best = max(best, int(row.get("version", -1)))
        start_after = ckpts[-1]
    for v in _list_versions(path):
        if v <= start_after:
            continue
        with open(_commit_file(path, v)) as f:
            for line in f:
                line = line.strip()
                if line:
                    a = json.loads(line)
                    if "txn" in a and a["txn"].get("appId") == app_id:
                        best = max(best, int(a["txn"].get("version", -1)))
    return best


def _stage_data_files(
    df: DataFrame,
    path: str,
    version: int,
    partition_by: list[str],
    now_ms: int,
) -> list[dict]:
    """Stage ``df`` with Spark's parquet writer, then move the files
    into the table root under unique names (Delta data files are
    immutable and never share names across commits) and return their
    add actions. Hive layout when ``partition_by`` is set, with the
    partition columns dropped from the files and carried in each add's
    partitionValues, per the spec."""
    from urllib.parse import unquote

    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    adds: list[dict] = []
    for root, _dirs, files in os.walk(staging):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, staging)
            pvals: dict[str, str] = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, v = seg.partition("=")
                    # hive layout URL-encodes; null partitions appear as
                    # __HIVE_DEFAULT_PARTITION__
                    pvals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            name = f"part-{version:05d}-{uuid.uuid4().hex}.parquet"
            rel = os.path.join(rel_dir, name) if rel_dir != "." else name
            dst = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(os.path.join(root, f), dst)
            add = {
                "path": rel,
                "partitionValues": pvals,
                "size": os.path.getsize(dst),
                "modificationTime": now_ms,
                "dataChange": True,
            }
            # per-file stats (data skipping; delta-spark writes these
            # by default) — conservative footer lift, never blocks the
            # write
            st = _file_stats_json(dst)
            if st:
                add["stats"] = st
            adds.append({"add": add})
    shutil.rmtree(staging, ignore_errors=True)
    return adds


def _scan_adds_tagged(
    spark: SparkSession,
    path: str,
    adds: dict,
    schema_json: str,
    partition_cols: list[str],
):
    """DV-applied scan of the given add actions with partition columns
    restored and (__fp, __pos) row identity attached, or None when
    ``adds`` is empty. This is the shared substrate of the file-granular
    DML passes: pass 1 scans all adds to find the files containing
    changed rows; pass 2 re-scans ONLY the affected adds for the
    rewrite — delta-spark's two-pass copy-on-write shape."""
    from pyspark.sql import functions as F

    if not adds:
        return None
    schema = StructType.fromJson(json.loads(schema_json))
    dv_frame = _dv_positions_frame(spark, path, adds)
    part_types = {
        f.name: f.dataType for f in schema.fields if f.name in partition_cols
    }
    phys = StructType([f for f in schema.fields if f.name not in partition_cols])
    groups: dict[tuple, list[str]] = {}
    for rel, add in adds.items():
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in partition_cols)
        groups.setdefault(key, []).append(os.path.join(path, rel))
    out = None
    for key, files in _pv_sorted(groups):
        df = spark.read.schema(phys).parquet(*files).select(
            "*",
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/").alias(
                "__fp"
            ),
            F.col("_metadata.row_index").alias("__pos"),
        )
        if dv_frame is not None:
            df = df.join(F.broadcast(dv_frame), ["__fp", "__pos"], "left_anti")
        for c, raw in zip(partition_cols, key):
            df = df.withColumn(c, F.lit(raw).cast(part_types[c]))
        df = df.select(*[f.name for f in schema.fields], "__fp", "__pos")
        out = df if out is None else out.unionByName(df)
    return out


def _affected_scan(
    spark: SparkSession,
    path: str,
    adds: dict,
    schema_json: str,
    partition_cols: list[str],
    affected_abs: list[str],
):
    """Pass 2 of file-granular DML: re-scan ONLY the adds whose
    absolute paths appear in ``affected_abs`` (the __fp values pass 1
    collected). Keeps the abspath keying in ONE place, matching
    _cow_commit's abs_to_rel."""
    aff_set = set(affected_abs)
    aff_adds = {
        rel: a
        for rel, a in adds.items()
        if os.path.abspath(os.path.join(path, rel)) in aff_set
    }
    return _scan_adds_tagged(spark, path, aff_adds, schema_json, partition_cols)


def _cow_commit(
    path: str,
    adds: dict,
    affected_abs: list[str],
    rewritten: DataFrame | None,
    partition_cols: list[str],
    op: str,
    params: dict,
    extra_actions: list[dict] | None,
    checkpoint_interval: int = 10,
) -> None:
    """File-granular copy-on-write commit: retire ONLY the affected
    files, stage their surviving/updated rows (plus any merge-inserted
    rows) as new files, and carry every other add action forward
    untouched via log replay — at scale a DML statement touching 0.1%
    of a table's files rewrites 0.1% of the table, not all of it.
    Zero-row staged files are dropped. A no-op statement still commits
    (commitInfo-only), matching delta-spark's version-per-statement
    behavior."""
    import pyarrow.parquet as pq

    now_ms = int(time.time() * 1000)
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    add_actions: list[dict] = []
    if rewritten is not None:
        for a in _stage_data_files(rewritten, path, version, partition_cols, now_ms):
            dst = os.path.join(path, a["add"]["path"])
            if pq.ParquetFile(dst).metadata.num_rows == 0:
                os.remove(dst)
                continue
            add_actions.append(a)
    abs_to_rel = {os.path.abspath(os.path.join(path, rel)): rel for rel in adds}
    actions: list[dict] = []
    for fp in sorted(affected_abs):
        actions.append(
            {
                "remove": {
                    "path": abs_to_rel[fp],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    actions.extend(add_actions)
    actions.extend(extra_actions or [])
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": op,
                "operationParameters": params,
                "engineInfo": "daft_spark pure-python delta writer",
            }
        }
    )
    _commit_actions(path, version, actions)
    if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
        _write_checkpoint(path, version)


def write_deltalake_py(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    checkpoint_interval: int = 10,
    txn: tuple[str, int] | None = None,
    _extra_actions: list[dict] | None = None,
) -> None:
    """Write ``df`` as a Delta commit: parquet data files + one atomic
    JSON log entry. Modes: append, overwrite, error, ignore.
    ``partition_by`` writes hive-layout partitioned data files with
    the partition columns recorded in partitionValues (and dropped from
    the files, per the spec). Every ``checkpoint_interval`` commits a
    classic single-file parquet checkpoint + _last_checkpoint is
    emitted so the JSON prefix of the log becomes vacuumable.
    ``txn=(app_id, version)`` stamps the commit with a transaction
    identifier (PROTOCOL.md) and SKIPS the write when that version is
    already committed — the idempotence contract streaming sinks replay
    on (see streaming.write_stream_delta)."""
    if mode not in ("append", "overwrite", "error", "ignore"):
        raise ValueError(f"unsupported mode {mode!r}")
    if txn is not None:
        app_id, txn_version = str(txn[0]), int(txn[1])
        try:
            if last_txn_version(path, app_id) >= txn_version:
                return  # already committed (replayed micro-batch)
        except FileNotFoundError:
            pass
    versions = _list_versions(path)
    ckpts = _checkpoint_versions(path)
    exists = bool(versions or ckpts)
    if exists and mode == "error":
        raise FileExistsError(f"Delta table already exists at {path}")
    if exists and mode == "ignore":
        return
    version = (max(versions + ckpts) + 1) if exists else 0
    partition_by = list(partition_by or [])
    prior_cfg: dict = {}
    if exists:
        from pyspark.sql import functions as F

        prior_schema_json, prior_parts, _adds, prior_cfg, _proto = _replay_log_full(path)
        map_mode, l2p, _p2l = _mapping_info(prior_schema_json, prior_cfg)
        if map_mode is not None:
            # column-mapped tables: stage files under PHYSICAL names and
            # key partitionValues by them (PROTOCOL.md column-mapping
            # writer requirements); the logical schema stays in metaData
            if mode == "overwrite":
                raise NotImplementedError(
                    "overwrite of a column-mapped Delta table is not supported"
                )
            logical = [f["name"] for f in json.loads(prior_schema_json)["fields"]]
            if sorted(df.columns) != sorted(logical):
                raise ValueError(
                    f"append columns {sorted(df.columns)} do not match the "
                    f"mapped table schema {sorted(logical)} — evolve it first "
                    "(evolve_delta_schema)"
                )
            df = df.select(*[F.col(c).alias(l2p[c]) for c in logical])
            partition_by = [l2p.get(c, c) for c in partition_by]
        if mode == "append" and prior_parts != partition_by:
            raise ValueError(
                f"partition columns {partition_by} do not match the table's "
                f"existing partitioning {prior_parts}"
            )
        if mode == "append" and map_mode is None:
            # Delta schema enforcement: extra columns are rejected
            # (delta-spark raises unless mergeSchema; silently dropping
            # them on the pinned-schema read would lose data). Missing
            # columns are fine — the reader fills nulls, the spec's
            # nullable-column semantics.
            table_cols = {f["name"] for f in json.loads(prior_schema_json)["fields"]}
            extra = [c for c in df.columns if c not in table_cols]
            if extra:
                raise ValueError(
                    f"append columns {extra} are not in the table schema "
                    f"{sorted(table_cols)}; overwrite to change the schema"
                )

    os.makedirs(_log_path(path), exist_ok=True)
    now_ms = int(time.time() * 1000)
    adds = _stage_data_files(df, path, version, partition_by, now_ms)

    actions: list[dict] = []
    if not exists:
        actions.append({"protocol": dict(_MAX_SUPPORTED)})
    if not exists or mode == "overwrite":
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": partition_by,
                    # table properties (CDF flag etc.) survive overwrites
                    "configuration": prior_cfg,
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and exists:
        _, _, prior = _replay_log(path)
        for rel in prior:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    actions.extend(adds)
    if _extra_actions:
        actions.extend(_extra_actions)  # e.g. cdc actions (same commit)
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": str(txn[0]),
                    "version": int(txn[1]),
                    "lastUpdated": now_ms,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode},
                "engineInfo": "daft_spark pure-python delta writer",
            }
        }
    )

    # Atomic publish: write to a temp name in the log dir, rename into
    # place. rename() fails-or-succeeds atomically on POSIX, so a
    # concurrent reader never sees a half-written commit.
    tmp = os.path.join(_log_path(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    final = _commit_file(path, version)
    if os.path.exists(final):
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent Delta commit detected at version {version} ({path})"
        )
    os.rename(tmp, final)
    if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
        _write_checkpoint(path, version)


def _write_checkpoint(table_path: str, version: int) -> None:
    """Materialize the replayed state at ``version`` as a classic
    single-file parquet checkpoint + _last_checkpoint pointer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema_json, partition_cols, adds, configuration, protocol = _replay_log_full(
        table_path, version
    )
    ck_protocol = {
        "minReaderVersion": protocol.get("minReaderVersion", 1),
        "minWriterVersion": protocol.get("minWriterVersion", 2),
        "readerFeatures": protocol.get("readerFeatures"),
        "writerFeatures": protocol.get("writerFeatures"),
    }
    rows: list[dict] = [
        {"protocol": ck_protocol, "metaData": None, "add": None},
        {
            "protocol": None,
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": partition_cols,
                "configuration": dict(configuration or {}),
                "createdTime": int(time.time() * 1000),
            },
            "add": None,
        },
    ]
    for rel, add in adds.items():
        # deletionVector rides along per the spec's checkpoint add
        # schema — without it a checkpointed replay would resurrect
        # DV-deleted rows (this writer used to SKIP checkpoints while
        # DVs were active, which let the JSON log grow unboundedly on
        # tables with long-lived DVs)
        dv = add.get("deletionVector")
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": rel,
                    "partitionValues": add.get("partitionValues") or {},
                    "size": int(add.get("size", 0)),
                    "modificationTime": int(add.get("modificationTime", 0)),
                    "dataChange": True,
                    "deletionVector": (
                        {
                            "storageType": dv["storageType"],
                            "pathOrInlineDv": dv["pathOrInlineDv"],
                            "offset": dv.get("offset"),
                            "sizeInBytes": int(dv.get("sizeInBytes", 0)),
                            "cardinality": int(dv.get("cardinality", 0)),
                        }
                        if dv
                        else None
                    ),
                },
            }
        )
    # spec: a checkpoint must carry the newest txn action per appId,
    # or idempotent writers lose their watermark once the JSON prefix
    # is vacuumed
    for app_id, txn_version in sorted(_all_txn_versions(table_path, version).items()):
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": None,
                "txn": {"appId": app_id, "version": txn_version},
            }
        )
    # dict-valued fields are MAP<string,string> in real Delta checkpoints
    # (an empty plain struct is also unwritable to parquet)
    map_ss = pa.map_(pa.string(), pa.string())
    ck_schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string()), ("options", map_ss)])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", map_ss),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", map_ss),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            (
                "txn",
                pa.struct([("appId", pa.string()), ("version", pa.int64())]),
            ),
        ]
    )
    out = os.path.join(_log_path(table_path), f"{version:020d}.checkpoint.parquet")
    tmp = out + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(pa.Table.from_pylist(rows, schema=ck_schema), tmp)
    os.rename(tmp, out)
    last = os.path.join(_log_path(table_path), "_last_checkpoint")
    tmp = last + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)
    os.rename(tmp, last)


def _commit_actions(table_path: str, version: int, actions: list[dict]) -> None:
    """Atomically publish one commit (write-temp-then-rename)."""
    tmp = os.path.join(_log_path(table_path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    final = _commit_file(table_path, version)
    if os.path.exists(final):
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent Delta commit detected at version {version} ({table_path})"
        )
    os.rename(tmp, final)


def _gate_column_mapping(table_path: str) -> None:
    schema_json, _pc, _adds, cfg, _proto = _replay_log_full(table_path)
    if _mapping_info(schema_json, cfg)[0] is not None:
        raise NotImplementedError(
            "DML on a column-mapped Delta table is not supported by this "
            "pure-Python writer (read/append/schema evolution only)"
        )


def set_column_mapping_delta_py(path: str, mode: str = "name") -> None:
    """Enable COLUMN MAPPING on an existing table (Delta PROTOCOL.md
    §Column Mapping) in one commit: the protocol upgrades to the legacy
    columnMapping versions (minReader 2 / minWriter 5 — or keeps the
    feature lists and adds ``columnMapping`` when the table already
    uses table features), and metaData is rewritten with every
    top-level field annotated with ``delta.columnMapping.id`` +
    ``physicalName``. Existing columns keep their current name as the
    physical name — the delta-spark upgrade convention, so existing
    data files stay readable without rewrite; columns added later mint
    ``col-<uuid>`` physical names. ``partitionColumns`` values are the
    physical names (the log tracks partition values by physical name).
    Reference reads mapped tables through delta-rs
    (daft/io/delta_lake/_deltalake.py)."""
    if mode not in ("name", "id"):
        raise ValueError(f"unsupported column mapping mode {mode!r}")
    schema_json, partition_cols, _adds, cfg, proto = _replay_log_full(path)
    if _mapping_info(schema_json, cfg)[0] is not None:
        return  # already enabled
    fields = json.loads(schema_json)["fields"]
    out_fields = []
    for i, f in enumerate(fields):
        if not isinstance(f.get("type"), str):
            raise NotImplementedError(
                "column mapping over nested columns is not supported"
            )
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.id"] = i + 1
        md["delta.columnMapping.physicalName"] = f["name"]
        out_fields.append(dict(f, metadata=md))
    new_cfg = dict(cfg)
    new_cfg["delta.columnMapping.mode"] = mode
    new_cfg["delta.columnMapping.maxColumnId"] = str(len(fields))
    new_proto = {
        "minReaderVersion": max(2, proto.get("minReaderVersion", 1)),
        "minWriterVersion": max(5, proto.get("minWriterVersion", 2)),
    }
    if proto.get("readerFeatures") is not None or proto.get("writerFeatures") is not None:
        # feature-list protocol (3,7): add columnMapping to both lists
        new_proto["minReaderVersion"] = max(3, new_proto["minReaderVersion"])
        new_proto["minWriterVersion"] = max(7, new_proto["minWriterVersion"])
        new_proto["readerFeatures"] = sorted(
            set(proto.get("readerFeatures") or []) | {"columnMapping"}
        )
        new_proto["writerFeatures"] = sorted(
            set(proto.get("writerFeatures") or []) | {"columnMapping"}
        )
    now_ms = int(time.time() * 1000)
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    _commit_actions(
        path,
        version,
        [
            {"protocol": new_proto},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps({"type": "struct", "fields": out_fields}),
                    "partitionColumns": partition_cols,
                    "configuration": new_cfg,
                    "createdTime": now_ms,
                }
            },
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "UPGRADE COLUMN MAPPING",
                    "engineInfo": "daft_spark pure-python delta writer",
                }
            },
        ],
    )


def evolve_delta_schema(
    path: str,
    *,
    renames: dict[str, str] | None = None,
    add_columns: list[tuple[str, str]] | None = None,
    drop_columns: list[str] | None = None,
) -> None:
    """Metadata-only Delta schema evolution — the rename/add/drop
    operations PROTOCOL.md permits once column mapping is enabled
    (set_column_mapping_delta_py). Renames and drops change LOGICAL
    names only: physical names and mapping ids in the data files never
    change, so old files keep resolving (the Delta analogue of
    evolve_iceberg_schema's field-id contract). ``add_columns`` take
    Delta JSON type strings ("long", "string", "double", ...) and mint
    ids above maxColumnId with fresh col-<uuid> physical names — old
    files read them as null."""
    renames = dict(renames or {})
    add_columns = list(add_columns or [])
    drop_columns = list(drop_columns or [])
    schema_json, partition_cols, _adds, cfg, _proto = _replay_log_full(path)
    mode, _l2p, _p2l = _mapping_info(schema_json, cfg)
    if mode is None:
        raise NotImplementedError(
            "Delta schema evolution requires column mapping "
            "(set_column_mapping_delta_py)"
        )
    fields = [dict(f) for f in json.loads(schema_json)["fields"]]
    names = {f["name"] for f in fields}
    for old, new in renames.items():
        if old not in names:
            raise ValueError(f"rename source column {old!r} not in schema")
        if new in names and new != old:
            raise ValueError(f"rename target column {new!r} already exists")
    part_phys = set(partition_cols)
    for c in drop_columns:
        f = next((f for f in fields if f["name"] == c), None)
        if f is None:
            raise ValueError(f"drop column {c!r} not in schema")
        if (f.get("metadata") or {}).get("delta.columnMapping.physicalName", c) in part_phys:
            raise ValueError(f"cannot drop partition column {c!r}")
    out_fields = []
    for f in fields:
        if f["name"] in drop_columns:
            continue
        if f["name"] in renames:
            f = dict(f, name=renames[f["name"]])
        out_fields.append(f)
    max_id = int(cfg.get("delta.columnMapping.maxColumnId", len(fields)))
    existing = {f["name"] for f in out_fields}
    for name, type_str in add_columns:
        if name in existing:
            raise ValueError(f"add column {name!r} already exists")
        max_id += 1
        out_fields.append(
            {
                "name": name,
                "type": type_str,
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": max_id,
                    "delta.columnMapping.physicalName": f"col-{uuid.uuid4()}",
                },
            }
        )
        existing.add(name)
    new_cfg = dict(cfg)
    new_cfg["delta.columnMapping.maxColumnId"] = str(max_id)
    now_ms = int(time.time() * 1000)
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    _commit_actions(
        path,
        version,
        [
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps({"type": "struct", "fields": out_fields}),
                    "partitionColumns": partition_cols,
                    "configuration": new_cfg,
                    "createdTime": now_ms,
                }
            },
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "CHANGE COLUMN",
                    "engineInfo": "daft_spark pure-python delta writer",
                }
            },
        ],
    )


def optimize_deltalake_py(
    path: str, spark: SparkSession, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """OPTIMIZE (bin-packing compaction): per partition, data files
    smaller than ``target_file_bytes`` are greedily binned up to the
    target and each bin of 2+ files is rewritten as ONE file. The
    commit retires the bin's files and adds the replacement with
    ``dataChange=false`` on BOTH actions — the Delta contract that
    tells streaming sources the commit rearranges existing rows rather
    than changing data (io/delta_source.py skips such commits).
    Files carrying deletion vectors are materialized on the way
    (tombstoned rows dropped, the replacement file has no DV) — the
    compaction that retires DV debt. Returns {"removed": n, "added": m}.
    The reference has no OPTIMIZE (delta-rs exposes it out-of-band);
    this follows PROTOCOL.md's dataChange semantics.

    Scale note: each bin is rewritten by a Spark job over just that
    bin's files; the driver only carries file metadata."""
    from pyspark.sql import functions as F

    _schema_json, _partition_cols, adds, _cfg, _proto = _replay_log_full(path)
    # Pin each bin read to the table's PHYSICAL file schema: files
    # written before a schema evolution lack later columns, and an
    # unpinned multi-file read would adopt one file's schema and
    # silently drop the others' columns from the rewrite.
    _mode, _l2p, _p2l = _mapping_info(_schema_json, _cfg)
    _part_logical = {_p2l.get(c, c) for c in (_partition_cols or [])}
    _phys_fields = []
    for f_ in StructType.fromJson(json.loads(_schema_json)).fields:
        if f_.name in _part_logical:
            continue  # partition columns are not in the data files
        _phys_fields.append(
            StructField(_l2p.get(f_.name, f_.name), f_.dataType, True)
        )
    _file_schema = StructType(_phys_fields)
    by_part: dict[tuple, list[tuple[str, dict]]] = {}
    for rel, add in adds.items():
        if int(add.get("size") or 0) >= target_file_bytes:
            continue
        pv = add.get("partitionValues") or {}
        by_part.setdefault(tuple(sorted(pv.items())), []).append((rel, add))
    bins: list[list[tuple[str, dict]]] = []
    for _pv, files in sorted(by_part.items()):
        cur: list[tuple[str, dict]] = []
        cur_sz = 0
        for rel, add in sorted(files):
            sz = int(add.get("size") or 0)
            if cur and cur_sz + sz > target_file_bytes:
                bins.append(cur)
                cur, cur_sz = [], 0
            cur.append((rel, add))
            cur_sz += sz
        bins.append(cur)
    bins = [b for b in bins if len(b) >= 2]
    if not bins:
        return {"removed": 0, "added": 0}

    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    removed = added = 0
    for bin_files in bins:
        rels = [rel for rel, _a in bin_files]
        dv_adds = {rel: a for rel, a in bin_files if a.get("deletionVector")}
        scan = spark.read.schema(_file_schema).parquet(
            *[os.path.join(path, r) for r in rels]
        )
        if dv_adds:
            dv_frame = _dv_positions_frame(spark, path, dv_adds)
            tagged = scan.select(
                "*",
                F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/").alias(
                    "__fp"
                ),
                F.col("_metadata.row_index").alias("__pos"),
            )
            scan = tagged.join(
                F.broadcast(dv_frame), ["__fp", "__pos"], "left_anti"
            ).drop("__fp", "__pos")
        staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
        scan.coalesce(1).write.mode("overwrite").parquet(staging)
        part_dir = os.path.dirname(rels[0])
        name = f"part-opt-{uuid.uuid4().hex}.parquet"
        rel_out = os.path.join(part_dir, name) if part_dir else name
        dst = os.path.join(path, rel_out)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        src = next(
            os.path.join(staging, f)
            for f in sorted(os.listdir(staging))
            if f.endswith(".parquet")
        )
        shutil.move(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
        for rel, _a in bin_files:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": False,
                    }
                }
            )
            removed += 1
        actions.append(
            {
                "add": {
                    "path": rel_out,
                    "partitionValues": bin_files[0][1].get("partitionValues") or {},
                    "size": os.path.getsize(dst),
                    "modificationTime": now_ms,
                    "dataChange": False,
                }
            }
        )
        added += 1
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "OPTIMIZE",
                "operationParameters": {"targetSize": str(target_file_bytes)},
                "engineInfo": "daft_spark pure-python delta writer",
            }
        }
    )
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    _commit_actions(path, version, actions)
    return {"removed": removed, "added": added}


def vacuum_deltalake_py(
    path: str, retention_ms: int = 7 * 24 * 3600 * 1000, dry_run: bool = False
) -> list[str]:
    """VACUUM: physically delete data files no longer referenced by the
    CURRENT table version whose tombstone (remove.deletionTimestamp,
    falling back to file mtime for untracked orphans) is older than
    ``retention_ms`` — the Delta maintenance op that actually reclaims
    storage after OPTIMIZE/DELETE/overwrite. Time travel to versions
    needing the removed files breaks afterwards, exactly the documented
    VACUUM trade-off. DV files referenced by live adds survive. Returns
    the deleted (or would-delete, with ``dry_run``) relative paths."""
    _schema_json, _pc, adds, _cfg, _proto = _replay_log_full(path)
    live = set(adds)
    removed_at: dict[str, int] = {}
    for v in _list_versions(path):
        with open(_commit_file(path, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "remove" in action:
                    removed_at[action["remove"]["path"]] = int(
                        action["remove"].get("deletionTimestamp") or 0
                    )
    now_ms = int(time.time() * 1000)
    out: list[str] = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != _LOG_DIR and not d.startswith(".staging-")]
        for f in files:
            if not f.endswith(".parquet"):
                continue  # DV .bin files etc. are never vacuum targets
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path)
            if rel in live:
                continue
            cutoff = removed_at.get(rel, int(os.path.getmtime(full) * 1000))
            if now_ms - cutoff < retention_ms:
                continue
            out.append(rel)
            if not dry_run:
                os.remove(full)
    return sorted(out)


def delete_deltalake_py(path: str, spark: SparkSession, condition: str) -> None:
    """Copy-on-write DELETE, file-granular: pass 1 scans the table and
    collects the FILES containing rows where ``condition`` IS TRUE;
    pass 2 rewrites ONLY those files without the matched rows (merging
    away any deletion vectors on them). Untouched data files stay
    byte-identical and their add actions carry forward via log replay —
    at 100× a DELETE matching 0.1% of files rewrites 0.1% of the table.
    NULL-condition rows survive (SQL three-valued DELETE keeps rows
    where the predicate is not TRUE). Prior versions stay
    time-travelable."""
    from pyspark.sql import functions as F

    _gate_column_mapping(path)
    schema_json, partition_cols, adds, cfg, _proto = _replay_log_full(path)
    t = _scan_adds_tagged(spark, path, adds, schema_json, partition_cols)
    cond = F.expr(condition).eqNullSafe(F.lit(True))
    affected = (
        []
        if t is None
        else sorted(
            r["__fp"] for r in t.filter(cond).select("__fp").distinct().collect()
        )
    )
    if not affected:
        _cow_commit(
            path, adds, [], None, partition_cols, "DELETE",
            {"predicate": condition}, None,
        )
        return
    aff = _affected_scan(spark, path, adds, schema_json, partition_cols, affected)
    surviving = aff.filter(~cond).drop("__fp", "__pos")
    extra = None
    if _cdf_enabled(cfg):
        deleted = (
            aff.filter(cond)
            .drop("__fp", "__pos")
            .withColumn("_change_type", F.lit("delete"))
        )
        extra = _write_cdc_file(path, deleted, partition_cols)
    _cow_commit(
        path, adds, affected, surviving, partition_cols, "DELETE",
        {"predicate": condition}, extra,
    )


def update_deltalake_py(
    path: str, spark: SparkSession, set_exprs: dict, condition: str = "true"
) -> None:
    """Copy-on-write UPDATE, file-granular: pass 1 collects the FILES
    containing rows matching ``condition``; pass 2 rewrites ONLY those
    files with each ``set_exprs`` column replaced by its SQL expression
    (evaluated against the pre-update row) on the matching rows.
    Untouched data files stay byte-identical and their add actions
    carry forward. Prior versions stay time-travelable."""
    from pyspark.sql import functions as F

    _gate_column_mapping(path)
    schema_json, partition_cols, adds, cfg, _proto = _replay_log_full(path)
    tcols = [f["name"] for f in json.loads(schema_json)["fields"]]
    # metaData is NOT rewritten by a file-granular commit, so SET
    # expressions must land in the table's declared column types
    ttypes = {
        f.name: f.dataType for f in StructType.fromJson(json.loads(schema_json)).fields
    }
    for c in set_exprs:
        if c not in tcols:
            raise ValueError(f"update target column {c!r} not in table schema")
    t = _scan_adds_tagged(spark, path, adds, schema_json, partition_cols)
    cond = F.expr(condition).eqNullSafe(F.lit(True))
    affected = (
        []
        if t is None
        else sorted(
            r["__fp"] for r in t.filter(cond).select("__fp").distinct().collect()
        )
    )
    if not affected:
        _cow_commit(
            path, adds, [], None, partition_cols, "UPDATE",
            {"predicate": condition}, None,
        )
        return
    aff = _affected_scan(spark, path, adds, schema_json, partition_cols, affected)
    updated = aff.select(
        *[
            F.when(cond, F.expr(str(set_exprs[c])).cast(ttypes[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in tcols
        ]
    )
    extra = None
    if _cdf_enabled(cfg):
        pre = (
            aff.filter(cond)
            .select(*tcols)
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        post = aff.filter(cond).select(
            *[
                F.expr(str(set_exprs[c])).cast(ttypes[c]).alias(c)
                if c in set_exprs
                else F.col(c)
                for c in tcols
            ]
        ).withColumn("_change_type", F.lit("update_postimage"))
        extra = _write_cdc_file(path, pre.unionAll(post), partition_cols)
    _cow_commit(
        path, adds, affected, updated, partition_cols, "UPDATE",
        {"predicate": condition}, extra,
    )


# ---------------------------------------------------------------------------
# Change Data Feed (PROTOCOL.md §Add CDC File / Change Data Files)


def _cdf_enabled(cfg: dict) -> bool:
    return str((cfg or {}).get("delta.enableChangeDataFeed", "")).lower() == "true"


def restore_deltalake_py(path: str, version: int) -> None:
    """RESTORE TABLE ... TO VERSION AS OF ``version`` (delta-spark's
    RESTORE): ONE metadata commit whose remove/add actions flip the
    current file set back to the target version's — data files still
    on disk are re-referenced, never rewritten or copied, so a restore
    of a 100 TB table moves zero data. The target version's metaData
    (schema, partitioning, configuration) is restated when it differs.
    History is preserved: the restore is a NEW version on top, and the
    versions in between stay time-travelable. Restoring past a VACUUM
    that deleted the target's files fails on read — the documented
    trade-off delta-spark shares."""
    schema_json, partition_cols, target_adds, cfg, _proto = _replay_log_full(
        path, version
    )
    cur_schema, cur_parts, cur_adds, cur_cfg, _ = _replay_log_full(path)
    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    # configuration is metadata too: a restore past enable_cdf (or any
    # SET TBLPROPERTIES) must bring the target version's properties
    # back, exactly as delta-spark's RESTORE does
    if (
        schema_json != cur_schema
        or partition_cols != cur_parts
        or (cfg or {}) != (cur_cfg or {})
    ):
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": partition_cols,
                    "configuration": cfg,
                    "createdTime": now_ms,
                }
            }
        )

    def _identity(add: dict) -> tuple:
        # stable across replay representations: JSON adds keep
        # dataChange/stats keys, checkpoint-replayed adds are trimmed —
        # compare only what defines the file's live content
        dv = add.get("deletionVector") or {}
        return (
            add.get("size"),
            dv.get("pathOrInlineDv"),
            dv.get("offset"),
            dv.get("cardinality"),
        )

    for rel in cur_adds:
        if rel not in target_adds:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    for rel, add in target_adds.items():
        if rel not in cur_adds or _identity(cur_adds[rel]) != _identity(add):
            restored = dict(add)
            restored["modificationTime"] = now_ms
            restored["dataChange"] = True
            actions.append({"add": restored})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
                "engineInfo": "daft_spark pure-python delta writer",
            }
        }
    )
    new_version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    _commit_actions(path, new_version, actions)


def enable_cdf_delta_py(path: str) -> None:
    """Enable the CHANGE DATA FEED on an existing table: one
    metadata-only commit setting ``delta.enableChangeDataFeed=true``
    and raising minWriterVersion to 4 (the legacy changeDataFeed writer
    version; feature-list tables get the ``changeDataFeed`` writer
    feature instead). From then on DML commits carry explicit ``cdc``
    actions under ``_change_data/`` and ``table_changes_delta_py``
    serves per-version row-level changes."""
    schema_json, partition_cols, _adds, cfg, proto = _replay_log_full(path)
    if _cdf_enabled(cfg):
        return
    new_cfg = dict(cfg)
    new_cfg["delta.enableChangeDataFeed"] = "true"
    new_proto = dict(proto)
    if proto.get("writerFeatures") is not None:
        new_proto["writerFeatures"] = sorted(
            set(proto["writerFeatures"]) | {"changeDataFeed"}
        )
    else:
        new_proto["minWriterVersion"] = max(4, proto.get("minWriterVersion", 2))
    now_ms = int(time.time() * 1000)
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    _commit_actions(
        path,
        version,
        [
            {"protocol": new_proto},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": partition_cols,
                    "configuration": new_cfg,
                    "createdTime": now_ms,
                }
            },
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "SET TBLPROPERTIES",
                    "engineInfo": "daft_spark pure-python delta writer",
                }
            },
        ],
    )


def _write_cdc_file(path: str, cdc_df: DataFrame, partition_cols: list[str]) -> list[dict]:
    """Stage change-data parquet files (table columns + _change_type)
    under _change_data/ and return their ``cdc`` actions
    (dataChange=false — CDC rows restate a change, they are not new
    data). Partitioned tables follow the data-file rules: hive-layout
    dirs under _change_data/, partition columns dropped from the files
    and carried in each action's partitionValues."""
    from urllib.parse import unquote

    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    writer = cdc_df.coalesce(1).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    os.makedirs(os.path.join(path, "_change_data"), exist_ok=True)
    actions: list[dict] = []
    for root, _dirs, files in os.walk(staging):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, staging)
            pvals: dict[str, str | None] = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, v = seg.partition("=")
                    pvals[k] = (
                        None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                    )
            name = f"cdc-{uuid.uuid4().hex}.parquet"
            rel = (
                os.path.join("_change_data", rel_dir, name)
                if rel_dir != "."
                else os.path.join("_change_data", name)
            )
            dst = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(os.path.join(root, f), dst)
            actions.append(
                {
                    "cdc": {
                        "path": rel,
                        "partitionValues": pvals,
                        "size": os.path.getsize(dst),
                        "dataChange": False,
                    }
                }
            )
    shutil.rmtree(staging, ignore_errors=True)
    return actions


def table_changes_delta_py(
    path: str,
    spark: SparkSession,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> DataFrame:
    """CHANGE DATA FEED read (the readChangeFeed/table_changes surface):
    row-level changes between two versions (inclusive), each stamped
    with _change_type / _commit_version / _commit_timestamp. Per the
    spec's reader requirements: a commit WITH cdc actions serves
    exactly those files; a commit without them reconstructs — adds with
    dataChange=true are inserts, removes with dataChange=true are
    deletes (read from the still-on-disk retired files, the reason
    VACUUM retention exists). dataChange=false commits (OPTIMIZE)
    produce no changes. Requires delta.enableChangeDataFeed=true."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType

    schema_json, partition_cols, _adds, cfg, _proto = _replay_log_full(path)
    if not _cdf_enabled(cfg):
        raise ValueError(
            "change data feed is not enabled on this table "
            "(enable_cdf_delta_py / delta.enableChangeDataFeed)"
        )
    schema = StructType.fromJson(json.loads(schema_json))
    cdc_schema = StructType(
        list(schema.fields)
        + [StructField("_change_type", StringType())]
    )
    # Partitioned tables: data AND cdc files omit the partition columns
    # (spec: cdc files follow the data-file rules); values come from
    # each action's partitionValues, typed from their string form.
    part_types = {f.name: f.dataType for f in schema.fields if f.name in partition_cols}
    data_fields = [f for f in schema.fields if f.name not in partition_cols]
    file_schema = StructType(data_fields)
    file_cdc_schema = StructType(
        data_fields + [StructField("_change_type", StringType())]
    )

    def _restore(entries, fschema, change_type=None):
        """[(abs_path, pvals, dv_desc|None, keep_positions|None)] ->
        DataFrame in cdc_schema column order with partition columns
        restored per partition-value group. Files carrying a
        deletion-vector descriptor are read MoR-style (the DV's row
        positions anti-joined out on (file, row_index)); entries with an
        explicit keep_positions list instead SELECT exactly those row
        ordinals (the DV-diff reconstruction of an in-place re-add). Both
        are the reason cdc-less DV commits (e.g. RESTORE) no longer
        refuse."""
        groups: dict[tuple, list[str]] = {}
        dv_rows: list[tuple[str, int]] = []
        keep_rows: list[tuple[str, int]] = []
        keep_files: set[str] = set()
        for p_, pv, dv, keep in entries:
            key = tuple((pv or {}).get(c) for c in partition_cols)
            groups.setdefault(key, []).append(p_)
            ap = os.path.abspath(p_)
            if keep is not None:
                keep_files.add(ap)
                keep_rows.extend((ap, int(x)) for x in keep)
            elif dv:
                dv_rows.extend((ap, int(x)) for x in _dv_read(path, dv))
        dsch = StructType(
            [StructField("__fp", StringType()), StructField("__pos", LongType())]
        )
        dv_frame = spark.createDataFrame(dv_rows, dsch) if dv_rows else None
        keep_frame = spark.createDataFrame(keep_rows, dsch) if keep_files else None
        outs = []
        for key, files in _pv_sorted(groups):
            df = spark.read.schema(fschema).parquet(*files)
            if dv_frame is not None or keep_frame is not None:
                tagged = df.select(
                    "*",
                    F.regexp_replace(
                        F.col("_metadata.file_path"), "^file:/+", "/"
                    ).alias("__fp"),
                    F.col("_metadata.row_index").alias("__pos"),
                )
                if dv_frame is not None:
                    tagged = tagged.join(
                        F.broadcast(dv_frame), ["__fp", "__pos"], "left_anti"
                    )
                if keep_frame is not None:
                    # rows from keep-listed files survive only if their
                    # ordinal is listed; other files pass through
                    kf = keep_frame.withColumn("__keep", F.lit(True))
                    tagged = tagged.join(
                        F.broadcast(kf), ["__fp", "__pos"], "left_outer"
                    ).filter(
                        (~F.col("__fp").isin(*sorted(keep_files)))
                        | F.col("__keep").isNotNull()
                    ).drop("__keep")
                df = tagged.drop("__fp", "__pos")
            if change_type is not None:
                df = df.withColumn("_change_type", F.lit(change_type))
            for c, raw in zip(partition_cols, key):
                df = df.withColumn(c, F.lit(raw).cast(part_types[c]))
            outs.append(df.select(*[f.name for f in cdc_schema.fields]))
        res = outs[0]
        for o in outs[1:]:
            res = res.unionAll(o)
        return res

    end = ending_version
    versions = [
        v for v in _list_versions(path)
        if v >= starting_version and (end is None or v <= end)
    ]
    parts = []
    for v in versions:
        cdc_entries: list[tuple] = []
        # (rel, partitionValues, deletionVector?) — rel kept so in-place
        # re-adds can be diffed against the prior state
        add_entries: list[tuple[str, dict, dict | None]] = []
        removes: list[tuple[str, dict | None, dict | None]] = []
        ts = 0
        op = ""
        with open(_commit_file(path, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    cdc_entries.append(
                        (
                            os.path.join(path, action["cdc"]["path"]),
                            action["cdc"].get("partitionValues") or {},
                            None,
                            None,
                        )
                    )
                elif "add" in action and action["add"].get("dataChange", True):
                    add_entries.append(
                        (
                            action["add"]["path"],
                            action["add"].get("partitionValues") or {},
                            action["add"].get("deletionVector"),
                        )
                    )
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    removes.append(
                        (
                            action["remove"]["path"],
                            action["remove"].get("partitionValues"),
                            action["remove"].get("deletionVector"),
                        )
                    )
                elif "commitInfo" in action:
                    ts = int(action["commitInfo"].get("timestamp") or 0)
                    op = str(action["commitInfo"].get("operation") or "")
        if cdc_entries:
            df = _restore(cdc_entries, file_cdc_schema)
        else:
            # cdc-less commit: spec reconstruction — dataChange adds are
            # inserts, dataChange removes are deletes — made DV/MoR-aware
            # (r9 advice, medium). A RESTORE re-adds an identity-changed
            # file with NO remove action and no cdc; its row-level change
            # is the DV DIFF against the prior state: positions deleted
            # before but not after resurface as inserts, positions
            # deleted after but not before become deletes. Plain appends
            # (no DVs, no removes, not a RESTORE) skip the prior-state
            # replay entirely. DV DML on CDF-enabled tables still takes
            # the cdc branch above.
            need_prior = v > 0 and (
                bool(removes)
                or any(dv for _r, _pv, dv in add_entries)
                or op.upper() == "RESTORE"
            )
            prior_adds: dict = {}
            if need_prior:
                _sj, _pc, prior_adds, _cfg, _pr = _replay_log_full(path, v - 1)
            add_rels = {rel for rel, _pv, _dv in add_entries}
            ins_entries: list[tuple] = []
            del_entries: list[tuple] = []
            for rel, pv, dv in add_entries:
                abs_p = os.path.join(path, rel)
                prior = prior_adds.get(rel) if need_prior else None
                if prior is None:
                    # new (or resurfacing) file: its visible content
                    # inserts, MoR-applying any DV it carries
                    ins_entries.append((abs_p, pv, dv, None))
                    continue
                old_dv = prior.get("deletionVector")
                old_pos = set(_dv_read(path, old_dv)) if old_dv else set()
                new_pos = set(_dv_read(path, dv)) if dv else set()
                resurfaced = sorted(old_pos - new_pos)
                hidden = sorted(new_pos - old_pos)
                if resurfaced:
                    ins_entries.append((abs_p, pv, None, resurfaced))
                if hidden:
                    del_entries.append((abs_p, pv, None, hidden))
            # removes of files re-added in the SAME commit are covered by
            # the DV diff above (the remove+re-add is one in-place edit)
            live_removes = [r for r in removes if r[0] not in add_rels]
            if live_removes:
                missing = [
                    r for r, _pv, _dv in live_removes
                    if not os.path.exists(os.path.join(path, r))
                ]
                if missing:
                    raise FileNotFoundError(
                        f"change feed at version {v} needs vacuumed files {missing[:3]}"
                    )
                # remove actions may omit partitionValues and (in this
                # writer) never carry the retired file's deletionVector;
                # recover both from the prior state so deletes reflect
                # the rows that were actually visible
                for rel, pv, dv in live_removes:
                    prior = prior_adds.get(rel)
                    if prior is None and pv is None and partition_cols:
                        raise ValueError(
                            f"change feed at version {v}: removed file "
                            f"{rel!r} not present at version {v - 1}"
                        )
                    if prior is not None:
                        if dv is None:
                            dv = prior.get("deletionVector")
                        if pv is None:
                            pv = prior.get("partitionValues") or {}
                    del_entries.append((os.path.join(path, rel), pv or {}, dv, None))
            pieces = []
            if ins_entries:
                pieces.append(_restore(ins_entries, file_schema, "insert"))
            if del_entries:
                pieces.append(_restore(del_entries, file_schema, "delete"))
            if not pieces:
                continue
            df = pieces[0]
            for p_ in pieces[1:]:
                df = df.unionAll(p_)
        parts.append(
            df.withColumn("_commit_version", F.lit(v).cast("long"))
            .withColumn("_commit_timestamp", F.lit(ts).cast("long"))
        )
    if not parts:
        return spark.createDataFrame(
            [],
            StructType(
                list(cdc_schema.fields)
                + [
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", LongType()),
                ]
            ),
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionAll(p_)
    return out


def merge_deltalake_py(
    path: str,
    spark: SparkSession,
    source: DataFrame,
    on: str,
    *,
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: bool | str = False,
    when_not_matched_insert: bool | dict[str, str] = True,
) -> None:
    """MERGE INTO (the Delta upsert statement), copy-on-write. ``on``
    is a SQL condition over aliases ``t`` (target) and ``s`` (source);
    matched target rows are deleted when ``when_matched_delete`` (True,
    or a SQL condition over t/s) fires, else updated per
    ``when_matched_update`` (column -> SQL expr over t/s); unmatched
    source rows are inserted (``when_not_matched_insert``: True inserts
    the source's target-schema columns, a dict maps target column ->
    expr over s). Unmatched target rows pass through. Like Delta, a
    target row matching MULTIPLE source rows is an error (the
    nondeterministic-merge guard). One commit; with the change data
    feed enabled it carries exact cdc rows (delete / update pre+post /
    insert). Prior versions stay time-travelable.

    FILE-GRANULAR copy-on-write (delta-spark's two-pass shape): pass 1
    inner-joins target and source and folds per-(file, row) match
    counts to ONE driver row per file containing a fired matched
    clause; pass 2 rewrites only those files (left-joining the source
    back for the per-row update/delete) plus new files for the
    inserts. Every untouched data file stays byte-identical and its
    add action carries forward via log replay."""
    from pyspark.sql import functions as F

    _gate_column_mapping(path)
    schema_json, partition_cols, adds, cfg, _proto = _replay_log_full(path)
    tcols = [f["name"] for f in json.loads(schema_json)["fields"]]
    t = _scan_adds_tagged(spark, path, adds, schema_json, partition_cols)
    s = source.withColumn("__smatch", F.lit(1)).alias("s")
    cond = F.expr(on)
    if when_matched_delete is True:
        del_cond = F.lit(True)
    elif when_matched_delete:
        del_cond = F.expr(str(when_matched_delete)).eqNullSafe(F.lit(True))
    else:
        del_cond = F.lit(False)

    def tgt(c):
        return F.col(f"t.{c}")

    upd = dict(when_matched_update or {})
    bad = set(upd) - set(tcols)
    if bad:
        raise ValueError(f"MERGE update targets not in table schema: {sorted(bad)}")
    # metaData is NOT rewritten by a file-granular commit — update
    # expressions must land in the table's declared column types
    ttypes = {
        f.name: f.dataType for f in StructType.fromJson(json.loads(schema_json)).fields
    }
    row_changes = del_cond | F.lit(bool(upd))

    # Pass 1: per-file match stats — maxn > 1 is the nondeterministic-
    # merge guard, chg marks files a matched clause fires in. The
    # driver sees one row per file with a match, not one per row.
    affected: list[str] = []
    if t is not None:
        stats = (
            t.alias("t")
            .join(s, cond, "inner")
            .select(
                F.col("t.__fp").alias("__fp"),
                F.col("t.__pos").alias("__pos"),
                row_changes.alias("__chg"),
            )
            .groupBy("__fp", "__pos")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.col("__chg").cast("int")).alias("chg"),
            )
            .groupBy("__fp")
            .agg(F.max("n").alias("maxn"), F.max("chg").alias("chg"))
            .collect()
        )
        if any(r["maxn"] > 1 for r in stats):
            raise ValueError(
                "MERGE: a target row matched multiple source rows (merge would "
                "be nondeterministic) — deduplicate the source on the join keys"
            )
        affected = sorted(r["__fp"] for r in stats if r["chg"])

    # Pass 2: rewrite ONLY the affected files.
    kept = None
    joined = None
    matched = F.col("s.__smatch").isNotNull()
    update_applies = matched & ~del_cond & F.lit(bool(upd))
    if affected:
        aff = _affected_scan(
            spark, path, adds, schema_json, partition_cols, affected
        )
        joined = aff.alias("t").join(s, cond, "left")
        kept = joined.filter(~(matched & del_cond)).select(
            *[
                F.when(update_applies, F.expr(upd[c]).cast(ttypes[c]))
                .otherwise(tgt(c))
                .alias(c)
                if c in upd
                else tgt(c).alias(c)
                for c in tcols
            ]
        )
    ins = None
    if when_not_matched_insert:
        if t is None:
            unmatched_s = source.alias("s")
        else:
            unmatched_s = source.alias("s").join(
                t.alias("t"), cond, "left_anti"
            )
        if when_not_matched_insert is True:
            missing = [c for c in tcols if c not in unmatched_s.columns]
            if missing:
                raise ValueError(
                    f"MERGE insert needs source columns {missing} (or pass an "
                    "insert mapping)"
                )
            ins = unmatched_s.select(
                *[F.col(c).cast(ttypes[c]).alias(c) for c in tcols]
            )
        else:
            imap = dict(when_not_matched_insert)
            bad = set(imap) - set(tcols)
            if bad:
                raise ValueError(f"MERGE insert targets not in schema: {sorted(bad)}")
            ins = unmatched_s.select(
                *[
                    (F.expr(imap[c]) if c in imap else F.lit(None))
                    .cast(ttypes[c])
                    .alias(c)
                    for c in tcols
                ]
            )
    pieces = [p for p in (kept, ins) if p is not None]
    out = pieces[0] if pieces else None
    for p_ in pieces[1:]:
        out = out.unionAll(p_)

    extra = None
    if _cdf_enabled(cfg):
        cdc = None
        if joined is not None:
            deleted = joined.filter(matched & del_cond).select(
                *[tgt(c).alias(c) for c in tcols]
            ).withColumn("_change_type", F.lit("delete"))
            pre = joined.filter(update_applies).select(
                *[tgt(c).alias(c) for c in tcols]
            ).withColumn("_change_type", F.lit("update_preimage"))
            post = joined.filter(update_applies).select(
                *[
                    F.expr(upd[c]).cast(ttypes[c]).alias(c)
                    if c in upd
                    else tgt(c).alias(c)
                    for c in tcols
                ]
            ).withColumn("_change_type", F.lit("update_postimage"))
            cdc = deleted.unionAll(pre).unionAll(post)
        if ins is not None:
            insc = ins.withColumn("_change_type", F.lit("insert"))
            cdc = insc if cdc is None else cdc.unionAll(insc)
        if cdc is not None:
            extra = _write_cdc_file(path, cdc, partition_cols)
    _cow_commit(
        path, adds, affected, out, partition_cols, "MERGE",
        {"predicate": on}, extra,
    )


# ---------------------------------------------------------------------------
# Data skipping (per-file stats) + OPTIMIZE ZORDER
# ---------------------------------------------------------------------------

def _file_stats_json(file_path: str) -> str | None:
    """Delta per-file ``stats`` JSON lifted from the parquet footer:
    numRecords plus min/max/nullCount for top-level primitive columns
    whose row groups all carry exact statistics (ints, floats without
    NaN flags, strings, bools). Conservative: a column with any
    stat-less or unordered row group is omitted — absent stats never
    prune. Dates/timestamps/nested/binary are skipped (this engine's
    pruning handles the numeric/string predicates that matter for
    Z-ORDER; everything else scans)."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(file_path).metadata
    except Exception:
        return None
    n = md.num_rows
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    if md.num_row_groups == 0 or n == 0:
        return json.dumps(
            {"numRecords": n, "minValues": {}, "maxValues": {}, "nullCount": {}}
        )
    ok_types = {"INT32", "INT64", "FLOAT", "DOUBLE", "BYTE_ARRAY", "BOOLEAN"}
    for ci in range(md.num_columns):
        col0 = md.row_group(0).column(ci)
        name = col0.path_in_schema
        if "." in name:  # nested leaf
            continue
        if col0.physical_type not in ok_types:
            continue
        lo = hi = None
        nc = 0
        good = True
        for rg in range(md.num_row_groups):
            c = md.row_group(rg).column(ci)
            try:
                s = c.statistics
                if (s is None or not s.has_min_max
                        or s.min is None or s.max is None):
                    good = False
                    break
                mn_mx = (s.min, s.max)
            except Exception:  # pyarrow can't materialize some logical types
                good = False
                break
            nc += s.null_count if s.null_count is not None else 0
            mn, mx = mn_mx
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    good = False
                    break
            if isinstance(mn, float) and (mn != mn or mx != mx):  # NaN
                good = False
                break
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if good and lo is not None:
            lo, hi = _stats_scalar(lo), _stats_scalar(hi)
            if lo is None or hi is None:
                continue
            mins[name] = lo
            maxs[name] = hi
            nulls[name] = nc
    try:
        return json.dumps(
            {"numRecords": n, "minValues": mins, "maxValues": maxs,
             "nullCount": nulls}
        )
    except (TypeError, ValueError):  # never block the write on stats
        return json.dumps(
            {"numRecords": n, "minValues": {}, "maxValues": {},
             "nullCount": {}}
        )


def _stats_scalar(v):
    """Normalize a parquet footer min/max to a JSON-serializable Delta
    stats value. pyarrow materializes logical types over INT32/INT64
    physical — DATE as datetime.date, TIMESTAMP as datetime.datetime,
    DECIMAL as Decimal — which json.dumps rejects; the Delta protocol
    serializes date/timestamp stats as ISO-8601 strings (stats_admit
    falls back to admit-all on any cross-type compare, so string-form
    bounds are sound). Timestamps serialize at FULL microsecond
    precision: a truncated-to-millisecond maxValue understates the
    file's range and can wrongly prune it for a string-literal filter
    (the protocol allows truncation only if max bounds round UP; exact
    serialization sidesteps the rounding entirely — str-vs-str ISO
    compares stay correct across mixed fractional widths because the
    date/time prefix is fixed-width). Returns None for anything else →
    column skipped (absent stats never prune)."""
    if isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return None


def delta_admitted_files(
    path: str,
    filters: list[tuple],
    version: int | None = None,
) -> tuple[list[str], int]:
    """Plan a filtered Delta scan: return (admitted add paths, total
    live adds) keeping every file whose ``stats`` ranges could satisfy
    ALL of ``filters`` ([(column, op, literal)], AND semantics — the
    iceberg reader's filter shape, evaluated with the same
    ``stats_admit`` bounds logic). Files without stats for a filtered
    column are always admitted (absent stats never prune) — so the
    planner is sound for tables written before stats collection."""
    from daft_spark.io.iceberg_transforms import stats_admit

    _schema_json, _parts, adds, _cfg, _proto = _replay_log_full(path, version)
    admitted = []
    for rel, add in sorted(adds.items()):
        st = add.get("stats")
        keep = True
        if st:
            try:
                parsed = json.loads(st)
                mins = parsed.get("minValues") or {}
                maxs = parsed.get("maxValues") or {}
            except (ValueError, TypeError):
                mins = maxs = {}
            for col, op, val in filters:
                lo, hi = mins.get(col), maxs.get(col)
                if lo is None and hi is None:
                    continue
                if not stats_admit(lo, hi, op, val):
                    keep = False
                    break
        if keep:
            admitted.append(rel)
    return admitted, len(adds)


def zorder_deltalake_py(
    path: str,
    spark: SparkSession,
    zorder_by: list[str],
    target_files: int = 4,
) -> dict:
    """OPTIMIZE ZORDER: rewrite the table clustered on the Morton
    (Z-order) curve over ``zorder_by`` — multi-column data skipping
    where a plain sort only skips on its leading column. Each z
    column maps to a 16-bit rank (percent_rank over the column, so
    skew cannot collapse the curve), the ranks bit-interleave into
    one z-value (pure integer Column expressions), and the table
    rewrites range-partitioned + sorted by z into ``target_files``
    files. The commit retires every live file and adds the clustered
    replacements with ``dataChange=false`` (streaming sources skip it,
    same contract as OPTIMIZE) and fresh per-file stats, which is
    what makes ``delta_admitted_files`` prune point/range predicates
    on EITHER z column afterwards.

    Scale: the per-column 16-bit coordinate is a LINEAR bin over the
    column's [min, max] (one broadcast 1-row aggregate — a global
    rank window would single-partition the table, the exact defect
    this engine plan-audits elsewhere); heavy skew in a z column
    degrades its share of the curve but never correctness — the
    stats pruning stays sound either way. Numeric z columns only.
    Nothing touches the driver but file metadata.
    Returns {"removed": n, "added": m}."""
    from pyspark.sql import functions as F

    if not zorder_by:
        raise ValueError("zorder_by must be non-empty")
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    _schema_json, partition_cols, adds, _cfg, _proto = _replay_log_full(path)
    if partition_cols:
        raise NotImplementedError("zorder of a partitioned table")
    if not adds:
        return {"removed": 0, "added": 0}
    df = read_deltalake_py(path, spark)
    # Per-column quantization bits shrink with column count so the
    # interleaved key never shifts past bit 62 (bit 63 would overflow
    # the signed long: r11 ADVICE low). 1 col -> 16 bits, 2 -> 16,
    # 3 -> 16, 4 -> 15, 8 -> 7 ...
    bits = min(16, 62 // len(zorder_by))
    if bits == 0:
        raise ValueError(
            f"zorder_by supports at most 62 columns, got {len(zorder_by)}"
        )
    rng = df.agg(
        *[
            x
            for c in zorder_by
            for x in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    ranked = df.crossJoin(F.broadcast(rng))
    for c in zorder_by:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        frac = (F.col(c).cast("double") - lo) / span
        ranked = ranked.withColumn(
            f"__r_{c}",
            F.least(
                F.floor(frac * (1 << bits)).cast("long"),
                F.lit((1 << bits) - 1).cast("long"),
            ),
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(zorder_by):
            bit = F.shiftright(F.col(f"__r_{c}"), i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * len(zorder_by) + j)).cast("long")
    clustered = (
        ranked.withColumn("__z", z)
        .repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop(
            "__z",
            *[f"__r_{c}" for c in zorder_by],
            *[f"__lo_{c}" for c in zorder_by],
            *[f"__hi_{c}" for c in zorder_by],
        )
    )
    now_ms = int(time.time() * 1000)
    new_adds = _stage_data_files(clustered, path, 0, [], now_ms)
    actions: list[dict] = []
    for rel in sorted(adds):
        actions.append(
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": now_ms,
                    "dataChange": False,
                }
            }
        )
    for a in new_adds:
        a["add"]["dataChange"] = False
        actions.append(a)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "OPTIMIZE",
                "operationParameters": {
                    "zOrderBy": json.dumps(zorder_by),
                },
                "engineInfo": "daft_spark pure-python delta writer",
            }
        }
    )
    version = max(_list_versions(path) + _checkpoint_versions(path)) + 1
    _commit_actions(path, version, actions)
    return {"removed": len(adds), "added": len(new_adds)}
