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

Out of scope (raise cleanly): checkpoints (only needed past 10 commits
— we read every .json), partitioned tables, deletion vectors, column
mapping, reader/writer protocol versions above (1, 2).

At 100 TB the log replay is driver-side metadata work (KBs per commit);
the data path is an ordinary multi-file parquet scan with the usual
pushdowns, so scale behavior is identical to reading raw parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"
_MAX_SUPPORTED = {"minReaderVersion": 1, "minWriterVersion": 2}


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


def _replay_log(table_path: str, version: int | None = None):
    """Return (schema_json, active_file_relpaths) after replaying the
    log up to and including ``version`` (default: latest)."""
    versions = _list_versions(table_path)
    if not versions:
        raise FileNotFoundError(
            f"not a Delta table (no {_LOG_DIR}/*.json under {table_path})"
        )
    if version is not None:
        versions = [v for v in versions if v <= version]
        if not versions or versions[-1] != version:
            raise ValueError(
                f"version {version} not found in Delta log (have {versions})"
            )
    schema_json: str | None = None
    active: dict[str, dict] = {}
    for v in versions:
        with open(_commit_file(table_path, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    p = action["protocol"]
                    if p.get("minReaderVersion", 1) > _MAX_SUPPORTED["minReaderVersion"]:
                        raise NotImplementedError(
                            f"Delta minReaderVersion {p['minReaderVersion']} > 1 "
                            "(checkpoints/deletion vectors/column mapping not supported "
                            "by this pure-Python reader; use delta-spark)"
                        )
                elif "metaData" in action:
                    schema_json = action["metaData"]["schemaString"]
                    if action["metaData"].get("partitionColumns"):
                        raise NotImplementedError(
                            "partitioned Delta tables are not supported by this "
                            "pure-Python reader; use delta-spark"
                        )
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    if schema_json is None:
        raise ValueError(f"Delta log under {table_path} has no metaData action")
    return schema_json, sorted(active)


def read_deltalake_py(
    path: str, spark: SparkSession, version: int | None = None
) -> DataFrame:
    """Read a (non-partitioned) Delta table by replaying its JSON log.

    The result is a plain multi-file parquet scan — filter/column
    pushdown, split planning, and AQE all apply exactly as for
    read_parquet. ``version`` time-travels (reference read_deltalake's
    ``version`` kwarg)."""
    schema_json, files = _replay_log(path, version)
    schema = StructType.fromJson(json.loads(schema_json))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*[os.path.join(path, f) for f in files])


def write_deltalake_py(
    df: DataFrame, path: str, mode: str = "append"
) -> None:
    """Write ``df`` as a Delta commit: parquet data files + one atomic
    JSON log entry. Modes: append, overwrite, error, ignore."""
    if mode not in ("append", "overwrite", "error", "ignore"):
        raise ValueError(f"unsupported mode {mode!r}")
    versions = _list_versions(path)
    exists = bool(versions)
    if exists and mode == "error":
        raise FileExistsError(f"Delta table already exists at {path}")
    if exists and mode == "ignore":
        return
    version = (versions[-1] + 1) if exists else 0

    # Stage data files with Spark's parquet writer, then move them into
    # the table root under unique names (Delta data files are immutable
    # and never share names across commits).
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(_log_path(path), exist_ok=True)
    now_ms = int(time.time() * 1000)
    adds = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"part-{version:05d}-{uuid.uuid4().hex}.parquet"
        src = os.path.join(staging, f)
        dst = os.path.join(path, name)
        shutil.move(src, dst)
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": os.path.getsize(dst),
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            }
        )
    shutil.rmtree(staging, ignore_errors=True)

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
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and exists:
        _, prior = _replay_log(path)
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
