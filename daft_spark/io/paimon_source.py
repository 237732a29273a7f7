"""Streaming Paimon SOURCE — a Spark Python DataSource (format
``daft_paimon``) that tails an APPEND-ONLY Paimon table's snapshot
chain: offset = snapshot id, micro-batch (start, end] = the data files
those snapshots' DELTA manifests added. Completes the lake streaming
matrix next to the Delta source/sink and Iceberg source/sink.

Semantics follow Paimon's own streaming read of append tables:

- the FIRST batch is the table's current snapshot (live files after
  full base+delta replay — compacted-away files never surface);
- later batches deliver each APPEND snapshot's delta ADD entries;
- COMPACT snapshots are rearrangements of already-delivered rows and
  are skipped entirely (their deletes retire pre-compact files, their
  adds restate the same rows);
- an OVERWRITE snapshot fails the stream unless ``ignorechanges`` is
  set (its adds are then delivered), matching the Delta source's knob;
- PRIMARY-KEY tables are rejected: their stream is a changelog
  (upserts/deletes by key), not an append stream, and this engine does
  not fake retractions.

Reference parity note: the reference engine has no streaming — this is
the free-superset Structured Streaming surface (SURVEY §2.8).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T


class PaimonStreamSource(DataSource):
    """``spark.readStream.format("daft_paimon").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "daft_paimon"

    def schema(self):
        from daft_spark.io.paimon import _latest_schema, _paimon_type_to_spark

        schema = _latest_schema(self.options["path"])
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _paimon_type_to_spark(f["type"]),
                    "NOT NULL" not in f["type"],
                )
                for f in schema["fields"]
            ]
        )

    def streamReader(self, schema) -> "PaimonStreamReader":
        return PaimonStreamReader(self.options, schema)


class PaimonStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        from daft_spark.io.paimon import _latest_schema

        self.path = options["path"]
        self.ignore_changes = str(options.get("ignorechanges", "")).lower() == "true"
        self.schema = schema
        self.pschema = _latest_schema(self.path)
        if self.pschema.get("primaryKeys"):
            raise ValueError(
                "streaming a PRIMARY-KEY Paimon table is a changelog "
                "(upserts/deletes by key), not an append stream — read it "
                "in batch via read_paimon_py, which merges on read"
            )
        self.partition_keys = list(self.pschema.get("partitionKeys") or [])

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        # snapshot -1 => first batch delivers the then-latest snapshot
        return {"snapshot": -1}

    def latestOffset(self) -> dict:
        from daft_spark.io.paimon import _latest_snapshot_id

        sid = _latest_snapshot_id(self.path)
        return {"snapshot": int(sid or 0)}

    def commit(self, end: dict) -> None:
        pass

    # -- planning ----------------------------------------------------------
    def _entry_tuple(self, entry: dict) -> tuple:
        """(absolute file path, json partition values) — the partition
        BinaryRow decodes DRIVER-side so executors only parse JSON."""
        from daft_spark.io.paimon import _entry_path, binary_row_decode

        ftypes = {f["name"]: f["type"] for f in self.pschema["fields"]}
        rec = {
            "partition": entry["_PARTITION"],
            "bucket": entry["_BUCKET"],
            "name": entry["_FILE"]["_FILE_NAME"],
        }
        fpath = _entry_path(self.path, self.pschema, rec)
        vals = (
            binary_row_decode(
                entry["_PARTITION"], [ftypes[k] for k in self.partition_keys]
            )
            if self.partition_keys
            else []
        )
        pvals = {k: (None if v is None else str(v)) for k, v in zip(self.partition_keys, vals)}
        return (fpath, json.dumps(pvals))

    def _snapshot_entries(self, sid: int) -> list[tuple]:
        from daft_spark.io.paimon import (
            _entry_path,
            _live_entries,
            _load_snapshot,
            binary_row_decode,
        )

        ftypes = {f["name"]: f["type"] for f in self.pschema["fields"]}
        out = []
        for rec in _live_entries(self.path, _load_snapshot(self.path, sid)):
            fpath = _entry_path(self.path, self.pschema, rec)
            vals = (
                binary_row_decode(
                    rec["partition"], [ftypes[k] for k in self.partition_keys]
                )
                if self.partition_keys
                else []
            )
            pvals = {
                k: (None if v is None else str(v))
                for k, v in zip(self.partition_keys, vals)
            }
            out.append((fpath, json.dumps(pvals)))
        return out

    def _incremental_entries(self, start: int, end: int) -> list[tuple]:
        from daft_spark.io.avro import read_ocf
        from daft_spark.io.paimon import _load_snapshot, _manifest_dir

        out: list[tuple] = []
        for sid in range(start + 1, end + 1):
            snap = _load_snapshot(self.path, sid)
            kind = snap.get("commitKind", "APPEND")
            if kind == "COMPACT":
                continue  # rearrangement of already-delivered rows
            if kind == "OVERWRITE" and not self.ignore_changes:
                raise RuntimeError(
                    f"Paimon snapshot {sid} OVERWRITEs data; streaming a "
                    "changed table needs ignorechanges=true"
                )
            name = snap.get("deltaManifestList")
            if not name:
                continue
            _, _, metas = read_ocf(os.path.join(_manifest_dir(self.path), name))
            for meta in metas:
                _, _, entries = read_ocf(
                    os.path.join(_manifest_dir(self.path), meta["_FILE_NAME"])
                )
                for e in entries:
                    if e["_KIND"] == 0:  # ADD
                        out.append(self._entry_tuple(e))
        return out

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["snapshot"]), int(end["snapshot"])
        if ev <= sv or ev == 0:
            entries: list[tuple] = []
        elif sv < 0:
            entries = self._snapshot_entries(ev)
        else:
            entries = self._incremental_entries(sv, ev)
        parts = [InputPartition(t) for t in entries]
        return parts or [InputPartition(None)]

    # -- execution ----------------------------------------------------------
    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        fpath, pvals_json = partition.value
        pvals = json.loads(pvals_json)
        target = pa.schema(
            [
                pa.field(f.name, f.type, nullable=True)
                for f in to_arrow_schema(self.schema)
            ]
        )
        table = pq.read_table(fpath)
        n = table.num_rows
        cols = []
        for tfield in target:
            if tfield.name in table.column_names:
                cols.append(table.column(tfield.name).cast(tfield.type))
            elif tfield.name in self.partition_keys:
                # partition columns live in the manifest entry's
                # BinaryRow, decoded driver-side into string pvals
                raw = pvals.get(tfield.name)
                arr = pa.array([raw] * n, type=pa.string())
                cols.append(arr.cast(tfield.type))
            else:
                cols.append(pa.nulls(n, type=tfield.type))
        yield from pa.Table.from_arrays(cols, schema=target).to_batches()
