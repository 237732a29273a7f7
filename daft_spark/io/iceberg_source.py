"""``daft_iceberg`` — an Iceberg table as a Spark Python DataSource
with AUTOMATIC filter pushdown.

    spark.read.format("daft_iceberg").option("path", p).load()
        .filter("status = 'F'")

Catalyst hands the scan its filters through ``pushFilters`` (Spark
4.1 Python DataSource API); supported comparisons translate into the
same (column, op, literal) tuples the metadata walk prunes manifests
with (io/iceberg.py + iceberg_transforms.entry_matches), so partition
pruning needs no manual ``filters=`` plumbing. Every filter is
returned as unhandled — pruning is file-granular, and Spark re-applies
the predicates row-level above the scan, which keeps semantics exact.

Execution shape: one input partition per pruned data file; each task
reads its file with pyarrow and streams Arrow record batches, applying
the table's merge-on-read deletes LOCALLY (equality deletes as value
anti-masks, position deletes as ordinal anti-masks — per-file work,
no shuffle at all). This path trades the JVM parquet scan for
transparent SQL integration; ``read_iceberg_py`` remains the
throughput path (native scan + the same pruning, filters passed
explicitly) and is what ``read_iceberg`` routes to.

KNOWN SPARK LIMITATION (verified on 4.1, documented in
tests/test_iceberg.py::test_iceberg_datasource_plan_cache_staleness):
Spark caches a Python data source's planned read (partitions + read
function) on the relation and re-plans only when the next query has
filters to push. Reusing ONE ``load()`` DataFrame for a filtered
action and then a weaker/unfiltered action replays the stale filtered
plan (missing rows). Workaround: call ``load()`` per query, or use
``read_iceberg_py``. Nothing the source can do — ``pushFilters`` is
never invoked for the filterless re-use.

Reference: ``daft/io/iceberg/_iceberg.py:130`` plans Iceberg scans
through pyiceberg with pushed filters; this source is the same design
on Spark's pluggable-scan surface.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)


def _translate(filters) -> tuple[list[tuple], list]:
    """Spark Filter objects -> (col, op, literal) tuples for manifest
    pruning. Only top-level columns; everything else is ignored (and
    ALL filters are reported back as unhandled either way)."""
    out = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0]
        if isinstance(f, EqualTo):
            out.append((col, "=", f.value))
        elif isinstance(f, GreaterThan):
            out.append((col, ">", f.value))
        elif isinstance(f, GreaterThanOrEqual):
            out.append((col, ">=", f.value))
        elif isinstance(f, LessThan):
            out.append((col, "<", f.value))
        elif isinstance(f, LessThanOrEqual):
            out.append((col, "<=", f.value))
        elif isinstance(f, In):
            out.append((col, "in", list(f.values)))
        elif isinstance(f, EqualNullSafe):
            # <=> null is IS NULL; <=> non-null prunes exactly like =
            out.append((col, "isnull" if f.value is None else "=", f.value))
        elif isinstance(f, IsNull):
            out.append((col, "isnull", None))
        elif isinstance(f, IsNotNull):
            out.append((col, "isnotnull", None))
    return out, list(filters)


class IcebergSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "daft_iceberg"

    def schema(self):
        from daft_spark.io.iceberg import _current_schema, _latest_metadata

        meta = _latest_metadata(self.options["path"])
        return _current_schema(meta)

    def reader(self, schema) -> "IcebergReader":
        return IcebergReader(self.options, schema)

    def streamReader(self, schema) -> "IcebergStreamReader":
        return IcebergStreamReader(self.options, schema)


class IcebergReader(DataSourceReader):
    def __init__(self, options, schema=None):
        from daft_spark.io.iceberg import (
            _current_ice_schema,
            _current_schema,
            _latest_metadata,
        )

        self.path = options["path"]
        snap = options.get("snapshot_id")
        self.snapshot_id = int(snap) if snap else None
        # incremental APPEND scan (the Spark-Iceberg connector's
        # start-snapshot-id/end-snapshot-id read options): rows added
        # by snapshots AFTER start (exclusive) up to end (inclusive,
        # default current). Only append snapshots may be in range.
        start_inc = options.get("start-snapshot-id") or options.get(
            "start_snapshot_id"
        )
        end_inc = options.get("end-snapshot-id") or options.get("end_snapshot_id")
        self.start_snapshot_id = int(start_inc) if start_inc else None
        self.end_snapshot_id = int(end_inc) if end_inc else None
        if self.end_snapshot_id is not None and self.start_snapshot_id is None:
            raise ValueError("end-snapshot-id requires start-snapshot-id")
        if self.start_snapshot_id is not None and self.snapshot_id is not None:
            raise ValueError(
                "pass snapshot_id/ref or start-snapshot-id, not both"
            )
        # named-ref pinning (tag/branch — spec §Snapshot References):
        # .option("ref", "v1") resolves at plan time on the driver
        ref = options.get("ref")
        if ref:
            from daft_spark.io.iceberg import _latest_metadata as _lm
            from daft_spark.io.iceberg import resolve_iceberg_ref

            if self.snapshot_id is not None:
                raise ValueError("pass snapshot_id or ref, not both")
            self.snapshot_id = resolve_iceberg_ref(_lm(self.path), ref)
        self.filters: list[tuple] = []
        # Projection target for field-id column resolution (spec §Column
        # Projection): (name, field-id) per top-level column of the
        # CURRENT schema, plus the arrow types Spark expects back.
        # Resolved once on the driver; the reader pickles to executors.
        meta = _latest_metadata(self.path)
        ice = _current_ice_schema(meta)
        self.proj_fields = [(f["name"], f["id"]) for f in ice["fields"]]
        self._spark_schema = schema if schema is not None else _current_schema(meta)

    def _target_arrow_schema(self):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        return pa.schema(
            [
                pa.field(f.name, f.type, nullable=True)
                for f in to_arrow_schema(self._spark_schema)
            ]
        )

    def pushFilters(self, filters):
        if self.start_snapshot_id is not None:
            # incremental scans do no file pruning — hand every filter
            # back so Spark applies them row-level
            yield from filters
            return
        pruning, unhandled = _translate(filters)
        self.filters = pruning
        # file-granular pruning only: Spark must re-apply row-level
        yield from unhandled

    def _incremental_partitions(self) -> Sequence[InputPartition]:
        from daft_spark.io.iceberg import _latest_metadata

        meta = _latest_metadata(self.path)
        # ancestorsBetween semantics: the chain ends at end-snapshot-id
        # (default main head) and must contain start-snapshot-id —
        # a start on another branch has no defined "between".
        chain = _main_ancestors(meta, self.end_snapshot_id)
        if self.end_snapshot_id is not None and not chain:
            raise ValueError(
                f"end-snapshot-id {self.end_snapshot_id} not found"
            )
        by_id = {s["snapshot-id"]: s for s in chain}
        if self.start_snapshot_id not in by_id:
            raise ValueError(
                f"start-snapshot-id {self.start_snapshot_id} is not an "
                "ancestor of the end snapshot on the main branch"
            )
        start_seq = by_id[self.start_snapshot_id].get("sequence-number", 0)
        end_seq = chain[-1].get("sequence-number", 0) if chain else 0
        files = _appended_data_files(
            self.path,
            start_seq,
            end_seq,
            strict=True,
            end_snapshot_id=self.end_snapshot_id,
        )
        target = 128 * 1024 * 1024
        parts: list[InputPartition] = []
        bin_files: list[str] = []
        bin_bytes = 0
        for p, size in sorted(files):
            if bin_files and bin_bytes + size > target:
                parts.append(InputPartition((bin_files, [], [])))
                bin_files, bin_bytes = [], 0
            bin_files.append(p)
            bin_bytes += size
        if bin_files:
            parts.append(InputPartition((bin_files, [], [])))
        return parts or [InputPartition(([], [], []))]

    def partitions(self) -> Sequence[InputPartition]:
        from daft_spark.io.iceberg import _latest_metadata, _live_files_and_deletes

        if self.start_snapshot_id is not None:
            return self._incremental_partitions()
        meta = _latest_metadata(self.path)
        if meta.get("format-version", 1) > 2:
            raise NotImplementedError("Iceberg format v3+ not supported")
        data, deletes = _live_files_and_deletes(
            meta, self.path, self.snapshot_id, self.filters or None
        )
        id2name = {}
        if any(d.get("content", 2) == 2 for d in deletes):
            from daft_spark.io.iceberg import _field_names_by_id

            id2name = _field_names_by_id(meta)
        # tasks bin-pack files to ~128 MB (matching
        # spark.sql.files.maxPartitionBytes) so a table of many small
        # files doesn't schedule one task each; files with different
        # applicable-delete sets never share a task (delete application
        # is per-file local work, never a shuffle)
        target = 128 * 1024 * 1024
        by_key: dict[tuple, list] = {}
        for rec in data:
            eq = tuple(
                (d["path"], tuple(sorted(id2name[i] for i in d["equality_ids"])))
                for d in deletes
                if d.get("content", 2) == 2 and d["seq"] > rec["seq"]
            )
            pos = tuple(
                d["path"]
                for d in deletes
                if d.get("content") == 1 and d["seq"] >= rec["seq"]
            )
            by_key.setdefault((eq, pos), []).append(rec)
        parts = []
        for (eq, pos), recs in by_key.items():
            bin_files: list[str] = []
            bin_bytes = 0
            for rec in recs:
                if bin_files and bin_bytes + rec["size"] > target:
                    parts.append(InputPartition((bin_files, list(eq), list(pos))))
                    bin_files, bin_bytes = [], 0
                bin_files.append(rec["path"])
                bin_bytes += rec["size"]
            if bin_files:
                parts.append(InputPartition((bin_files, list(eq), list(pos))))
        # never return []: Spark invokes read() with a default partition
        # when the list is empty, and partition.value would then be absent
        return parts or [InputPartition(([], [], []))]

    def read(self, partition: InputPartition) -> Iterator:
        paths, eq_deletes, pos_deletes = partition.value
        for path in paths:
            yield from self._read_one(path, eq_deletes, pos_deletes)

    @staticmethod
    def _file_field_ids(schema) -> dict[int, int]:
        """{field_id: column_index} when EVERY top-level field of the
        file carries PARQUET:field_id, else {} (name-based legacy file)."""
        out: dict[int, int] = {}
        for i, f in enumerate(schema):
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            if fid is None:
                return {}
            out[int(fid)] = i
        return out

    def _project(self, table, target):
        """Project one data file to the CURRENT schema — by field id
        when the file embeds ids (renamed columns keep their values), by
        name otherwise; columns added after the file was written come
        back null. Row order is untouched, so position deletes still
        apply by ordinal."""
        import pyarrow as pa

        ids = self._file_field_ids(table.schema)
        name2fid = dict(self.proj_fields)
        n = table.num_rows
        cols = []
        for tfield in target:
            fid = name2fid.get(tfield.name)
            if ids and fid in ids:
                col = table.column(ids[fid])
            elif not ids and tfield.name in table.column_names:
                col = table.column(tfield.name)
            else:
                col = pa.nulls(n, type=tfield.type)
            cols.append(col.cast(tfield.type))
        return pa.table(cols, schema=target)

    @staticmethod
    def _encode_keys(table, cols):
        """Null-safe composite key per row as one large_binary array:
        each column cast to its string form, nulls replaced by a
        sentinel byte no cast can produce, joined with \\x1f. Equal
        tuples (null-safe) encode to equal bytes, so membership is a
        single vectorized ``is_in`` instead of per-delete-row kernels."""
        import pyarrow as pa
        import pyarrow.compute as pc

        parts = []
        for c in cols:
            col = table.column(c)
            if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
                s = pc.cast(col, pa.large_binary())
            else:
                s = pc.cast(pc.cast(col, pa.large_string()), pa.large_binary())
            parts.append(pc.fill_null(s, b"\x00<null>"))
        if len(parts) == 1:
            key = parts[0]
        else:
            key = pc.binary_join_element_wise(*parts, b"\x00\x1f")
        if isinstance(key, pa.ChunkedArray):
            if key.num_chunks == 0:
                return pa.array([], type=pa.large_binary())
            key = pa.concat_arrays(key.chunks)
        return key

    def _read_one(self, path, eq_deletes, pos_deletes) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # eq entries may arrive tuple-ized from the partition key
        eq_deletes = [(p, list(cols)) for p, cols in eq_deletes]
        target = self._target_arrow_schema()
        table = self._project(pq.read_table(path), target)
        n = table.num_rows
        keep = None  # boolean mask, lazily created
        if pos_deletes:
            norm = path if path.startswith("/") else "/" + path.lstrip("/")
            drop_chunks = []
            for dpath in pos_deletes:
                dt = pq.read_table(dpath, columns=["file_path", "pos"])
                fp = dt.column("file_path")
                m = pc.or_(pc.equal(fp, norm), pc.equal(fp, "file://" + norm))
                hit = dt.filter(pc.fill_null(m, False)).column("pos")
                drop_chunks.extend(hit.cast(pa.int64()).chunks)
            if drop_chunks:
                drop = pa.concat_arrays(drop_chunks)
                if len(drop):
                    idx = pa.array(range(n), type=pa.int64())
                    keep = pc.invert(pc.is_in(idx, value_set=drop))
        if eq_deletes:
            name2fid = dict(self.proj_fields)
            for dpath, cols in eq_deletes:
                # delete files are projected the same way as data files:
                # by field id when present (a rename after the delete was
                # written changes the column NAME, never the id), by name
                # for legacy files
                dfull = pq.read_table(dpath)
                dids = self._file_field_ids(dfull.schema)
                sel = []
                for c in cols:
                    if dids and name2fid.get(c) in dids:
                        sel.append(dfull.column(dids[name2fid[c]]))
                    elif c in dfull.column_names:
                        sel.append(dfull.column(c))
                    else:
                        raise ValueError(
                            f"equality-delete column {c!r} absent from {dpath}"
                        )
                dt = pa.table(sel, names=list(cols))
                if dt.num_rows == 0:
                    continue
                match = pc.is_in(
                    self._encode_keys(table, cols),
                    value_set=self._encode_keys(dt, cols),
                )
                inv = pc.invert(pc.fill_null(match, False))
                keep = inv if keep is None else pc.and_(keep, inv)
        if keep is not None:
            table = table.filter(keep)
        # _project already normalized every file to ONE nullable,
        # metadata-free target schema — required: batches of every file
        # in a task bin must share one arrow schema or the arrow writer
        # back to Spark rejects them
        yield from table.to_batches(max_chunksize=65536)


def _main_ancestors(meta: dict, head_id: int | None = None) -> list[dict]:
    """The parent-snapshot-id ancestry chain ending at ``head_id``
    (default: the table's current/main snapshot), oldest first —
    Iceberg's ``SnapshotUtil.currentAncestors``. Branch-only snapshots
    (WAP branch writes, cherry-pick sources) live in
    ``meta['snapshots']`` with their own sequence numbers but are NOT
    on this chain, so incremental and streaming reads of main must
    traverse it rather than filter all snapshots by sequence range —
    otherwise unpublished branch rows leak and a cherry-picked
    snapshot's files are delivered twice (r8 advice, high)."""
    by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    # Fallback for metadata whose snapshots predate parent-snapshot-id
    # stamping (tables this engine wrote before r9): snapshot-log is the
    # main-head history, so the entry PRECEDING a snapshot's FIRST
    # appearance is its effective parent. First occurrence, not latest:
    # a rollback re-appends an old snapshot-id to the log, and
    # latest-occurrence-wins would hand that entry the rolled-back head
    # as its "parent", leaking rolled-back snapshot files into
    # ancestor-based reads (r10 advice). The first occurrence is where
    # the snapshot was actually committed, so its predecessor there is
    # the true lineage. Branch-only snapshots never enter snapshot-log,
    # so the fallback cannot leak branch rows; it only extends the
    # chain where an explicit pointer is absent.
    log_prev: dict = {}
    prev_id = None
    for e in meta.get("snapshot-log", []):
        sid = e.get("snapshot-id")
        if sid is not None:
            if sid not in log_prev:
                log_prev[sid] = prev_id  # first occurrence wins
            prev_id = sid
    walk = head_id
    if walk is None:
        walk = meta.get("current-snapshot-id")
    chain: list[dict] = []
    seen: set = set()
    while walk is not None and walk in by_id:
        if walk in seen:  # corrupt metadata must not hang the reader
            raise ValueError(
                f"snapshot ancestry cycle at snapshot-id {walk}"
            )
        seen.add(walk)
        snap = by_id[walk]
        chain.append(snap)
        parent = snap.get("parent-snapshot-id")
        if parent is None:
            parent = log_prev.get(walk)
        walk = parent
    chain.reverse()
    return chain


def _appended_data_files(
    path: str,
    start_seq: int,
    end_seq: int,
    *,
    strict: bool = False,
    skip_overwrite: bool = False,
    skip_delete: bool = False,
    end_snapshot_id: int | None = None,
) -> list[tuple[str, int]]:
    """(path, size) of data files ADDED by main-branch-ancestor
    snapshots with sequence number in (start_seq, end_seq]. Traversal
    is ``SnapshotUtil.ancestorsBetween``-style: parent-snapshot-id
    ancestry from ``end_snapshot_id`` (default the current main head)
    down, NOT a sequence-number filter over all snapshots — branch-only
    snapshots share the table's sequence space. ``replace`` snapshots
    (compaction) rearrange existing rows and are always skipped.
    overwrite/delete snapshots: with ``strict`` (the batch incremental
    scan) they always raise — an incremental APPEND scan over them
    would be wrong; otherwise the streaming skip options decide."""
    from daft_spark.io.avro import read_ocf
    from daft_spark.io.iceberg import _latest_metadata, _to_local

    meta = _latest_metadata(path)
    out: list[tuple[str, int]] = []
    for snap in _main_ancestors(meta, end_snapshot_id):
        seq = snap.get("sequence-number", 0)
        if not (start_seq < seq <= end_seq):
            continue
        op = (snap.get("summary") or {}).get("operation", "append")
        if op == "replace":
            continue  # compaction rearranges existing rows
        if op == "overwrite":
            if strict or not skip_overwrite:
                raise RuntimeError(
                    f"Iceberg snapshot {snap['snapshot-id']} overwrites data; "
                    + (
                        "an incremental append scan cannot cross it"
                        if strict
                        else "streaming past it needs "
                        "streaming-skip-overwrite-snapshots=true"
                    )
                )
            continue  # the option skips the whole snapshot
        if op == "delete":
            if strict or not skip_delete:
                raise RuntimeError(
                    f"Iceberg snapshot {snap['snapshot-id']} deletes rows; "
                    + (
                        "an incremental append scan cannot cross it"
                        if strict
                        else "streaming past it needs "
                        "streaming-skip-delete-snapshots=true"
                    )
                )
            continue
        sid = snap["snapshot-id"]
        _, _, manifests = read_ocf(_to_local(snap["manifest-list"], path))
        for m in manifests:
            if m.get("content", 0) != 0 or m.get("added_snapshot_id") != sid:
                continue
            _, _, entries = read_ocf(_to_local(m["manifest_path"], path))
            for e in entries:
                f = e["data_file"]
                if e["status"] == 1 and f.get("content", 0) == 0:
                    out.append(
                        (
                            _to_local(f["file_path"], path),
                            int(f.get("file_size_in_bytes") or 0),
                        )
                    )
    return out


class IcebergStreamReader(DataSourceStreamReader):
    """Streaming Iceberg source (``spark.readStream.format(
    "daft_iceberg")``), following the Iceberg Spark connector's
    streaming semantics: offset = the table's last sequence number,
    the FIRST batch is the table's current snapshot (live files with
    merge-on-read deletes applied — delegated to the batch reader's
    planner), later batches contain only the files ADDED by each
    append snapshot. ``replace`` snapshots (compaction) are data
    rearrangements and are skipped; ``overwrite``/``delete`` snapshots
    fail the stream unless ``streaming-skip-overwrite-snapshots`` /
    ``streaming-skip-delete-snapshots`` is set — the same knobs the
    real connector exposes. Executor-side reads reuse the batch
    reader's field-id projection path, so schema evolution mid-stream
    resolves renamed columns by id."""

    def __init__(self, options, schema):
        self.path = options["path"]
        self.skip_overwrite = (
            str(options.get("streaming-skip-overwrite-snapshots", "")).lower() == "true"
        )
        self.skip_delete = (
            str(options.get("streaming-skip-delete-snapshots", "")).lower() == "true"
        )
        # the executor-side delegate: only partition.value + the pinned
        # projection fields travel; per-batch planning stays driver-side
        self._batch = IcebergReader({"path": self.path}, schema)

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"seq": -1}

    def latestOffset(self) -> dict:
        from daft_spark.io.iceberg import _latest_metadata

        return {"seq": _latest_metadata(self.path).get("last-sequence-number", 0)}

    def commit(self, end: dict) -> None:
        pass

    # -- planning ----------------------------------------------------------
    def _appended_files(self, start: int, end: int) -> list[tuple[str, int]]:
        """(path, size) of data files ADDED by snapshots with sequence
        number in (start, end], honoring the skip/fail options."""
        return _appended_data_files(
            self.path,
            start,
            end,
            skip_overwrite=self.skip_overwrite,
            skip_delete=self.skip_delete,
        )

    def partitions(self, start: dict, end: dict):
        from daft_spark.io.iceberg import _latest_metadata, current_snapshot

        sv, ev = int(start["seq"]), int(end["seq"])
        if ev <= sv:
            return [InputPartition(([], [], []))]
        if sv < 0:
            # snapshot batch: the MAIN-branch state at sequence ev —
            # delegate to the batch planner pinned to that snapshot
            # (deletes applied). Only main ancestors qualify: a branch
            # write can hold the table-wide max sequence number without
            # being published (r8 advice).
            meta = _latest_metadata(self.path)
            snap = None
            for s in _main_ancestors(meta):
                if s.get("sequence-number", 0) <= ev and (
                    snap is None
                    or s.get("sequence-number", 0) > snap.get("sequence-number", 0)
                ):
                    snap = s
            if snap is None:
                return [InputPartition(([], [], []))]
            planner = IcebergReader(
                {"path": self.path, "snapshot_id": str(snap["snapshot-id"])}, None
            )
            return list(planner.partitions())
        files = self._appended_files(sv, ev)
        target = 128 * 1024 * 1024
        parts: list[InputPartition] = []
        bin_files: list[str] = []
        bin_bytes = 0
        for p, size in sorted(files):
            if bin_files and bin_bytes + size > target:
                parts.append(InputPartition((bin_files, [], [])))
                bin_files, bin_bytes = [], 0
            bin_files.append(p)
            bin_bytes += size
        if bin_files:
            parts.append(InputPartition((bin_files, [], [])))
        return parts or [InputPartition(([], [], []))]

    # -- execution ----------------------------------------------------------
    def read(self, partition: InputPartition):
        yield from self._batch.read(partition)
