"""Specialty push sinks (reference dataframe.py:2499-2630): the
Spark-side plumbing — per-partition sink lifecycle, bounded batching,
id/vector renames, column-family mapping, JSON fallback — exercised
through a file-backed fake client; the real client imports are gated
with clean ImportErrors (the packages are absent in this container)."""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _factory(out_dir):
    """File-backed fake sink factory. The class is defined INSIDE the
    closure so cloudpickle ships it by value — test modules are not
    importable on executor python workers. Every write_batch appends
    one JSON file; close writes a marker — the driver asserts batch
    sizes and lifecycle from the shared filesystem (local mode)."""

    def make():
        import json as _json
        import os as _os
        import uuid as _uuid

        def norm(o):
            if isinstance(o, tuple):
                return [norm(x) for x in o]
            if isinstance(o, dict):
                return {str(k): norm(v) for k, v in o.items()}
            return o

        class FileSink:
            def __init__(self, out_dir):
                self.out_dir = out_dir
                _os.makedirs(out_dir, exist_ok=True)

            def write_batch(self, batch):
                p = _os.path.join(self.out_dir, f"batch-{_uuid.uuid4().hex}.json")
                with open(p, "w") as f:
                    _json.dump([norm(b) for b in batch], f, default=str)

            def close(self):
                p = _os.path.join(self.out_dir, f"closed-{_uuid.uuid4().hex}")
                with open(p, "w"):
                    pass

        return FileSink(out_dir)

    return make


def _batches(out_dir):
    out = []
    for p in sorted(glob.glob(os.path.join(out_dir, "batch-*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


def test_write_turbopuffer_renames_and_batches(spark, tmp_path):
    from daft_spark.io.readers import load_table
    from daft_spark.io.writers import write_turbopuffer

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding", "label")
        .limit(50)
        .repartition(2)
    )
    out = str(tmp_path / "tpuf")
    write_turbopuffer(
        emb, "ns", id_column="vec_id", vector_column="embedding",
        batch_size=10, sink_factory=_factory(out),
    )
    batches = _batches(out)
    docs = [d for b in batches for d in b]
    assert len(docs) == 50
    assert all(set(d) == {"id", "vector", "label"} for d in docs)
    assert all(len(b) <= 10 for b in batches)
    # one close marker per non-empty partition
    assert len(glob.glob(os.path.join(out, "closed-*"))) >= 1


def test_write_turbopuffer_requires_id(spark, tmp_path):
    from daft_spark.io.readers import load_table
    from daft_spark.io.writers import write_turbopuffer

    emb = load_table(spark, SF_DIR, "embeddings").select("label").limit(5)
    with pytest.raises(Exception, match="id"):
        write_turbopuffer(emb, "ns", sink_factory=_factory(str(tmp_path / "x")))


def test_write_clickhouse_rows(spark, tmp_path):
    from daft_spark.io.readers import load_table
    from daft_spark.io.writers import write_clickhouse

    n = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    out = str(tmp_path / "ch")
    write_clickhouse(
        n, "nation", host="h", batch_size=7, sink_factory=_factory(out)
    )
    rows = [r for b in _batches(out) for r in b]
    assert len(rows) == 25
    assert all(len(r) == 2 for r in rows)


def test_write_bigtable_mutations_and_family_check(spark, tmp_path):
    from daft_spark.io.readers import load_table
    from daft_spark.io.writers import write_bigtable

    n = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = str(tmp_path / "bt")
    write_bigtable(
        n, "proj", "inst", "tbl", row_key_column="n_nationkey",
        column_family_mappings={"n_name": "f1", "n_regionkey": "f1"},
        batch_size=100, sink_factory=_factory(out),
    )
    muts = [m for b in _batches(out) for m in b]
    assert len(muts) == 25
    # non-string regionkey was JSON-serialized (serialize_incompatible_types)
    key, cells = muts[0]
    assert isinstance(cells, dict) or isinstance(cells, list)

    with pytest.raises(ValueError, match="column_family_mappings"):
        write_bigtable(
            n, "p", "i", "t", row_key_column="n_nationkey",
            column_family_mappings={"n_name": "f1"},
            sink_factory=_factory(str(tmp_path / "bt2")),
        )


def test_real_clients_gated_with_importerror(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.io.writers import (
        write_bigtable,
        write_clickhouse,
        write_turbopuffer,
    )

    n = load_table(spark, SF_DIR, "nation").limit(1)
    with pytest.raises(ImportError, match="turbopuffer"):
        write_turbopuffer(n.withColumn("id", F.col("n_nationkey")), "ns")
    with pytest.raises(ImportError, match="clickhouse"):
        write_clickhouse(n, "t", host="h")
    with pytest.raises(ImportError, match="bigtable"):
        write_bigtable(
            n.select("n_nationkey", "n_name"), "p", "i", "t",
            row_key_column="n_nationkey",
            column_family_mappings={"n_name": "f"},
        )
