"""SQL-database read/write over stdlib ``sqlite3`` — a real, testable
database path with no JDBC driver or SQLAlchemy required.

Parity target: the reference's ``daft.read_sql`` / ``write_sql``
(reference ``daft/io/_sql.py:26``, ``daft/dataframe/dataframe.py:911``)
support any SQLAlchemy/ConnectorX URL; Spark's JDBC source plays that
role here (io/readers.py read_sql), but this container carries no JDBC
driver JARs, so ``sqlite://`` URLs take this pure-Python route:

- ``read_sqlite(query_or_table, db_path, ...)``: the driver probes the
  result schema from a bounded sample, then a ``mapInPandas`` stage
  opens the database ON THE EXECUTORS and reads one
  ``partition_col`` range per task — the same bounds-partitioned
  parallel read Spark's JDBC source does (each task sees only its
  slice; nothing is funneled through the driver). Without a
  partition column the read is a single task (the JDBC source has the
  identical restriction).
- ``write_sqlite(df, table, db_path, mode)``: partitions are collected
  and inserted through one driver connection — SQLite is single-writer
  by design (database-level write lock), so a distributed INSERT fan-in
  would serialize on the lock anyway.

At 100 TB the partitioned read pattern is the part that matters (it is
exactly how a fleet reads a sharded Postgres/MySQL through JDBC); the
sqlite backend is the in-container proof of the plumbing.
"""

from __future__ import annotations

import os
import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _as_query(query_or_table: str) -> str:
    q = query_or_table.strip()
    return q if q.lower().startswith("select") else f"SELECT * FROM {q}"


def db_path_from_url(url: str) -> str | None:
    """sqlite:///absolute/path.db -> /absolute/path.db (None for other
    schemes)."""
    for prefix in ("sqlite:///", "sqlite://"):
        if url.startswith(prefix):
            return "/" + url[len(prefix) :].lstrip("/")
    return None


def read_sqlite(
    query_or_table: str,
    db_path: str,
    spark: SparkSession,
    partition_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounds-partitioned parallel read of a sqlite database."""
    if not os.path.exists(db_path):
        raise FileNotFoundError(f"sqlite database not found: {db_path}")
    q = _as_query(query_or_table)

    with sqlite3.connect(db_path) as con:
        sample = pd.read_sql_query(f"SELECT * FROM ({q}) LIMIT 100", con)
        if sample.empty:
            raise ValueError(f"query returned no rows to infer a schema from: {q}")
        schema = spark.createDataFrame(sample).schema
        if partition_col is not None:
            lo, hi = con.execute(
                f"SELECT MIN({partition_col}), MAX({partition_col}) FROM ({q})"
            ).fetchone()
        else:
            lo = hi = 0

    n = max(1, num_partitions or 1) if partition_col is not None else 1
    # split [lo, hi] into n half-open ranges (last one inclusive)
    span = (hi - lo) / n if n else 1
    bounds = [(lo + i * span, lo + (i + 1) * span, i == n - 1) for i in range(n)]
    ranges = spark.createDataFrame(bounds, "lo double, hi double, last boolean").repartition(n)

    def fetch(batches):
        con = sqlite3.connect(db_path)
        try:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    if partition_col is None:
                        out = pd.read_sql_query(q, con)
                    else:
                        op = "<=" if row.last else "<"
                        out = pd.read_sql_query(
                            f"SELECT * FROM ({q}) WHERE {partition_col} >= ? "
                            f"AND {partition_col} {op} ?",
                            con,
                            params=(row.lo, row.hi),
                        )
                    if len(out):
                        yield out
        finally:
            con.close()

    return ranges.mapInPandas(fetch, schema)


def _sqlite_affinity(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)):
        return "INTEGER"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "REAL"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    return "TEXT"


def write_sqlite(df: DataFrame, table: str, db_path: str, mode: str = "append") -> None:
    """Write ``df`` into a sqlite table EXECUTOR-SIDE: the driver only
    handles DDL/modes; each partition inserts through its own
    connection via foreachPartition, retrying on SQLITE_BUSY (sqlite
    holds a database-level write lock, so concurrent partitions
    serialize on it — the retry loop with a generous busy timeout keeps
    them making progress instead of failing). Rows never gather on the
    driver, so the pattern matches what a JDBC URL gets from Spark's
    parallel JDBC writer; sqlite's single-writer lock is why the
    partitions append rather than truly parallelize."""
    import datetime
    import decimal
    import random
    import time as _time

    if mode not in ("append", "overwrite", "error", "ignore"):
        raise ValueError(f"unsupported mode {mode!r}")
    os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
    con = sqlite3.connect(db_path)
    try:
        exists = bool(
            con.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (table,)
            ).fetchone()
        )
        if exists and mode == "error":
            raise FileExistsError(f"table {table!r} already exists in {db_path}")
        if exists and mode == "ignore":
            return
        if exists and mode == "overwrite":
            con.execute(f'DROP TABLE "{table}"')
        cols = ", ".join(
            f'"{f.name}" {_sqlite_affinity(f.dataType)}' for f in df.schema.fields
        )
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})')
        con.commit()
    finally:
        con.close()

    names = [f.name for f in df.schema.fields]
    insert = 'INSERT INTO "{}" ({}) VALUES ({})'.format(
        table, ", ".join(f'"{n}"' for n in names), ", ".join("?" * len(names))
    )

    def _adapt(v):
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, bytearray):
            return bytes(v)
        if isinstance(v, (list, dict)):
            import json as _json

            return _json.dumps(v)
        return v

    def _write_partition(rows):
        batch = [tuple(_adapt(v) for v in r) for r in rows]
        if not batch:
            return
        for attempt in range(12):
            try:
                c = sqlite3.connect(db_path, timeout=30.0)
                try:
                    c.execute("PRAGMA busy_timeout = 30000")
                    c.executemany(insert, batch)
                    c.commit()
                    return
                finally:
                    c.close()
            except sqlite3.OperationalError as e:
                if "locked" not in str(e).lower() and "busy" not in str(e).lower():
                    raise
                _time.sleep(0.05 * (2**min(attempt, 6)) * (0.5 + random.random()))
        raise sqlite3.OperationalError(
            f"sqlite at {db_path} stayed locked across retries"
        )

    df.foreachPartition(_write_partition)
