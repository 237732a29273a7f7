"""Scale the driver's TPC-H-ish fixture up by integer factor K by
sharding: K copies of every table with all primary/foreign keys offset
by copy_index * keyspace, so each copy is an independent, join-
consistent shard (the standard way to scale a benchmark fixture without
changing per-key selectivities or value distributions).

region/nation are fixed dimensions and copied once. Dates, values and
text payloads are untouched, so filter selectivities (and therefore
plan shapes) match the source SF exactly; aggregates scale by K.

Usage:
    python tools/gen_sf.py /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> columns that live in that table's own keyspace, plus foreign
# keys into other tables' keyspaces (col -> keyspace owner table)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_suppkey": "supplier", "l_partkey": "part"},
    "events": {"event_id": "events", "user_id": "users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ["region", "nation"]


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")

    # keyspace sizes (max key + 1, per owning table)
    space: dict[str, int] = {}
    probes = {
        "customer": ("customer", "c_custkey"),
        "supplier": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "orders": ("orders", "o_orderkey"),
        "events": ("events", "event_id"),
        "users": ("events", "user_id"),
        "documents": ("documents", "doc_id"),
        "embeddings": ("embeddings", "vec_id"),
    }
    for owner, (tbl, col) in probes.items():
        path = os.path.join(src, f"{tbl}.parquet")
        if os.path.exists(path):
            space[owner] = (
                con.execute(f"SELECT max({col}) + 1 FROM read_parquet('{path}')").fetchone()[0]
            )

    for t in FIXED:
        p = os.path.join(src, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"COPY (SELECT * FROM read_parquet('{p}')) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            print(f"{t}: copied")

    for t, keycols in KEYED.items():
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()]
        # One output FILE per shard, under a directory named <t>.parquet:
        # a scaled table must also scale its file count — Spark's scan
        # parallelism is split-gated, and a single K*size file caps
        # CPU-bound stages at 1-2 tasks (real large tables are always
        # multi-file). Spark reads the directory natively; DuckDB reads
        # the glob '<t>.parquet/*.parquet'.
        out_dir = os.path.join(dst, f"{t}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(k):
            sel = ", ".join(
                f"{c} + {i} * {space[keycols[c]]} AS {c}" if c in keycols else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{p}')) "
                f"TO '{out_dir}/part-{i:04d}.parquet' (FORMAT PARQUET)"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/*.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows in {k} files")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    main(src, dst, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
