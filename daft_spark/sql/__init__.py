"""SQL entry points — parity with ``daft.sql`` / ``daft.sql_expr``
(reference: ``daft/sql/sql.py:77``, ``:19``) and the Session catalog
surface (reference: ``daft/session.py:86``).

Spark SQL is a strict superset of the reference dialect (SURVEY §2.7),
so this is a thin veneer: register DataFrames as temp views, delegate to
``spark.sql``.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.context import get_or_create

# SQL table functions (reference: src/daft-sql/src/table_provider/,
# tests/sql/test_sql_table_functions.py): FROM read_parquet('...') etc.
# Spark SQL has no Python-extensible table functions over files, so the
# veneer rewrites each call into an auto-registered temp view backed by
# daft_spark's readers (which also apply the TIMESTAMP(NANOS) repair and
# handle globs/lists natively).
_TABLE_FN = re.compile(
    r"\bread_(parquet|csv|json|text)\s*\(\s*'([^']+)'\s*\)", re.IGNORECASE
)


def _sql_segments(query: str):
    """Split SQL into (text, is_code) segments: string literals
    ('' escaping), double-quoted identifiers ("" escaping), -- line
    comments and /* */ block comments are non-code and never rewritten."""
    out, i, n, start = [], 0, len(query), 0

    def flush_code(end):
        if end > start:
            out.append((query[start:end], True))

    while i < n:
        two = query[i : i + 2]
        if query[i] in ("'", '"'):
            q = query[i]
            flush_code(i)
            j = i + 1
            while j < n:
                if query[j] == q:
                    if j + 1 < n and query[j + 1] == q:  # doubled-quote escape
                        j += 2
                        continue
                    break
                j += 1
            j = min(j + 1, n)
            out.append((query[i:j], False))
            i = start = j
        elif two == "--":
            flush_code(i)
            j = query.find("\n", i)
            j = n if j == -1 else j + 1
            out.append((query[i:j], False))
            i = start = j
        elif two == "/*":
            flush_code(i)
            j = query.find("*/", i + 2)
            j = n if j == -1 else j + 2
            out.append((query[i:j], False))
            i = start = j
        else:
            i += 1
    flush_code(n)
    return out


def _expand_table_functions(query: str, spark: SparkSession) -> str:
    from daft_spark.io import readers

    fns = {
        "parquet": readers.read_parquet,
        "csv": readers.read_csv,
        "json": readers.read_json,
        "text": readers.read_text,
    }

    # Two passes so a query that will not rewrite cleanly registers no
    # views: collect (fmt, path) first, create views only when the whole
    # scan succeeded.
    pending: list[tuple[str, str]] = []

    def repl(m: re.Match) -> str:
        fmt, path = m.group(1).lower(), m.group(2)
        pending.append((fmt, path))
        digest = hashlib.md5(f"{fmt}|{path}".encode()).hexdigest()[:12]
        return f"__daft_tf_{fmt}_{digest}"

    # A read_xxx('...') call site spans the quote boundary (its path is a
    # string literal), so rewrite on code+literal PAIRS: only match where
    # the segment walker says the "read_parquet(" prefix is real code —
    # matches living entirely inside literals/comments are skipped.
    pieces = []
    segs = _sql_segments(query)
    k = 0
    while k < len(segs):
        text, is_code = segs[k]
        if not is_code:
            pieces.append(text)
            k += 1
            continue
        # merge this code segment with an immediately following string
        # literal (+closing code) so the regex can see the full call
        merged = text
        consumed = 0
        while (
            k + consumed + 1 < len(segs)
            and segs[k + consumed + 1][0].startswith("'")
            and re.search(r"\bread_(parquet|csv|json|text)\s*\(\s*$", merged, re.IGNORECASE)
        ):
            merged += segs[k + consumed + 1][0]
            consumed += 1
            if k + consumed + 1 < len(segs) and segs[k + consumed + 1][1]:
                merged += segs[k + consumed + 1][0]
                consumed += 1
        pieces.append(_TABLE_FN.sub(repl, merged))
        k += consumed + 1
    for fmt, path in pending:
        digest = hashlib.md5(f"{fmt}|{path}".encode()).hexdigest()[:12]
        fns[fmt](path, spark=spark).createOrReplaceTempView(f"__daft_tf_{fmt}_{digest}")
    return "".join(pieces)


def sql(query: str, spark: SparkSession | None = None, **frames) -> DataFrame:
    """Run SQL. Keyword args register DataFrames as temp views first:
    ``sql("SELECT * FROM t WHERE x > 1", t=my_df)``. Table functions
    ``read_parquet/read_csv/read_json/read_text('<path-or-glob>')`` are
    supported in FROM position (reference daft.sql table providers)."""
    spark = spark or get_or_create()
    from daft_spark.dataframe import DataFrame as WrappedDF

    for name, df in frames.items():
        sdf = df.to_spark() if isinstance(df, WrappedDF) else df
        sdf.createOrReplaceTempView(name)
    return spark.sql(_expand_table_functions(query, spark))


def sql_expr(expression: str) -> Column:
    """Parse a scalar SQL expression to a Column (reference sql_expr)."""
    return F.expr(expression)


# The full Session/Catalog surface lives in daft_spark.session
# (reference daft/session.py:86); re-exported here because the SQL
# veneer and the session surface ship together in the reference too.
from daft_spark.session import (  # noqa: E402
    Catalog,
    Identifier,
    NotFoundError,
    Session,
    Table,
    session,
)

__all__ = [
    "Catalog",
    "Identifier",
    "NotFoundError",
    "Session",
    "Table",
    "session",
    "sql",
    "sql_expr",
]
