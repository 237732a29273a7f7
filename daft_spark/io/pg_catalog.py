"""Postgres catalog over a DB-API connection — the reference's
``Catalog.from_postgres`` SQL surface without psycopg.

The reference adapter (``daft/catalog/__postgres.py:176``) is a catalog
whose every operation composes and issues Postgres SQL over a psycopg
connection:

- namespaces      -> ``CREATE SCHEMA "x"`` / ``DROP SCHEMA "x"`` and
  ``SELECT exists(... information_schema.schemata ...)``
- tables          -> ``CREATE TABLE "s"."t" (cols)`` / ``DROP TABLE`` and
  information_schema.tables existence/listing (reference :380-446)
- table schema    -> information_schema.columns walk (reference :487)
- reads           -> ``SELECT * FROM "s"."t"`` through read_sql
- append          -> sequential row writes ("This writes results
  sequentially on a single node", reference :663)

psycopg is absent from this container, so this module keeps the exact
statement surface but executes it over a user-supplied zero-argument
DB-API connection factory. The in-container proof is DuckDB, whose SQL
front end accepts every statement above verbatim (CREATE SCHEMA,
quoted identifiers, information_schema.schemata/tables/columns) — the
same statements run unchanged against a real Postgres through any
DB-API driver. Identifier quoting doubles embedded quotes; string
literals double ``'`` (what ``psycopg.sql.Identifier/Literal`` render).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from daft_spark.session import Catalog, Identifier, NotFoundError, Table, _ident

# ---------------------------------------------------------------------------
# SQL composition (psycopg.sql.Identifier / Literal equivalents)


def _qident(name: str) -> str:
    return '"' + str(name).replace('"', '""') + '"'


def _qlit(value: str) -> str:
    return "'" + str(value).replace("'", "''") + "'"


# Spark simpleString -> Postgres column type
# (reference _daft_dtype_to_postgres_type, daft/catalog/__postgres.py:66:
# int8/16 -> smallint, int32 -> integer, int64 -> bigint, float32 ->
# real, float64 -> double precision, string -> text, binary -> bytea,
# nested types -> text holding JSON)
_PG_TYPES = {
    "tinyint": "smallint",
    "smallint": "smallint",
    "int": "integer",
    "bigint": "bigint",
    "float": "real",
    "double": "double precision",
    "string": "text",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "bytea",
}

# Postgres/DuckDB information_schema data_type -> Spark type
_SPARK_TYPES = {
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "tinyint": T.ByteType(),
    "integer": T.IntegerType(),
    "int4": T.IntegerType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "float": T.FloatType(),
    "double precision": T.DoubleType(),
    "double": T.DoubleType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "bytea": T.BinaryType(),
    "blob": T.BinaryType(),
}


def _pg_type_for(dt: T.DataType) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return s.replace("decimal", "numeric")
    # reference maps unhandled nested types to text (JSON), :66 family
    return _PG_TYPES.get(s, "text")


def _spark_type_for(pg: str) -> T.DataType:
    s = pg.strip().lower()
    if s.startswith(("numeric", "decimal")):
        inner = s[s.index("(") + 1 : s.index(")")] if "(" in s else "10,0"
        p, _, sc = inner.partition(",")
        return T.DecimalType(int(p), int(sc or 0))
    if "(" in s:  # varchar(n), char(n)
        s = s[: s.index("(")]
    return _SPARK_TYPES.get(s.strip(), T.StringType())


def _split_table_ident(identifier) -> tuple[str | None, str]:
    parts = list(_ident(identifier))
    if len(parts) == 1:
        # no schema -> Postgres resolves via search_path (reference :385)
        return None, parts[0]
    if len(parts) == 2:
        return parts[0], parts[1]
    raise ValueError(
        f"PostgreSQL table identifier must be 'schema.table' or 'table', "
        f"got {identifier}"
    )


def _full_name(schema: str | None, table: str) -> str:
    return f"{_qident(schema)}.{_qident(table)}" if schema else _qident(table)


class DbapiPostgresCatalog(Catalog):
    """The reference PostgresCatalog's statement surface over a DB-API
    connection factory. A fresh connection is opened per operation, the
    reference's own connection discipline (``postgres_connection``
    context manager per call)."""

    def __init__(self, connect, name: str = "postgres", paramstyle: str = "qmark"):
        if not callable(connect):
            raise TypeError("connect must be a zero-argument connection factory")
        if paramstyle not in ("qmark", "format"):
            raise ValueError("paramstyle must be 'qmark' (?) or 'format' (%s)")
        self.name = name
        self._connect = connect
        self._paramstyle = paramstyle

    # -- plumbing ----------------------------------------------------------
    def _execute(self, *statements: str, fetch: bool = False):
        conn = self._connect()
        try:
            cur = conn.cursor()
            out = None
            for sql in statements:
                cur.execute(sql)
            if fetch:
                out = cur.fetchall()
            if hasattr(conn, "commit"):
                conn.commit()
            return out
        finally:
            conn.close()

    # -- namespaces --------------------------------------------------------
    def create_namespace(self, identifier) -> None:
        parts = list(_ident(identifier))
        if len(parts) != 1:
            raise ValueError(
                f"PostgreSQL schema identifier must be a single schema name, "
                f"got {identifier}"
            )
        if self.has_namespace(identifier):
            # reference maps psycopg.errors.DuplicateSchema -> ValueError (:224)
            raise ValueError(f"Schema {identifier} already exists")
        self._execute(f"CREATE SCHEMA {_qident(parts[0])}")

    def drop_namespace(self, identifier) -> None:
        parts = list(_ident(identifier))
        if len(parts) != 1:
            raise ValueError(
                f"PostgreSQL namespace identifier must be a single schema name, "
                f"got {identifier}"
            )
        try:
            self._execute(f"DROP SCHEMA {_qident(parts[0])}")
        except Exception as e:
            # the reference wraps psycopg errors in ValueError
            # (__postgres.py:305-316) so callers never see
            # backend-specific exception types (e.g. a duckdb
            # CatalogException for a missing or non-empty schema)
            raise ValueError(
                f"Failed to drop schema {parts[0]!r}: {e}"
            ) from e

    def has_namespace(self, identifier) -> bool:
        parts = list(_ident(identifier))
        if len(parts) != 1:
            raise ValueError(
                f"PostgreSQL schema identifier must be a single schema name, "
                f"got {identifier}"
            )
        rows = self._execute(
            "SELECT exists(SELECT 1 FROM information_schema.schemata "
            f"WHERE schema_name = {_qlit(parts[0])})",
            fetch=True,
        )
        return bool(rows and rows[0][0])

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        if pattern:
            rows = self._execute(
                "SELECT schema_name FROM information_schema.schemata "
                f"WHERE schema_name LIKE {_qlit(pattern + '%')} ORDER BY schema_name",
                fetch=True,
            )
        else:
            rows = self._execute(
                "SELECT schema_name FROM information_schema.schemata", fetch=True
            )
        # DuckDB's information_schema.schemata repeats schemas once per
        # attached catalog (memory/system/temp); Postgres lists each
        # once. Keep the reference's statement, dedupe the result.
        seen: list[str] = []
        for r in rows or []:
            if r[0] not in seen:
                seen.append(r[0])
        return [Identifier(s) for s in seen]

    # -- tables ------------------------------------------------------------
    def create_table(self, identifier, source, **properties) -> Table:
        """CREATE TABLE from a DataFrame's schema, then append its rows
        (the reference takes a Schema and creates empty; this engine's
        create-from-DataFrame convention matches the other catalogs).
        The reference also enables row-level security by default
        (:287); RLS is issued only against backends that accept it —
        DuckDB's front end has no RLS statement."""
        from daft_spark.dataframe import DataFrame as WrappedDF

        if isinstance(source, WrappedDF):
            source = source.to_spark()
        if not isinstance(source, DataFrame):
            raise TypeError(f"cannot create a Postgres table from {type(source)}")
        schema_name, table_name = _split_table_ident(identifier)
        if self.has_table(identifier):
            raise ValueError(f"Table {identifier} already exists")
        cols = ", ".join(
            f"{_qident(f.name)} {_pg_type_for(f.dataType)}"
            for f in source.schema.fields
        )
        stmts = []
        if schema_name:
            stmts.append(f"CREATE SCHEMA IF NOT EXISTS {_qident(schema_name)}")
        stmts.append(f"CREATE TABLE {_full_name(schema_name, table_name)} ({cols})")
        self._execute(*stmts)
        if properties.get("enable_rls", False):
            self._execute(
                f"ALTER TABLE {_full_name(schema_name, table_name)} "
                "ENABLE ROW LEVEL SECURITY"
            )
        tbl = self.get_table(identifier)
        tbl.write(source, "append")
        return tbl

    def drop_table(self, identifier) -> None:
        schema_name, table_name = _split_table_ident(identifier)
        if not self.has_table(identifier):
            # reference maps UndefinedTable -> NotFoundError (:343)
            raise NotFoundError(f"Table {identifier} not found")
        self._execute(f"DROP TABLE {_full_name(schema_name, table_name)}")

    def has_table(self, identifier) -> bool:
        try:
            schema_name, table_name = _split_table_ident(identifier)
        except ValueError:
            return False
        where = f"table_name = {_qlit(table_name)}"
        if schema_name:
            where = f"table_schema = {_qlit(schema_name)} AND " + where
        rows = self._execute(
            f"SELECT exists(SELECT 1 FROM information_schema.tables WHERE {where})",
            fetch=True,
        )
        return bool(rows and rows[0][0])

    def list_tables(self, pattern: str | None = None) -> list[str]:
        if pattern:
            rows = self._execute(
                "SELECT table_schema, table_name FROM information_schema.tables "
                f"WHERE table_name LIKE {_qlit(pattern + '%')} "
                "ORDER BY table_schema, table_name",
                fetch=True,
            )
        else:
            rows = self._execute(
                "SELECT table_schema, table_name FROM information_schema.tables "
                "ORDER BY table_schema, table_name",
                fetch=True,
            )
        seen: list[str] = []
        for r in rows or []:
            full = f"{r[0]}.{r[1]}"
            if full not in seen:
                seen.append(full)
        return seen

    def get_table(self, identifier) -> Table:
        if not self.has_table(identifier):
            raise NotFoundError(f"Table {identifier} not found")
        schema_name, table_name = _split_table_ident(identifier)
        return _pg_table(self, schema_name, table_name)

    # -- schema ------------------------------------------------------------
    def table_schema(self, identifier) -> T.StructType:
        """information_schema.columns walk (reference PostgresTable
        .schema, :487 — there joined against pg_attribute for pgvector
        dimensions; vector columns need the pgvector extension)."""
        schema_name, table_name = _split_table_ident(identifier)
        if schema_name is None:
            # Resolve the effective schema FIRST: filtering
            # information_schema.columns on table_name alone would
            # interleave rows from same-named tables in different
            # schemas into one wrong StructType. Prefer 'public' (the
            # default search_path head), else the first schema owning
            # the table.
            srows = self._execute(
                "SELECT table_schema FROM information_schema.tables "
                f"WHERE table_name = {_qlit(table_name)} "
                "ORDER BY (table_schema <> 'public'), table_schema",
                fetch=True,
            )
            if not srows:
                raise NotFoundError(f"Table {identifier} not found")
            schema_name = srows[0][0]
        where = (
            f"table_schema = {_qlit(schema_name)} AND "
            f"table_name = {_qlit(table_name)}"
        )
        rows = self._execute(
            "SELECT column_name, data_type, is_nullable "
            f"FROM information_schema.columns WHERE {where} ORDER BY ordinal_position",
            fetch=True,
        )
        if not rows:
            raise NotFoundError(f"Table {identifier} not found")
        return T.StructType(
            [
                T.StructField(name, _spark_type_for(dt), str(nullable).upper() != "NO")
                for name, dt, nullable in rows
            ]
        )


def _pg_table(cat: DbapiPostgresCatalog, schema_name: str | None,
              table_name: str) -> Table:
    """Table handle issuing the reference PostgresTable's statements
    over the catalog's connection factory."""
    full = _full_name(schema_name, table_name)
    ident = f"{schema_name}.{table_name}" if schema_name else table_name
    connect = cat._connect
    paramstyle = cat._paramstyle

    def _read() -> DataFrame:
        from daft_spark.context import get_or_create

        spark = SparkSession.getActiveSession() or get_or_create()
        struct = cat.table_schema(ident)
        sql = f"SELECT * FROM {full}"  # reference read(), :624

        def fetch_partition(_iter):
            conn = connect()
            try:
                curs = conn.cursor()
                curs.execute(sql)
                while True:
                    rows = curs.fetchmany(10_000)
                    if not rows:
                        break
                    for r in rows:
                        yield tuple(r)
            finally:
                conn.close()

        # the SELECT runs in ONE executor task (an un-partitioned DB
        # read has a single cursor; the reference's read_sql does the
        # same absent partition_col). rdd->createDataFrame keeps the
        # fetch off the driver.
        one = spark.sparkContext.parallelize([0], 1)
        return spark.createDataFrame(one.mapPartitions(fetch_partition), struct)

    def _write(df: DataFrame, mode: str) -> None:
        if mode == "overwrite":
            # reference overwrite(): drop + recreate + append (:692)
            cat._execute(f"DROP TABLE {full}")
            cols = ", ".join(
                f"{_qident(f.name)} {_pg_type_for(f.dataType)}"
                for f in df.schema.fields
            )
            cat._execute(f"CREATE TABLE {full} ({cols})")
        elif mode != "append":
            raise ValueError(f"unsupported mode {mode!r}")
        names = [f.name for f in df.schema.fields]
        ph = "?" if paramstyle == "qmark" else "%s"
        insert = (
            f"INSERT INTO {full} ({', '.join(_qident(n) for n in names)}) "
            f"VALUES ({', '.join([ph] * len(names))})"
        )

        def write_partition(rows):
            batch = [tuple(r[n] for n in names) for r in rows]
            if not batch:
                return
            conn = connect()
            try:
                conn.cursor().executemany(insert, batch)
                if hasattr(conn, "commit"):
                    conn.commit()
            finally:
                conn.close()

        # single writer connection — the reference's append is likewise
        # sequential ("writes results sequentially on a single node",
        # :663); coalesce(1) keeps it one executor task, not a collect.
        df.coalesce(1).foreachPartition(write_partition)

    return Table(ident, _read, _write)
