"""Session / catalog surface — parity with the reference's
``daft.session.Session`` (reference ``daft/session.py:86``, attach
surface ``:176-404``) and ``daft.catalog.Catalog`` (reference
``daft/catalog/__init__.py:80``), re-expressed on Spark's catalog
plumbing:

- temp tables/views -> Spark temp views (session-scoped, exactly the
  reference's create_temp_table lifetime contract)
- namespaces -> Spark databases (CREATE/DROP DATABASE)
- persistent tables -> saveAsTable / spark.catalog.createTable
- attached catalogs -> either a Spark-side catalog name (the
  spark_catalog / any configured V2 catalog — Glue, Unity, Iceberg REST
  etc. arrive HERE via spark.sql.catalog.<name> confs, which is the
  Spark-idiomatic analogue of the reference's from_glue/from_unity
  constructors) or an in-memory pydict catalog (Catalog.from_pydict).
- attached functions -> spark.udf.register

Identifiers follow the reference's dotted convention
``[catalog.][namespace.]table``; unqualified names resolve against the
current catalog + namespace, as in the reference's ``Session.use``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from daft_spark.context import get_or_create


class NotFoundError(Exception):
    """Raised when a catalog/table/namespace is not found (reference
    daft/catalog/__init__.py:76)."""


class Identifier(Sequence[str]):
    """Dotted identifier (reference daft/catalog/__init__.py:685)."""

    def __init__(self, *parts: str):
        if not parts:
            raise ValueError("Identifier requires at least one part")
        self._parts = tuple(str(p) for p in parts)

    @staticmethod
    def from_str(s: str) -> "Identifier":
        return Identifier(*s.split("."))

    def __getitem__(self, i):  # type: ignore[override]
        return self._parts[i]

    def __len__(self) -> int:
        return len(self._parts)

    def __eq__(self, other) -> bool:
        if isinstance(other, Identifier):
            return self._parts == other._parts
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self._parts)

    def __repr__(self) -> str:
        return ".".join(self._parts)


def _ident(x: Identifier | str) -> Identifier:
    return x if isinstance(x, Identifier) else Identifier.from_str(x)


class Table:
    """Handle to a readable/writable table (reference
    daft/catalog/__init__.py Table). ``read()`` returns the DataFrame;
    ``write(df, mode)`` appends/overwrites where the backing supports
    writes."""

    def __init__(self, name: str, read_fn: Callable[[], DataFrame],
                 write_fn: Callable[[DataFrame, str], None] | None = None):
        self.name = name
        self._read = read_fn
        self._write = write_fn

    @staticmethod
    def from_df(name: str, df: DataFrame) -> "Table":
        return Table(name, lambda: df)

    @staticmethod
    def from_iceberg(table) -> "Table":
        """reference Table.from_iceberg (daft/catalog/__init__.py:937).
        A filesystem table path (directory with metadata/) binds to the
        pure-Python Iceberg reader/writer; pyiceberg table objects need
        that package (absent here — its metadata location would feed
        the same reader)."""
        import os

        if isinstance(table, str) and os.path.isdir(os.path.join(table, "metadata")):
            return _iceberg_fs_table(os.path.basename(table.rstrip("/")), table)
        raise ImportError(
            "Table.from_iceberg accepts a filesystem Iceberg table path "
            "(directory containing metadata/); pyiceberg table objects "
            "require the 'pyiceberg' package"
        )

    @staticmethod
    def from_paimon(table) -> "Table":
        """reference Table.from_paimon (daft/catalog/__init__.py:968).
        A filesystem table path (directory with schema/) binds to the
        pure-Python Paimon reader/writer; pypaimon table objects need
        that package."""
        import os

        if isinstance(table, str) and os.path.isdir(os.path.join(table, "schema")):
            return _paimon_fs_table(os.path.basename(table.rstrip("/")), table)
        raise ImportError(
            "Table.from_paimon accepts a filesystem Paimon table path "
            "(directory containing schema/); pypaimon table objects "
            "require the 'pypaimon' package"
        )

    def read(self) -> DataFrame:
        return self._read()

    def to_df(self) -> DataFrame:
        return self._read()

    def write(self, df: DataFrame, mode: str = "append") -> None:
        if self._write is None:
            raise NotImplementedError(f"table {self.name!r} is read-only")
        self._write(df, mode)

    # schema evolution (backed tables only — set by _iceberg_fs_table)
    _evolve: Callable[..., None] | None = None

    def _evolve_or_raise(self, **kw) -> None:
        if self._evolve is None:
            raise NotImplementedError(
                f"table {self.name!r} does not support schema evolution"
            )
        self._evolve(**kw)

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only rename; data files resolve by field id."""
        self._evolve_or_raise(renames={old: new})

    def add_column(self, name: str, dtype: str) -> None:
        """Add an optional column (old files read it as null)."""
        self._evolve_or_raise(add_columns=[(name, dtype)])

    def drop_column(self, name: str) -> None:
        self._evolve_or_raise(drop_columns=[name])

    def __repr__(self) -> str:
        return f"Table({self.name})"


class Catalog:
    """Abstract catalog (reference daft/catalog/__init__.py:80).

    Concrete backings: ``Catalog.from_pydict`` (in-memory),
    ``SparkCatalog`` (a Spark-side catalog by name). The reference's
    from_glue/from_unity/from_s3tables/from_postgres map on Spark to a
    configured V2 catalog (spark.sql.catalog.<name> confs) and arrive
    here through ``SparkCatalog``; the constructors below raise with
    that exact pointer rather than half-working."""

    name: str

    @staticmethod
    def from_pydict(tables: dict, name: str = "default") -> "Catalog":
        cat = MemoryCatalog(name)
        for ident, obj in tables.items():
            cat.create_table(str(ident), obj)
        return cat

    @staticmethod
    def from_spark(name: str = "spark_catalog", spark: SparkSession | None = None) -> "Catalog":
        return SparkCatalog(name, spark)

    @staticmethod
    def from_iceberg(catalog, name: str = "iceberg") -> "Catalog":
        """reference Catalog.from_iceberg (daft/catalog/__init__.py:226).
        Accepts either a warehouse DIRECTORY (namespaces =
        subdirectories, tables = directories containing metadata/ —
        pyiceberg's filesystem warehouse layout) or an ``http(s)://``
        base URL of an Iceberg REST catalog (the protocol production
        deployments speak — apache/iceberg rest-catalog-open-api.yaml);
        pyiceberg catalog objects need that package."""
        import os

        if isinstance(catalog, str) and catalog.startswith(("http://", "https://")):
            from daft_spark.io.iceberg_rest import IcebergRestCatalog

            return IcebergRestCatalog(catalog, name)
        if isinstance(catalog, str) and os.path.isdir(catalog):
            return IcebergDirectoryCatalog(catalog, name)
        raise ImportError(
            "Catalog.from_iceberg accepts a filesystem warehouse directory or "
            "a REST catalog http(s) URL; pyiceberg catalog objects require "
            "the 'pyiceberg' package"
        )

    @staticmethod
    def _unsupported(kind: str, conf_hint: str):
        raise ImportError(
            f"{kind} catalogs attach to Spark via catalog confs: set "
            f"spark.sql.catalog.<name>={conf_hint} (plus its options) and use "
            "Catalog.from_spark('<name>')"
        )

    @staticmethod
    def from_glue(
        name: str = "glue",
        *,
        client=None,
        session=None,
        endpoint_url: str | None = None,
        region_name: str = "us-east-1",
        aws_access_key_id: str | None = None,
        aws_secret_access_key: str | None = None,
    ) -> "Catalog":
        """reference Catalog.from_glue (daft/catalog/__glue.py:48,110,
        118 — from_client/from_session over a boto3/botocore Glue
        client). Accepts a ready botocore ``client``, a botocore
        ``session`` (``create_client`` is called with the remaining
        kwargs), or raw connection kwargs (endpoint_url + credentials —
        a botocore session is created). boto3 is not required; the
        Spark-side Glue catalog plugin remains available via
        spark.sql.catalog confs + Catalog.from_spark."""
        from daft_spark.io.glue_rest import GlueRestCatalog

        if client is not None:
            return GlueRestCatalog(client, name)
        if session is None and endpoint_url is None:
            Catalog._unsupported("Glue", "org.apache.iceberg.spark.SparkCatalog + glue")
        if session is None:
            import botocore.session

            session = botocore.session.get_session()
        client = session.create_client(
            "glue",
            region_name=region_name,
            endpoint_url=endpoint_url,
            aws_access_key_id=aws_access_key_id,
            aws_secret_access_key=aws_secret_access_key,
        )
        return GlueRestCatalog(client, name)

    @staticmethod
    def from_unity(endpoint=None, token: str | None = None, name: str = "unity") -> "Catalog":
        """reference Catalog.from_unity (daft/catalog/__unity/_catalog.py).
        Accepts an ``http(s)://`` endpoint of an OSS Unity Catalog
        server (the /api/2.1/unity-catalog REST protocol the
        reference's client speaks — daft/catalog/__unity/_client.py:107)
        with optional bearer ``token``. For a Spark-side Unity catalog
        plugin, attach via spark.sql.catalog.<name> confs and use
        Catalog.from_spark('<name>') instead."""
        if isinstance(endpoint, str) and endpoint.startswith(("http://", "https://")):
            from daft_spark.io.unity_rest import UnityRestCatalog

            return UnityRestCatalog(endpoint, token=token, name=name)
        Catalog._unsupported("Unity", "io.unitycatalog.spark.UCSingleCatalog")

    @staticmethod
    def from_s3tables(
        table_bucket_arn: str | None = None,
        *,
        client=None,
        session=None,
        endpoint_url: str | None = None,
        region_name: str = "us-east-1",
        aws_access_key_id: str | None = None,
        aws_secret_access_key: str | None = None,
        name: str = "s3tables",
    ) -> "Catalog":
        """reference Catalog.from_s3tables (daft/catalog/__s3tables.py:
        119,128 — from_client/from_session over a boto3/botocore
        s3tables client bound to a table-bucket ARN). Accepts a ready
        botocore ``client``, a botocore ``session``, or raw connection
        kwargs; boto3 is not required."""
        from daft_spark.io.s3tables_rest import S3TablesRestCatalog

        if not table_bucket_arn:
            Catalog._unsupported(
                "S3Tables", "software.amazon.s3tables.iceberg.S3TablesCatalog"
            )
        if client is not None:
            return S3TablesRestCatalog(table_bucket_arn, client, name)
        if session is None and endpoint_url is None:
            Catalog._unsupported(
                "S3Tables", "software.amazon.s3tables.iceberg.S3TablesCatalog"
            )
        if session is None:
            import botocore.session

            session = botocore.session.get_session()
        client = session.create_client(
            "s3tables",
            region_name=region_name,
            endpoint_url=endpoint_url,
            aws_access_key_id=aws_access_key_id,
            aws_secret_access_key=aws_secret_access_key,
        )
        return S3TablesRestCatalog(table_bucket_arn, client, name)

    @staticmethod
    def from_paimon(catalog, name: str = "paimon") -> "Catalog":
        """reference Catalog.from_paimon (daft/catalog/__paimon.py:25,
        __init__.py:389 — there wrapping a pypaimon catalog object).
        Accepts a warehouse DIRECTORY (pypaimon's FileSystemCatalog
        layout: ``<warehouse>/<db>.db/<table>`` with ``schema/`` marking
        tables — the same layout the reference's file_io listing walks,
        __paimon.py:202-238), read/written through the pure-Python
        Paimon implementation every lake_paimon_* driver row verifies;
        pypaimon catalog objects need that package."""
        import os

        if isinstance(catalog, str) and os.path.isdir(catalog):
            return PaimonDirectoryCatalog(catalog, name)
        raise ImportError(
            "Catalog.from_paimon accepts a filesystem warehouse directory; "
            "pypaimon catalog objects require the 'pypaimon' package"
        )

    @staticmethod
    def from_postgres(connection_string=None, extensions=None, *,
                      connect=None, name: str | None = None) -> "Catalog":
        """reference Catalog.from_postgres (daft/catalog/__postgres.py:
        176 — a catalog whose every operation issues SQL over a psycopg
        connection: CREATE SCHEMA / CREATE TABLE DDL, information_schema
        existence + listing queries, SELECT * reads). A
        ``postgresql://`` connection string needs psycopg (absent from
        this container). ``connect=`` accepts a zero-argument DB-API
        connection factory and runs the SAME Postgres-dialect SQL over
        it — the in-container proof is a DuckDB connection, whose SQL
        front end accepts the catalog's entire statement surface
        verbatim (CREATE SCHEMA, information_schema.schemata/tables/
        columns, quoted identifiers)."""
        if connect is not None:
            from daft_spark.io.pg_catalog import DbapiPostgresCatalog

            return DbapiPostgresCatalog(connect, name=name or "postgres")
        raise ImportError(
            "Catalog.from_postgres with a connection string requires the "
            "'psycopg' package; pass connect=<zero-arg DB-API connection "
            "factory> (e.g. lambda: duckdb.connect(path)) for the "
            "pure-Python route"
        )

    @staticmethod
    def from_gravitino(
        endpoint: str,
        metalake_name: str,
        auth_type: str = "simple",
        username: str | None = None,
        password: str | None = None,
        token: str | None = None,
    ) -> "Catalog":
        """reference Catalog.from_gravitino (daft/catalog/__init__.py:
        271; client daft/catalog/__gravitino/_client.py — the Gravitino
        REST API under ``/api/metalakes/{metalake}/...``)."""
        from daft_spark.io.gravitino_rest import GravitinoRestCatalog

        return GravitinoRestCatalog(
            endpoint, metalake_name, auth_type=auth_type,
            username=username, password=password, token=token,
        )

    # -- interface ---------------------------------------------------------
    def create_namespace(self, identifier) -> None:
        raise NotImplementedError

    def create_table(self, identifier, source, **properties) -> Table:
        raise NotImplementedError

    def drop_namespace(self, identifier) -> None:
        raise NotImplementedError

    def drop_table(self, identifier) -> None:
        raise NotImplementedError

    def get_table(self, identifier) -> Table:
        raise NotImplementedError

    def has_namespace(self, identifier) -> bool:
        raise NotImplementedError

    def has_table(self, identifier) -> bool:
        raise NotImplementedError

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        raise NotImplementedError

    def list_tables(self, pattern: str | None = None) -> list[str]:
        raise NotImplementedError

    def read_table(self, identifier) -> DataFrame:
        return self.get_table(identifier).read()

    def create_namespace_if_not_exists(self, identifier) -> None:
        if not self.has_namespace(identifier):
            self.create_namespace(identifier)

    def create_table_if_not_exists(self, identifier, source, **properties) -> Table:
        if self.has_table(identifier):
            return self.get_table(identifier)
        return self.create_table(identifier, source, **properties)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.name})"


class MemoryCatalog(Catalog):
    """In-memory catalog of named DataFrames/Tables (reference
    Catalog.from_pydict, daft/catalog/__init__.py:168)."""

    def __init__(self, name: str = "default"):
        self.name = name
        self._tables: dict[str, Table] = {}
        self._namespaces: set[str] = set()

    def create_namespace(self, identifier) -> None:
        self._namespaces.add(str(_ident(identifier)))

    def create_table(self, identifier, source, **properties) -> Table:
        key = str(_ident(identifier))
        if isinstance(source, Table):
            t = source
        elif isinstance(source, DataFrame):
            t = Table.from_df(key, source)
        else:
            from daft_spark.dataframe import DataFrame as WrappedDF

            if isinstance(source, WrappedDF):
                t = Table.from_df(key, source.to_spark())
            else:
                raise TypeError(f"cannot create table from {type(source)}")
        self._tables[key] = t
        if len(_ident(identifier)) > 1:
            self._namespaces.add(".".join(_ident(identifier)[:-1]))
        return t

    def drop_namespace(self, identifier) -> None:
        self._namespaces.discard(str(_ident(identifier)))

    def drop_table(self, identifier) -> None:
        if self._tables.pop(str(_ident(identifier)), None) is None:
            raise NotFoundError(f"table {identifier} not found in {self.name}")

    def get_table(self, identifier) -> Table:
        t = self._tables.get(str(_ident(identifier)))
        if t is None:
            raise NotFoundError(f"table {identifier} not found in {self.name}")
        return t

    def has_namespace(self, identifier) -> bool:
        return str(_ident(identifier)) in self._namespaces

    def has_table(self, identifier) -> bool:
        return str(_ident(identifier)) in self._tables

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        out = sorted(self._namespaces)
        if pattern:
            out = [n for n in out if pattern in n]
        return [Identifier.from_str(n) for n in out]

    def list_tables(self, pattern: str | None = None) -> list[str]:
        out = sorted(self._tables)
        if pattern:
            out = [n for n in out if pattern in n]
        return out


def _iceberg_fs_table(name: str, path: str) -> Table:
    """Table handle over a filesystem Iceberg table: reads via the
    pure-Python metadata walk, writes commit new snapshots."""

    def _read() -> DataFrame:
        from daft_spark.context import get_or_create
        from daft_spark.io.iceberg import read_iceberg_py

        spark = SparkSession.getActiveSession() or get_or_create()
        return read_iceberg_py(path, spark)

    def _write(df: DataFrame, mode: str) -> None:
        from daft_spark.io.iceberg import write_iceberg_py

        write_iceberg_py(df, path, mode=mode)

    def _evolve(**kw) -> None:
        from daft_spark.io.iceberg import evolve_iceberg_schema

        evolve_iceberg_schema(path, **kw)

    tbl = Table(name, _read, _write)
    tbl._evolve = _evolve
    return tbl


class IcebergDirectoryCatalog(Catalog):
    """Filesystem Iceberg warehouse (reference Catalog.from_iceberg,
    daft/catalog/__init__.py:226 — there backed by pyiceberg; here by
    the pure-Python Iceberg v2 implementation in io/iceberg.py):
    ``<root>/<namespace...>/<table>/metadata/``. create_table writes a
    first snapshot; get_table().read()/write() go through the same
    reader/writer every lake_iceberg_* driver query verifies."""

    def __init__(self, root: str, name: str = "iceberg"):
        import os

        self.name = name
        self._root = os.path.abspath(root)

    def _path(self, identifier) -> str:
        import os

        return os.path.join(self._root, *_ident(identifier))

    def _is_table(self, path: str) -> bool:
        import os

        return os.path.isdir(os.path.join(path, "metadata"))

    def create_namespace(self, identifier) -> None:
        import os

        os.makedirs(self._path(identifier), exist_ok=True)

    def create_table(self, identifier, source, **properties) -> Table:
        import os

        from daft_spark.io.iceberg import write_iceberg_py

        path = self._path(identifier)
        if self._is_table(path):
            raise ValueError(f"table {identifier} already exists in {self.name}")
        from daft_spark.dataframe import DataFrame as WrappedDF

        if isinstance(source, WrappedDF):
            source = source.to_spark()
        if not isinstance(source, DataFrame):
            raise TypeError(f"cannot create an Iceberg table from {type(source)}")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_iceberg_py(
            source, path, mode="error",
            partition_by=properties.get("partition_by"),
        )
        return _iceberg_fs_table(str(_ident(identifier)), path)

    def drop_namespace(self, identifier) -> None:
        import os
        import shutil

        path = self._path(identifier)
        if not os.path.isdir(path):
            raise NotFoundError(f"namespace {identifier} not found in {self.name}")
        shutil.rmtree(path)

    def drop_table(self, identifier) -> None:
        import shutil

        path = self._path(identifier)
        if not self._is_table(path):
            raise NotFoundError(f"table {identifier} not found in {self.name}")
        shutil.rmtree(path)

    def get_table(self, identifier) -> Table:
        path = self._path(identifier)
        if not self._is_table(path):
            raise NotFoundError(f"table {identifier} not found in {self.name}")
        return _iceberg_fs_table(str(_ident(identifier)), path)

    def has_namespace(self, identifier) -> bool:
        import os

        path = self._path(identifier)
        return os.path.isdir(path) and not self._is_table(path)

    def has_table(self, identifier) -> bool:
        return self._is_table(self._path(identifier))

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        import os

        out = []
        for root, dirs, _files in os.walk(self._root):
            if self._is_table(root):
                dirs[:] = []
                continue
            rel = os.path.relpath(root, self._root)
            if rel != "." and not self._is_table(root):
                out.append(rel.replace(os.sep, "."))
        if pattern:
            out = [n for n in out if pattern in n]
        return [Identifier.from_str(n) for n in sorted(out)]

    def list_tables(self, pattern: str | None = None) -> list[str]:
        import os

        out = []
        for root, dirs, _files in os.walk(self._root):
            if self._is_table(root):
                out.append(os.path.relpath(root, self._root).replace(os.sep, "."))
                dirs[:] = []
        if pattern:
            out = [n for n in out if pattern in n]
        return sorted(out)


def _paimon_fs_table(name: str, path: str) -> Table:
    """Table handle over a filesystem Paimon table (reference
    PaimonTable, daft/catalog/__paimon.py:248 — there wrapping a
    pypaimon table object; here the pure-Python reader/writer in
    io/paimon.py). Exposes the reference's table-introspection
    properties (primary_keys / partition_keys / is_primary_key_table /
    bucket_count / table_options) straight from the table's latest
    schema file."""
    from daft_spark.io.paimon import _latest_schema

    def _read() -> DataFrame:
        from daft_spark.context import get_or_create
        from daft_spark.io.paimon import read_paimon_py

        spark = SparkSession.getActiveSession() or get_or_create()
        return read_paimon_py(path, spark)

    def _write(df: DataFrame, mode: str) -> None:
        from daft_spark.io.paimon import write_paimon_py

        schema = _latest_schema(path)
        write_paimon_py(
            df, path, mode=mode,
            partition_by=schema.get("partitionKeys") or [],
            primary_key=schema.get("primaryKeys") or [],
        )

    tbl = Table(name, _read, _write)
    schema = _latest_schema(path)
    tbl.primary_keys = list(schema.get("primaryKeys") or [])
    tbl.partition_keys = list(schema.get("partitionKeys") or [])
    tbl.is_primary_key_table = bool(tbl.primary_keys)
    tbl.bucket_count = int((schema.get("options") or {}).get("bucket", "-1"))
    tbl.table_options = dict(schema.get("options") or {})
    return tbl


class PaimonDirectoryCatalog(Catalog):
    """Filesystem Paimon warehouse (reference Catalog.from_paimon,
    daft/catalog/__paimon.py:25 — there backed by pypaimon's
    FileSystemCatalog; here by the pure-Python Paimon implementation in
    io/paimon.py). Layout is pypaimon's warehouse convention, which the
    reference's own listing walk encodes
    (daft/catalog/__paimon.py:202-238 _list_*_via_file_io):
    ``<warehouse>/<db>.db/<table>`` where a valid table directory
    contains a ``schema/`` subdirectory; databases are the flat
    ``<db>.db`` directories. Identifiers follow the reference's
    ``_to_paimon_ident`` (daft/catalog/__paimon.py:316): ``db.table``,
    with a 3-part ``catalog.db.table`` stripped to ``db.table``."""

    DB_SUFFIX = ".db"  # pypaimon Catalog.DB_SUFFIX

    def __init__(self, root: str, name: str = "paimon"):
        import os

        self.name = name
        self._root = os.path.abspath(root)

    def _split(self, identifier) -> tuple[str, str]:
        parts = list(_ident(identifier))
        if len(parts) == 3:  # catalog prefix stripped, reference :322
            parts = parts[1:]
        if len(parts) != 2:
            raise ValueError(
                f"Paimon table identifier must be 'db.table', got {identifier}"
            )
        return parts[0], parts[1]

    def _db_path(self, db: str) -> str:
        import os

        return os.path.join(self._root, db + self.DB_SUFFIX)

    def _table_path(self, identifier) -> str:
        import os

        db, tbl = self._split(identifier)
        return os.path.join(self._db_path(db), tbl)

    @staticmethod
    def _is_table(path: str) -> bool:
        import os

        return os.path.isdir(os.path.join(path, "schema"))

    def create_namespace(self, identifier) -> None:
        import os

        parts = list(_ident(identifier))
        if len(parts) != 1:
            raise ValueError(
                f"Paimon namespace must be a single database name, got {identifier}"
            )
        path = self._db_path(parts[0])
        if os.path.isdir(path):
            raise ValueError(f"namespace {identifier} already exists in {self.name}")
        os.makedirs(path)

    def create_table(self, identifier, source, *, partition_by=None,
                     primary_key=None, **properties) -> Table:
        """Create and populate a table from a DataFrame (the reference
        takes a Schema and creates empty via pypaimon; this engine's
        create-from-DataFrame convention matches IcebergDirectoryCatalog).
        ``primary_key`` declares a merge-on-read upsert table; reference
        passes ``primary_keys`` via properties (daft/catalog/
        __paimon.py:81) — both spellings accepted."""
        import os

        from daft_spark.io.paimon import write_paimon_py

        path = self._table_path(identifier)
        if self._is_table(path):
            raise ValueError(f"table {identifier} already exists in {self.name}")
        from daft_spark.dataframe import DataFrame as WrappedDF

        if isinstance(source, WrappedDF):
            source = source.to_spark()
        if not isinstance(source, DataFrame):
            raise TypeError(f"cannot create a Paimon table from {type(source)}")
        primary_key = primary_key or properties.get("primary_keys")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_paimon_py(
            source, path, mode="error",
            partition_by=partition_by, primary_key=primary_key,
        )
        return _paimon_fs_table(str(_ident(identifier)), path)

    def drop_namespace(self, identifier) -> None:
        import os
        import shutil

        parts = list(_ident(identifier))
        path = self._db_path(parts[0]) if len(parts) == 1 else ""
        if not path or not os.path.isdir(path):
            raise NotFoundError(f"namespace {identifier} not found in {self.name}")
        shutil.rmtree(path)

    def drop_table(self, identifier) -> None:
        import shutil

        path = self._table_path(identifier)
        if not self._is_table(path):
            raise NotFoundError(f"table {identifier} not found in {self.name}")
        shutil.rmtree(path)

    def get_table(self, identifier) -> Table:
        path = self._table_path(identifier)
        if not self._is_table(path):
            raise NotFoundError(f"table {identifier} not found in {self.name}")
        db, tbl = self._split(identifier)
        return _paimon_fs_table(f"{db}.{tbl}", path)

    def has_namespace(self, identifier) -> bool:
        import os

        parts = list(_ident(identifier))
        return len(parts) == 1 and os.path.isdir(self._db_path(parts[0]))

    def has_table(self, identifier) -> bool:
        try:
            return self._is_table(self._table_path(identifier))
        except ValueError:
            return False

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        import os

        out = []
        if os.path.isdir(self._root):
            for d in sorted(os.listdir(self._root)):
                if d.endswith(self.DB_SUFFIX) and os.path.isdir(
                    os.path.join(self._root, d)
                ):
                    db = d[: -len(self.DB_SUFFIX)]
                    # reference filters by startswith (daft/catalog/__paimon.py:212)
                    if pattern is None or db.startswith(pattern):
                        out.append(Identifier(db))
        return out

    def list_tables(self, pattern: str | None = None) -> list[str]:
        import os

        out = []
        for ns in self.list_namespaces():
            db = ns[0]
            db_path = self._db_path(db)
            for t in sorted(os.listdir(db_path)):
                if self._is_table(os.path.join(db_path, t)):
                    full = f"{db}.{t}"
                    if pattern is None or full.startswith(pattern):
                        out.append(full)
        return out


class SparkCatalog(Catalog):
    """A Spark-side catalog by name — the session catalog
    (``spark_catalog``) or any V2 catalog configured via
    ``spark.sql.catalog.<name>`` confs. Namespaces are databases."""

    def __init__(self, name: str = "spark_catalog", spark: SparkSession | None = None):
        self.name = name
        self.spark = spark or get_or_create()

    def _q(self, identifier) -> str:
        parts = _ident(identifier)
        return ".".join([self.name, *parts])

    def create_namespace(self, identifier) -> None:
        self.spark.sql(f"CREATE NAMESPACE {self._q(identifier)}")

    def create_table(self, identifier, source, **properties) -> Table:
        from pyspark.sql.types import StructType

        name = self._q(identifier)
        if isinstance(source, StructType):
            self.spark.catalog.createTable(name, schema=source, **properties)
        else:
            from daft_spark.dataframe import DataFrame as WrappedDF

            sdf = source.to_spark() if isinstance(source, WrappedDF) else source
            sdf.write.saveAsTable(name, **properties)
        return self.get_table(identifier)

    def drop_namespace(self, identifier) -> None:
        self.spark.sql(f"DROP NAMESPACE {self._q(identifier)}")

    def drop_table(self, identifier) -> None:
        self.spark.sql(f"DROP TABLE {self._q(identifier)}")

    def get_table(self, identifier) -> Table:
        if not self.has_table(identifier):
            raise NotFoundError(f"table {identifier} not found in {self.name}")
        name = self._q(identifier)
        return Table(
            str(_ident(identifier)),
            lambda: self.spark.table(name),
            lambda df, mode: df.write.mode(mode).saveAsTable(name),
        )

    def has_namespace(self, identifier) -> bool:
        try:
            return self.spark.catalog.databaseExists(str(_ident(identifier)))
        except Exception:
            return False

    def has_table(self, identifier) -> bool:
        try:
            return self.spark.catalog.tableExists(self._q(identifier))
        except Exception:
            return False

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        dbs = [d.name for d in self.spark.catalog.listDatabases(pattern)]
        return [Identifier.from_str(d) for d in dbs]

    def list_tables(self, pattern: str | None = None) -> list[str]:
        ts = self.spark.catalog.listTables()
        out = [t.name for t in ts]
        if pattern:
            out = [n for n in out if pattern in n]
        return sorted(out)


class Session:
    """The session: attached catalogs + temp tables + functions
    (reference daft/session.py:86; attach surface :176-404).

    Temp tables are Spark temp views — session-scoped, dropped with the
    SparkSession, exactly the reference's lifetime contract."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_or_create()
        self._catalogs: dict[str, Catalog] = {}
        self._functions: dict[str, Callable] = {}
        self._current_catalog: str | None = None
        self._current_namespace: Identifier | None = None

    # -- attach / detach ---------------------------------------------------
    def attach(self, obj, alias: str | None = None):
        """Dispatch on type: Catalog, Table, callable (UDF), DataFrame
        (reference session.py:176)."""
        if isinstance(obj, Catalog):
            return self.attach_catalog(obj, alias)
        if isinstance(obj, Table):
            return self.attach_table(obj, alias)
        if isinstance(obj, DataFrame) or _is_wrapped_df(obj):
            if alias is None:
                raise ValueError("Cannot attach a DataFrame without an alias.")
            return self.attach_view(obj, alias)
        if callable(obj):
            return self.attach_function(obj, alias)
        raise ValueError(f"Cannot attach object with type {type(obj)}")

    def attach_catalog(self, catalog: Catalog, alias: str | None = None) -> Catalog:
        if not isinstance(catalog, Catalog):
            raise TypeError(f"expected Catalog, got {type(catalog)}")
        a = alias or catalog.name
        if a in self._catalogs:
            raise ValueError(f"catalog {a!r} is already attached")
        self._catalogs[a] = catalog
        if self._current_catalog is None:
            self._current_catalog = a
        return catalog

    def attach_table(self, table, alias: str | None = None) -> Table:
        """Attach a Table (or DataFrame, for convenience) as a
        session-scoped name."""
        if isinstance(table, Table):
            t = table
            a = alias or t.name
            t.read().createOrReplaceTempView(a)
            return t
        # DataFrame convenience (kept from the round-2 veneer)
        sdf = table.to_spark() if _is_wrapped_df(table) else table
        if alias is None:
            raise ValueError("attach_table(DataFrame) requires an alias")
        sdf.createOrReplaceTempView(alias)
        return Table.from_df(alias, sdf)

    def attach_view(self, view, alias: str) -> Table:
        sdf = view.to_spark() if _is_wrapped_df(view) else view
        sdf.createOrReplaceTempView(alias)
        return Table.from_df(alias, sdf)

    def attach_function(self, function: Callable, alias: str | None = None,
                        return_dtype: str = "string") -> None:
        """Register a Python function for SQL (reference
        attach_function). ``@daft_spark.udf.func``-decorated callables
        carry their return type; plain callables take return_dtype."""
        name = alias or getattr(function, "__name__", None)
        if not name:
            raise ValueError("attach_function requires an alias for unnamed callables")
        if hasattr(function, "__daft_spark_udf__") or hasattr(function, "returnType"):
            # already a (pandas_)udf-wrapped function — register as-is
            self.spark.udf.register(name, function)
        else:
            self.spark.udf.register(name, function, return_dtype)
        self._functions[name] = function

    def detach_catalog(self, alias: str) -> None:
        if alias not in self._catalogs:
            raise NotFoundError(f"catalog {alias!r} is not attached")
        del self._catalogs[alias]
        if self._current_catalog == alias:
            self._current_catalog = next(iter(self._catalogs), None)

    def detach_table(self, alias: str) -> None:
        if not self.spark.catalog.dropTempView(alias):
            raise NotFoundError(f"temp table {alias!r} not found")

    def detach_function(self, alias: str) -> None:
        if self._functions.pop(alias, None) is None:
            raise NotFoundError(f"function {alias!r} is not attached")
        self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {alias}")

    # -- create / drop -----------------------------------------------------
    def create_namespace(self, identifier) -> None:
        self._require_catalog().create_namespace(identifier)

    def create_namespace_if_not_exists(self, identifier) -> None:
        self._require_catalog().create_namespace_if_not_exists(identifier)

    def create_table(self, identifier, source, **properties) -> Table:
        cat, ident = self._resolve(identifier)
        return cat.create_table(ident, source, **properties)

    def create_table_if_not_exists(self, identifier, source, **properties) -> Table:
        cat, ident = self._resolve(identifier)
        return cat.create_table_if_not_exists(ident, source, **properties)

    def create_temp_table(self, identifier: str, source) -> Table:
        """Session-scoped table (reference session.py:404). A Schema
        source creates an empty table; a DataFrame source snapshots the
        frame under the name."""
        from pyspark.sql.types import StructType

        if isinstance(source, StructType):
            sdf = self.spark.createDataFrame([], source)
        else:
            sdf = source.to_spark() if _is_wrapped_df(source) else source
        sdf.createOrReplaceTempView(identifier)
        return Table.from_df(identifier, sdf)

    def create_temp_view(self, identifier: str, view) -> Table:
        return self.attach_view(view, identifier)

    def drop_namespace(self, identifier) -> None:
        self._require_catalog().drop_namespace(identifier)

    def drop_table(self, identifier) -> None:
        cat, ident = self._resolve(identifier)
        cat.drop_table(ident)

    # -- lookup ------------------------------------------------------------
    def get_catalog(self, alias: str) -> Catalog:
        if alias not in self._catalogs:
            raise NotFoundError(f"catalog {alias!r} is not attached")
        return self._catalogs[alias]

    def get_table(self, identifier) -> Table:
        ident = _ident(identifier)
        # temp view shadows catalogs, as in Spark name resolution
        if len(ident) == 1 and self._is_temp_view(ident[0]):
            name = ident[0]
            return Table(name, lambda: self.spark.table(name))
        cat, rest = self._resolve(identifier)
        return cat.get_table(rest)

    def has_catalog(self, alias: str) -> bool:
        return alias in self._catalogs

    def has_namespace(self, identifier) -> bool:
        cat = self._maybe_catalog()
        return bool(cat and cat.has_namespace(identifier))

    def has_table(self, identifier) -> bool:
        ident = _ident(identifier)
        if len(ident) == 1 and self._is_temp_view(ident[0]):
            return True
        try:
            cat, rest = self._resolve(identifier)
        except NotFoundError:
            return False
        return cat.has_table(rest)

    def list_catalogs(self, pattern: str | None = None) -> list[str]:
        out = sorted(self._catalogs)
        if pattern:
            out = [n for n in out if pattern in n]
        return out

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        cat = self._maybe_catalog()
        return cat.list_namespaces(pattern) if cat else []

    def list_tables(self, pattern: str | None = None) -> list[str]:
        out = [t.name for t in self.spark.catalog.listTables()]
        cat = self._maybe_catalog()
        if cat is not None:
            out.extend(cat.list_tables())
        if pattern:
            out = [n for n in out if pattern in n]
        return sorted(set(out))

    def read_table(self, identifier, **options) -> DataFrame:
        return self.get_table(identifier).read()

    # -- current state -----------------------------------------------------
    def use(self, identifier=None) -> None:
        """``use('cat')`` or ``use('cat.ns')`` (reference
        session.py:495)."""
        if identifier is None:
            self._current_catalog = None
            self._current_namespace = None
            return
        ident = _ident(identifier)
        self.set_catalog(ident[0])
        self._current_namespace = Identifier(*ident[1:]) if len(ident) > 1 else None

    def set_catalog(self, alias: str | None) -> None:
        if alias is not None and alias not in self._catalogs:
            raise NotFoundError(f"catalog {alias!r} is not attached")
        self._current_catalog = alias

    def set_namespace(self, identifier) -> None:
        self._current_namespace = _ident(identifier) if identifier is not None else None

    def current_catalog(self) -> Catalog | None:
        return self._catalogs.get(self._current_catalog) if self._current_catalog else None

    def current_namespace(self) -> Identifier | None:
        return self._current_namespace

    # -- sql ---------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        from daft_spark.sql import _expand_table_functions

        return self.spark.sql(_expand_table_functions(query, self.spark))

    # -- internals ---------------------------------------------------------
    def _is_temp_view(self, name: str) -> bool:
        try:
            t = self.spark.catalog.getTable(name)
            return t.isTemporary
        except Exception:
            return False

    def _require_catalog(self) -> Catalog:
        cat = self.current_catalog()
        if cat is None:
            raise NotFoundError("no catalog attached (use attach_catalog)")
        return cat

    def _maybe_catalog(self) -> Catalog | None:
        return self.current_catalog()

    def _resolve(self, identifier) -> tuple[Catalog, Identifier]:
        """catalog-qualified -> that catalog + remainder; otherwise the
        current catalog + (current namespace +) identifier."""
        ident = _ident(identifier)
        if len(ident) > 1 and ident[0] in self._catalogs:
            return self._catalogs[ident[0]], Identifier(*ident[1:])
        cat = self._require_catalog()
        if self._current_namespace and len(ident) == 1:
            ident = Identifier(*self._current_namespace, *ident)
        return cat, ident


def _is_wrapped_df(obj) -> bool:
    from daft_spark.dataframe import DataFrame as WrappedDF

    return isinstance(obj, WrappedDF)


_DEFAULT_SESSION: Session | None = None


def session() -> Session:
    """Process-global session (reference daft/session.py:74)."""
    global _DEFAULT_SESSION
    if _DEFAULT_SESSION is None:
        _DEFAULT_SESSION = Session()
    return _DEFAULT_SESSION
