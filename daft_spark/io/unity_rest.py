"""Unity Catalog REST — protocol client + in-process HTTP server.

The reference's ``Catalog.from_unity`` speaks the OSS Unity Catalog
REST API (base path ``/api/2.1/unity-catalog`` — the public protocol
published by the unitycatalog project's OpenAPI spec; reference client
``daft/catalog/__unity/_client.py:107`` builds exactly this base URL
and pages ``catalogs.list`` / ``schemas.list`` / ``tables.list`` with
``page_token``/``next_page_token``, retrieves ``tables/{full_name}``,
creates DELTA tables via ``tables.create``, and requests
``temporary-table-credentials`` before reading the table's
``storage_location`` as a Delta table). This module implements the
same wire contract on both sides, so the catalog surface is exercised
protocol-level without any external service:

- ``UnityCatalogServer`` — a ThreadingHTTPServer on
  127.0.0.1:<ephemeral> serving catalogs/schemas/tables CRUD plus
  ``temporary-table-credentials`` over a filesystem warehouse whose
  managed tables are pure-Python Delta tables
  (``<root>/<catalog>/<schema>/<table>``). Optional bearer-token auth
  (401 without the header) exercises the reference's
  StaticTokenProvider path. Pagination is real: list endpoints honor
  ``max_results`` and emit ``next_page_token``.
- ``UnityRestCatalog`` — a Catalog whose every operation is an HTTP
  round-trip (urllib, stdlib-only). Identifiers follow the reference's
  3-level ``catalog.schema.table`` convention
  (``daft/catalog/__unity/_catalog.py:95-111``: a list pattern of 0/1
  dots narrows to catalog / schema). ``get_table`` retrieves the
  TableInfo, obtains temporary credentials for its ``table_id`` (the
  same two-step the reference does), and binds reads/writes of the
  returned ``storage_location`` to the pure-Python Delta
  reader/writer. Unlike the reference adapter (which leaves
  create/drop ``NotImplementedError``), create_namespace/create_table/
  drop_* are implemented — the OSS API supports them.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, urlsplit

from daft_spark.session import Catalog, Identifier, NotFoundError, Table, _ident

_BASE = "/api/2.1/unity-catalog"

# Spark simpleString -> Unity ColumnTypeName (OSS spec enum)
_TYPE_NAMES = {
    "tinyint": "BYTE", "smallint": "SHORT", "int": "INT", "bigint": "LONG",
    "float": "FLOAT", "double": "DOUBLE", "string": "STRING",
    "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP_NTZ", "binary": "BINARY",
}


def _uc_columns(schema) -> list[dict]:
    """Spark StructType -> Unity TableInfo.columns."""
    cols = []
    for i, f in enumerate(schema.fields):
        t = f.dataType.simpleString()
        cols.append(
            {
                "name": f.name,
                "type_text": t,
                "type_name": _TYPE_NAMES.get(t.split("(")[0], t.upper()),
                "position": i,
                "nullable": bool(f.nullable),
            }
        )
    return cols


# ---------------------------------------------------------------------------
# server


class _State:
    """Warehouse registry: catalogs -> schemas -> tables (TableInfo)."""

    def __init__(self, root: str):
        self.root = root
        self.lock = threading.Lock()
        # {catalog: {"schemas": {schema: {"tables": {name: TableInfo}}}}}
        self.catalogs: dict[str, dict] = {}

    def table_path(self, cat: str, sch: str, tbl: str) -> str:
        return os.path.join(self.root, cat, sch, tbl)

    def find_by_id(self, table_id: str) -> dict | None:
        for c in self.catalogs.values():
            for s in c["schemas"].values():
                for info in s["tables"].values():
                    if info["table_id"] == table_id:
                        return info
        return None


class _Handler(BaseHTTPRequestHandler):
    server_version = "daft-spark-unity-rest/1"

    def log_message(self, fmt, *args):  # noqa: D401
        pass

    # -- plumbing -----------------------------------------------------------
    def _send(self, code: int, payload: dict | None = None) -> None:
        body = b"" if payload is None else json.dumps(payload).encode()
        self.send_response(code)
        if body:
            self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _error(self, code: int, msg: str, etype: str = "") -> None:
        # OSS Unity error shape: {"error_code": ..., "message": ...}
        self._send(code, {"error_code": etype or str(code), "message": msg})

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    @property
    def _st(self) -> _State:
        return self.server.state  # type: ignore[attr-defined]

    def _authed(self) -> bool:
        token = getattr(self.server, "token", None)
        if not token:
            return True
        return self.headers.get("Authorization") == f"Bearer {token}"

    def _route(self):
        parts = urlsplit(self.path)
        if not parts.path.startswith(_BASE):
            return None, None, {}
        segs = [s for s in parts.path[len(_BASE):].split("/") if s]
        q = {k: v[0] for k, v in parse_qs(parts.query).items()}
        if not segs:
            return None, None, q
        return segs[0], segs[1:], q

    @staticmethod
    def _page(items: list, q: dict) -> tuple[list, str | None]:
        """Real pagination: max_results + opaque offset page_token."""
        start = int(q.get("page_token") or 0)
        limit = int(q.get("max_results") or 100)
        page = items[start : start + limit]
        nxt = str(start + limit) if start + limit < len(items) else None
        return page, nxt

    # -- verbs --------------------------------------------------------------
    def do_GET(self):  # noqa: N802
        if not self._authed():
            return self._error(401, "missing or invalid bearer token", "UNAUTHENTICATED")
        kind, rest, q = self._route()
        st = self._st
        with st.lock:
            if kind == "catalogs" and not rest:
                infos = [
                    {"name": c, "comment": v.get("comment", ""), "id": v["id"]}
                    for c, v in sorted(st.catalogs.items())
                ]
                page, nxt = self._page(infos, q)
                return self._send(200, {"catalogs": page, "next_page_token": nxt})
            if kind == "schemas" and not rest:
                cat = q.get("catalog_name")
                if cat not in st.catalogs:
                    return self._error(404, f"catalog {cat!r} not found", "CATALOG_DOES_NOT_EXIST")
                infos = [
                    {"name": s, "catalog_name": cat, "full_name": f"{cat}.{s}"}
                    for s in sorted(st.catalogs[cat]["schemas"])
                ]
                page, nxt = self._page(infos, q)
                return self._send(200, {"schemas": page, "next_page_token": nxt})
            if kind == "tables" and not rest:
                cat, sch = q.get("catalog_name"), q.get("schema_name")
                schemas = st.catalogs.get(cat, {}).get("schemas", {})
                if sch not in schemas:
                    return self._error(404, f"schema {cat}.{sch} not found", "SCHEMA_DOES_NOT_EXIST")
                infos = [schemas[sch]["tables"][t] for t in sorted(schemas[sch]["tables"])]
                page, nxt = self._page(infos, q)
                return self._send(200, {"tables": page, "next_page_token": nxt})
            if kind == "tables" and len(rest) == 1:
                info = self._table_info(rest[0])
                if info is None:
                    return self._error(404, f"table {rest[0]!r} not found", "TABLE_DOES_NOT_EXIST")
                return self._send(200, info)
        return self._error(404, f"no route for {self.path}", "NOT_FOUND")

    def _table_info(self, full_name: str) -> dict | None:
        parts = full_name.split(".")
        if len(parts) != 3:
            return None
        cat, sch, tbl = parts
        return (
            self._st.catalogs.get(cat, {})
            .get("schemas", {})
            .get(sch, {})
            .get("tables", {})
            .get(tbl)
        )

    def do_POST(self):  # noqa: N802
        if not self._authed():
            return self._error(401, "missing or invalid bearer token", "UNAUTHENTICATED")
        kind, rest, _q = self._route()
        st = self._st
        body = self._body()
        now_ms = int(time.time() * 1000)
        with st.lock:
            if kind == "catalogs" and not rest:
                name = body.get("name")
                if not name:
                    return self._error(400, "missing catalog name", "INVALID_ARGUMENT")
                if name in st.catalogs:
                    return self._error(409, f"catalog {name!r} exists", "ALREADY_EXISTS")
                st.catalogs[name] = {
                    "id": str(uuid.uuid4()),
                    "comment": body.get("comment", ""),
                    "schemas": {},
                }
                return self._send(200, {"name": name, "id": st.catalogs[name]["id"]})
            if kind == "schemas" and not rest:
                cat, name = body.get("catalog_name"), body.get("name")
                if cat not in st.catalogs:
                    return self._error(404, f"catalog {cat!r} not found", "CATALOG_DOES_NOT_EXIST")
                if name in st.catalogs[cat]["schemas"]:
                    return self._error(409, f"schema {cat}.{name} exists", "ALREADY_EXISTS")
                st.catalogs[cat]["schemas"][name] = {"tables": {}}
                return self._send(
                    200, {"name": name, "catalog_name": cat, "full_name": f"{cat}.{name}"}
                )
            if kind == "tables" and not rest:
                cat, sch, name = (
                    body.get("catalog_name"), body.get("schema_name"), body.get("name")
                )
                schemas = st.catalogs.get(cat, {}).get("schemas", {})
                if sch not in schemas:
                    return self._error(404, f"schema {cat}.{sch} not found", "SCHEMA_DOES_NOT_EXIST")
                if name in schemas[sch]["tables"]:
                    return self._error(409, f"table {name!r} exists", "ALREADY_EXISTS")
                fmt = body.get("data_source_format", "DELTA")
                if fmt != "DELTA":
                    return self._error(400, f"unsupported data_source_format {fmt}", "INVALID_ARGUMENT")
                # MANAGED tables get a warehouse location; EXTERNAL ones
                # bring their own storage_location (validated non-empty,
                # as the real service does)
                ttype = body.get("table_type", "MANAGED")
                loc = body.get("storage_location")
                if ttype == "EXTERNAL" and not loc:
                    return self._error(400, "EXTERNAL table needs storage_location", "INVALID_ARGUMENT")
                if not loc:
                    loc = st.table_path(cat, sch, name)
                info = {
                    "name": name,
                    "catalog_name": cat,
                    "schema_name": sch,
                    "table_type": ttype,
                    "data_source_format": fmt,
                    "columns": body.get("columns") or [],
                    "storage_location": loc,
                    "comment": body.get("comment", ""),
                    "created_at": now_ms,
                    "table_id": str(uuid.uuid4()),
                }
                schemas[sch]["tables"][name] = info
                return self._send(200, info)
            if kind == "temporary-table-credentials" and not rest:
                tid = body.get("table_id")
                if body.get("operation") not in ("READ", "READ_WRITE"):
                    return self._error(400, "operation must be READ or READ_WRITE", "INVALID_ARGUMENT")
                info = st.find_by_id(tid)
                if info is None:
                    return self._error(404, f"table_id {tid!r} not found", "TABLE_DOES_NOT_EXIST")
                # a filesystem warehouse has no cloud creds to vend; the
                # response shape (expiration + url) matches the spec
                return self._send(
                    200,
                    {"expiration_time": now_ms + 3_600_000, "url": info["storage_location"]},
                )
        return self._error(404, f"no route for {self.path}", "NOT_FOUND")

    def do_DELETE(self):  # noqa: N802
        if not self._authed():
            return self._error(401, "missing or invalid bearer token", "UNAUTHENTICATED")
        kind, rest, _q = self._route()
        st = self._st
        with st.lock:
            if kind == "catalogs" and len(rest) == 1:
                if st.catalogs.pop(rest[0], None) is None:
                    return self._error(404, f"catalog {rest[0]!r} not found", "CATALOG_DOES_NOT_EXIST")
                return self._send(200)
            if kind == "schemas" and len(rest) == 1:
                parts = rest[0].split(".")
                if len(parts) == 2 and parts[1] in st.catalogs.get(parts[0], {}).get("schemas", {}):
                    del st.catalogs[parts[0]]["schemas"][parts[1]]
                    return self._send(200)
                return self._error(404, f"schema {rest[0]!r} not found", "SCHEMA_DOES_NOT_EXIST")
            if kind == "tables" and len(rest) == 1:
                parts = rest[0].split(".")
                if len(parts) == 3:
                    tables = (
                        st.catalogs.get(parts[0], {})
                        .get("schemas", {})
                        .get(parts[1], {})
                        .get("tables", {})
                    )
                    if parts[2] in tables:
                        del tables[parts[2]]
                        return self._send(200)
                return self._error(404, f"table {rest[0]!r} not found", "TABLE_DOES_NOT_EXIST")
        return self._error(404, f"no route for {self.path}", "NOT_FOUND")


class UnityCatalogServer:
    """In-process OSS Unity Catalog REST server over a filesystem
    warehouse. Use as a context manager; ``.uri`` is the base URL
    (WITHOUT the /api/2.1/unity-catalog suffix — the client appends it,
    like the reference's client does)."""

    def __init__(self, warehouse_root: str, token: str | None = None):
        os.makedirs(warehouse_root, exist_ok=True)
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd.state = _State(warehouse_root)  # type: ignore[attr-defined]
        self._httpd.token = token  # type: ignore[attr-defined]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def uri(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "UnityCatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "UnityCatalogServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


# ---------------------------------------------------------------------------
# client


class UnityError(Exception):
    def __init__(self, code: int, message: str, error_code: str = ""):
        super().__init__(f"{code} {error_code}: {message}")
        self.code = code
        self.error_code = error_code


class UnityRestCatalog(Catalog):
    """Protocol-level OSS Unity Catalog client; constructed via
    ``Catalog.from_unity("http://host:port", token=...)``. Identifiers
    are 3-level ``catalog.schema.table``; namespaces are ``catalog`` or
    ``catalog.schema`` (reference _catalog.py pattern semantics)."""

    def __init__(self, endpoint: str, token: str | None = None, name: str = "unity"):
        self.name = name
        self._token = token
        self._base = endpoint.rstrip("/") + _BASE
        # handshake: the list endpoint doubles as a liveness/auth check
        self._get("catalogs")

    # -- http ----------------------------------------------------------------
    def _http(self, method: str, path: str, body: dict | None = None) -> dict:
        import urllib.error
        import urllib.request

        data = None if body is None else json.dumps(body).encode()
        req = urllib.request.Request(f"{self._base}/{path}", data=data, method=method)
        if data is not None:
            req.add_header("Content-Type", "application/json")
        if self._token:
            req.add_header("Authorization", f"Bearer {self._token}")
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else {}
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                payload = json.loads(raw) if raw else {}
            except json.JSONDecodeError:
                payload = {}
            msg = payload.get("message", f"HTTP {e.code}")
            if e.code == 404:
                raise NotFoundError(msg) from None
            raise UnityError(e.code, msg, payload.get("error_code", "")) from None

    def _get(self, path: str) -> dict:
        return self._http("GET", path)

    def _paged(self, path: str, key: str, qs: str = "") -> list[dict]:
        """Exhaust next_page_token pages, as the reference client does."""
        out: list[dict] = []
        token = None
        while True:
            q = qs + (f"&page_token={token}" if token else "")
            payload = self._get(f"{path}?{q.lstrip('&')}" if q else path)
            out.extend(payload.get(key) or [])
            token = payload.get("next_page_token")
            if not token:
                return out

    # -- namespaces ----------------------------------------------------------
    def create_namespace(self, identifier) -> None:
        parts = list(_ident(identifier))
        if len(parts) > 2:
            raise ValueError(f"Unity namespaces are catalog[.schema]: {identifier}")
        try:
            self._http("POST", "catalogs", {"name": parts[0]})
        except UnityError as e:
            if e.code != 409:
                raise
        if len(parts) == 2:
            self._http("POST", "schemas", {"catalog_name": parts[0], "name": parts[1]})

    def has_namespace(self, identifier) -> bool:
        parts = list(_ident(identifier))
        cats = {c["name"] for c in self._paged("catalogs", "catalogs")}
        if parts[0] not in cats:
            return False
        if len(parts) == 1:
            return True
        schemas = self._paged("schemas", "schemas", f"catalog_name={quote(parts[0])}")
        return any(s["name"] == parts[1] for s in schemas)

    def list_namespaces(self, pattern: str | None = None):
        out = []
        for c in self._paged("catalogs", "catalogs"):
            out.append(c["name"])
            for s in self._paged("schemas", "schemas", f"catalog_name={quote(c['name'])}"):
                out.append(s["full_name"])
        if pattern:
            out = [n for n in out if pattern in n]
        return [Identifier.from_str(n) for n in sorted(out)]

    def drop_namespace(self, identifier) -> None:
        parts = list(_ident(identifier))
        if len(parts) == 1:
            self._http("DELETE", f"catalogs/{quote(parts[0])}")
        else:
            self._http("DELETE", f"schemas/{quote('.'.join(parts))}")

    # -- tables ----------------------------------------------------------------
    def list_tables(self, pattern: str | None = None) -> list[str]:
        """pattern narrows like the reference: no dot = catalog, one
        dot = catalog.schema (daft/catalog/__unity/_catalog.py:95)."""
        pairs: list[tuple[str, str]] = []
        if pattern and pattern.count(".") == 1:
            pairs = [tuple(pattern.split("."))]
        else:
            cats = (
                [pattern]
                if pattern and "." not in pattern
                else [c["name"] for c in self._paged("catalogs", "catalogs")]
            )
            for c in cats:
                try:
                    schemas = self._paged("schemas", "schemas", f"catalog_name={quote(c)}")
                except NotFoundError:
                    continue
                pairs.extend((c, s["name"]) for s in schemas)
        out: list[str] = []
        for cat, sch in pairs:
            try:
                tables = self._paged(
                    "tables", "tables",
                    f"catalog_name={quote(cat)}&schema_name={quote(sch)}",
                )
            except NotFoundError:
                continue
            out.extend(f"{t['catalog_name']}.{t['schema_name']}.{t['name']}" for t in tables)
        return sorted(out)

    def has_table(self, identifier) -> bool:
        try:
            self.table_info(identifier)
            return True
        except NotFoundError:
            return False

    def table_info(self, identifier) -> dict:
        """The spec's TableInfo for a 3-level identifier."""
        full = ".".join(_ident(identifier))
        if full.count(".") != 2:
            raise ValueError(f"Unity tables are catalog.schema.table: {identifier}")
        return self._get(f"tables/{quote(full)}")

    def get_table(self, identifier) -> Table:
        info = self.table_info(identifier)
        # two-step load, like the reference: retrieve -> temp credentials
        creds = self._http(
            "POST",
            "temporary-table-credentials",
            {"table_id": info["table_id"], "operation": "READ_WRITE"},
        )
        loc = creds.get("url") or info["storage_location"]
        full = ".".join(_ident(identifier))

        def _read():
            from daft_spark.context import get_or_create
            from daft_spark.io.delta import read_deltalake_py

            return read_deltalake_py(loc, get_or_create())

        def _write(df, mode="append"):
            from daft_spark.io.delta import write_deltalake_py

            write_deltalake_py(df, loc, mode=mode)

        return Table(full, _read, _write)

    def create_table(self, identifier, source, **properties) -> Table:
        from pyspark.sql import DataFrame as SparkDF

        from daft_spark.io.delta import write_deltalake_py
        from daft_spark.session import _is_wrapped_df

        if _is_wrapped_df(source):
            source = source.to_spark()
        if not isinstance(source, SparkDF):
            raise TypeError(f"cannot create a Unity table from {type(source)}")
        parts = list(_ident(identifier))
        if len(parts) != 3:
            raise ValueError(f"Unity tables are catalog.schema.table: {identifier}")
        info = self._http(
            "POST",
            "tables",
            {
                "catalog_name": parts[0],
                "schema_name": parts[1],
                "name": parts[2],
                "table_type": properties.get("table_type", "MANAGED"),
                "data_source_format": "DELTA",
                "columns": _uc_columns(source.schema),
                "storage_location": properties.get("storage_location"),
            },
        )
        write_deltalake_py(
            source, info["storage_location"],
            partition_by=properties.get("partition_by"),
        )
        return self.get_table(identifier)

    def create_table_if_not_exists(self, identifier, source, **properties) -> Table:
        if self.has_table(identifier):
            return self.get_table(identifier)
        return self.create_table(identifier, source, **properties)

    def drop_table(self, identifier) -> None:
        full = ".".join(_ident(identifier))
        self._http("DELETE", f"tables/{quote(full)}")

    def __repr__(self) -> str:
        return f"UnityRestCatalog(name={self.name!r}, endpoint={self._base!r})"
