"""Apache Gravitino REST — protocol client + in-process HTTP server.

The reference's ``Catalog.from_gravitino`` (daft/catalog/__init__.py:271)
speaks the Gravitino REST API through
``daft/catalog/__gravitino/_client.py``: every call is a GET under
``{endpoint}/api/metalakes/{metalake}/...`` —

- ``/catalogs``                                  list  -> ``{"identifiers": [{"name": ...}]}``
- ``/catalogs/{c}``                              load  -> ``{"catalog": {name, type, provider, properties}}``
- ``/catalogs/{c}/schemas``                      list  -> identifiers
- ``/catalogs/{c}/schemas/{s}/tables``           list  -> identifiers
- ``/catalogs/{c}/schemas/{s}/tables/{t}``       load  -> ``{"table": {name, provider, properties, storageLocations}}``
- ``/catalogs/{c}/schemas/{s}/filesets/{f}``     load  -> ``{"fileset": {...}}``

with simple auth (``X-Gravitino-User`` header, or HTTP basic when a
password is set) or OAuth2 bearer tokens (reference _client.py:111-119),
Gravitino-1.0 ``storageLocations`` maps resolved through the
``default-location-name`` property (reference _client.py:255-264), the
``file:/`` -> ``file:///`` URL repair (reference _client.py:272), and
table format dispatch ICEBERG / PARQUET (reference _catalog.py
GravitinoIcebergTable/GravitinoParquetTable). This module implements the
same wire contract on both sides so the protocol is exercised without an
external Gravitino deployment:

- ``GravitinoServer`` — a ThreadingHTTPServer over a filesystem metalake
  ``<root>/<catalog>/<schema>/<table>`` where a table directory holding
  ``metadata/`` serves as ICEBERG and one holding parquet files as
  PARQUET; responses use the 1.0 ``storageLocations`` shape with
  single-slash ``file:/`` URLs (what the real server emits and the
  client must repair).
- ``GravitinoRestCatalog`` — a read-only Catalog whose every operation
  is an HTTP round-trip (urllib, stdlib-only). Like the reference
  adapter, create/drop raise (the Gravitino adapter is read-only:
  reference _catalog.py:55-74).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlsplit

from pyspark.sql import DataFrame, SparkSession

from daft_spark.session import Catalog, Identifier, NotFoundError, Table, _ident

# ---------------------------------------------------------------------------
# server


class _Handler(BaseHTTPRequestHandler):
    server_version = "GravitinoFake/1.0"

    def log_message(self, fmt, *args):
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authed(self) -> bool:
        srv = self.server  # type: ignore[assignment]
        if srv._token is not None:
            return self.headers.get("Authorization") == f"Bearer {srv._token}"
        if srv._username is not None:
            # simple auth: X-Gravitino-User header (reference
            # _client.py:116) or HTTP basic when a password is set
            if self.headers.get("X-Gravitino-User") == srv._username:
                return True
            auth = self.headers.get("Authorization", "")
            if auth.startswith("Basic "):
                import base64

                try:
                    user, _, pw = (
                        base64.b64decode(auth[6:]).decode().partition(":")
                    )
                except Exception:
                    return False
                return user == srv._username and pw == (srv._password or "")
            return False
        return True

    def do_GET(self):  # noqa: N802
        srv = self.server
        if not self._authed():
            self._send(401, {"code": 1003, "message": "unauthorized"})
            return
        parts = [unquote(p) for p in urlsplit(self.path).path.split("/") if p]
        # decoded segments become filesystem path components below —
        # reject traversal ('..', '%2e%2e') and separator smuggling
        # ('%2f', '%5c') so no request escapes the metalake root
        if any(
            seg in (".", "..") or "/" in seg or "\\" in seg or os.sep in seg
            for seg in parts
        ):
            self._send(400, {"code": 1001, "message": "illegal path segment"})
            return
        # /api/metalakes/{ml}/catalogs[/{c}[/schemas[/{s}/(tables|filesets)[/{t}]]]]
        if len(parts) < 3 or parts[0] != "api" or parts[1] != "metalakes":
            self._send(404, {"code": 1002, "message": "no such route"})
            return
        if parts[2] != srv._metalake:
            self._send(404, {"code": 1002, "message": f"metalake {parts[2]} not found"})
            return
        rest = parts[3:]
        root = srv._root
        if rest == ["catalogs"]:
            names = sorted(
                d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))
            )
            self._send(200, {"identifiers": [{"name": n} for n in names]})
            return
        if len(rest) >= 2 and rest[0] == "catalogs":
            cat = rest[1]
            cat_dir = os.path.join(root, cat)
            if not os.path.isdir(cat_dir):
                self._send(404, {"code": 1002, "message": f"catalog {cat} not found"})
                return
            if len(rest) == 2:
                self._send(
                    200,
                    {
                        "catalog": {
                            "name": cat,
                            "type": "relational",
                            "provider": srv._providers.get(cat, "lakehouse-iceberg"),
                            "properties": {"location": f"file:{cat_dir}"},
                        }
                    },
                )
                return
            if rest[2] != "schemas":
                self._send(404, {"code": 1002, "message": "no such route"})
                return
            if len(rest) == 3:
                names = sorted(
                    d for d in os.listdir(cat_dir)
                    if os.path.isdir(os.path.join(cat_dir, d))
                )
                self._send(200, {"identifiers": [{"name": n} for n in names]})
                return
            sch = rest[3]
            sch_dir = os.path.join(cat_dir, sch)
            if not os.path.isdir(sch_dir):
                self._send(404, {"code": 1002, "message": f"schema {sch} not found"})
                return
            if len(rest) == 5 and rest[4] in ("tables", "filesets"):
                names = sorted(
                    d for d in os.listdir(sch_dir)
                    if os.path.isdir(os.path.join(sch_dir, d))
                )
                self._send(200, {"identifiers": [{"name": n} for n in names]})
                return
            if len(rest) == 6 and rest[4] in ("tables", "filesets"):
                tbl = rest[5]
                tbl_dir = os.path.join(sch_dir, tbl)
                if not os.path.isdir(tbl_dir):
                    self._send(
                        404, {"code": 1002, "message": f"table {tbl} not found"}
                    )
                    return
                fmt = (
                    "ICEBERG"
                    if os.path.isdir(os.path.join(tbl_dir, "metadata"))
                    else "PARQUET"
                )
                # 1.0 storageLocations shape with the single-slash
                # file:/ URL the real server emits (client repairs it)
                entity = {
                    "name": tbl,
                    "provider": srv._providers.get(cat, "lakehouse-iceberg"),
                    "properties": {
                        "format": fmt,
                        "default-location-name": "default",
                    },
                    "storageLocations": {"default": f"file:{tbl_dir}"},
                }
                if rest[4] == "filesets":
                    entity["type"] = "EXTERNAL"
                    self._send(200, {"fileset": entity})
                else:
                    self._send(200, {"table": entity})
                return
        self._send(404, {"code": 1002, "message": "no such route"})


class GravitinoServer:
    """In-process Gravitino REST server over a filesystem metalake
    (``<root>/<catalog>/<schema>/<table>``)."""

    def __init__(self, root: str, metalake: str, *, token: str | None = None,
                 username: str | None = None, password: str | None = None,
                 providers: dict[str, str] | None = None):
        os.makedirs(root, exist_ok=True)
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd._root = os.path.abspath(root)
        self._httpd._metalake = metalake
        self._httpd._token = token
        self._httpd._username = username
        self._httpd._password = password
        self._httpd._providers = providers or {}
        self._thread: threading.Thread | None = None

    @property
    def uri(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def start(self) -> "GravitinoServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "GravitinoServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


# ---------------------------------------------------------------------------
# client


class GravitinoTableNotFoundError(NotFoundError):
    pass


class GravitinoRestCatalog(Catalog):
    """The reference GravitinoCatalog over stdlib HTTP (reference
    client daft/catalog/__gravitino/_client.py, adapter _catalog.py).
    Read-only, like the reference adapter: create/drop raise."""

    def __init__(self, endpoint: str, metalake_name: str, *,
                 auth_type: str = "simple", username: str | None = None,
                 password: str | None = None, token: str | None = None):
        if auth_type not in ("simple", "oauth2"):
            raise ValueError(f"auth_type must be 'simple' or 'oauth2', got {auth_type!r}")
        self._endpoint = endpoint.rstrip("/")
        self._metalake = metalake_name
        self._auth_type = auth_type
        self._username = username
        self._password = password
        self._token = token
        # reference GravitinoCatalog.name (_catalog.py:34)
        self.name = f"gravitino_{metalake_name}"

    # -- wire --------------------------------------------------------------
    def _request(self, path: str) -> dict:
        import urllib.error
        import urllib.request

        url = f"{self._endpoint}/api{path}"
        req = urllib.request.Request(url, method="GET")
        if self._auth_type == "simple" and self._username:
            if self._password:
                import base64

                cred = base64.b64encode(
                    f"{self._username}:{self._password}".encode()
                ).decode()
                req.add_header("Authorization", f"Basic {cred}")
            else:
                req.add_header("X-Gravitino-User", self._username)
        elif self._auth_type == "oauth2" and self._token:
            req.add_header("Authorization", f"Bearer {self._token}")
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            raise _HttpError(e.code, detail) from None

    # -- protocol ----------------------------------------------------------
    def list_catalogs(self) -> list[str]:
        resp = self._request(f"/metalakes/{self._metalake}/catalogs")
        return [i["name"] for i in resp.get("identifiers", []) if i.get("name")]

    def load_catalog(self, catalog_name: str) -> dict:
        try:
            resp = self._request(
                f"/metalakes/{self._metalake}/catalogs/{catalog_name}"
            )
        except _HttpError as e:
            if e.code == 404:
                raise NotFoundError(f"Catalog {catalog_name} not found") from None
            raise
        return resp.get("catalog", {})

    def _load_entity(self, kind: str, full_name: str) -> dict:
        parts = full_name.split(".")
        if len(parts) != 3:
            raise ValueError(
                f"Expected name format 'catalog.schema.{kind[:-1]}', got: {full_name}"
            )
        c, s, t = parts
        try:
            resp = self._request(
                f"/metalakes/{self._metalake}/catalogs/{c}/schemas/{s}/{kind}/{t}"
            )
        except _HttpError as e:
            if e.code == 404:
                raise GravitinoTableNotFoundError(
                    f"{kind[:-1].capitalize()} {full_name} not found"
                ) from None
            raise
        data = resp.get(kind[:-1] if kind != "tables" else "table", {})
        if kind == "filesets":
            data = resp.get("fileset", {})
        locations = data.get("storageLocations", {})
        props = data.get("properties", {})
        if locations:
            # default-location-name resolution (reference _client.py:255)
            loc = locations.get(props.get("default-location-name", "default"), "")
            if not loc:
                loc = next(iter(locations.values()))
        else:
            loc = props.get("location", "")
        # file:/ -> file:/// repair (reference _client.py:271)
        if loc.startswith("file:/") and not loc.startswith("file:///"):
            loc = loc.replace("file:/", "file:///", 1)
        cat_info = self.load_catalog(parts[0])
        merged = dict(cat_info.get("properties", {}))
        merged.update(props)
        return {
            "name": data.get("name", t),
            "catalog": c,
            "schema": s,
            "provider": data.get("provider") or cat_info.get("provider", ""),
            "format": props.get("format", "ICEBERG"),
            "storage_location": loc,
            "properties": merged,
        }

    def load_table(self, table_name: str) -> dict:
        return self._load_entity("tables", table_name)

    def load_fileset(self, fileset_name: str) -> dict:
        return self._load_entity("filesets", fileset_name)

    # -- Catalog interface -------------------------------------------------
    def create_namespace(self, identifier) -> None:
        raise NotImplementedError("Gravitino create_namespace not yet supported.")

    def create_table(self, identifier, source, **properties) -> Table:
        raise NotImplementedError("Gravitino create_table not yet supported.")

    def drop_namespace(self, identifier) -> None:
        raise NotImplementedError("Gravitino drop_namespace not yet supported.")

    def drop_table(self, identifier) -> None:
        raise NotImplementedError("Gravitino drop_table not yet supported.")

    def get_table(self, identifier) -> Table:
        info = self.load_table(str(_ident(identifier)))
        return _gravitino_table(info)

    def has_namespace(self, identifier) -> bool:
        # reference _has_namespace (_catalog.py:127): 2-part only
        ident = _ident(identifier)
        if len(ident) != 2:
            return False
        return str(ident) in self.list_namespaces_str(ident[0])

    def has_table(self, identifier) -> bool:
        try:
            self.load_table(str(_ident(identifier)))
            return True
        except (GravitinoTableNotFoundError, NotFoundError, ValueError):
            return False

    def list_namespaces_str(self, catalog_name: str) -> list[str]:
        try:
            resp = self._request(
                f"/metalakes/{self._metalake}/catalogs/{catalog_name}/schemas"
            )
        except _HttpError as e:
            # the reference client catches list failures, warns, and
            # returns [] so has_namespace stays non-raising for a
            # missing catalog (the server 404s the /schemas route)
            import warnings

            warnings.warn(
                f"failed to list schemas of catalog {catalog_name!r}: {e}",
                stacklevel=2,
            )
            return []
        return [
            f"{catalog_name}.{i['name']}"
            for i in resp.get("identifiers", [])
            if i.get("name")
        ]

    def list_namespaces(self, pattern: str | None = None) -> list[Identifier]:
        # reference _list_namespaces (_catalog.py:93): no pattern ->
        # all catalogs; pattern names one catalog
        if not pattern:
            return [
                Identifier.from_str(ns)
                for cat in self.list_catalogs()
                for ns in self.list_namespaces_str(cat)
            ]
        return [Identifier.from_str(ns) for ns in self.list_namespaces_str(pattern)]

    def list_tables(self, pattern: str | None = None) -> list[str]:
        # reference _list_tables (_catalog.py:101): 0 dots -> catalog,
        # 1 dot -> catalog.schema, none -> everything
        def tables_in(ns: str) -> list[str]:
            c, s = ns.split(".")
            resp = self._request(
                f"/metalakes/{self._metalake}/catalogs/{c}/schemas/{s}/tables"
            )
            return [
                f"{ns}.{i['name']}"
                for i in resp.get("identifiers", [])
                if i.get("name")
            ]

        if not pattern:
            return [
                t
                for cat in self.list_catalogs()
                for ns in self.list_namespaces_str(cat)
                for t in tables_in(ns)
            ]
        dots = pattern.count(".")
        if dots == 0:
            return [t for ns in self.list_namespaces_str(pattern) for t in tables_in(ns)]
        if dots == 1:
            return tables_in(pattern)
        raise ValueError(
            "Unrecognized catalog name or namespace name, expected a "
            f"'.'-separated namespace but received: {pattern}"
        )


class _HttpError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(f"HTTP {code}: {message}")
        self.code = code


def _gravitino_table(info: dict) -> Table:
    """Format dispatch, reference _catalog.py GravitinoTable._from_obj:
    ICEBERG -> the Iceberg scan, PARQUET -> a parquet read; anything
    else is unsupported."""
    loc = info["storage_location"]
    path = loc[len("file://"):] if loc.startswith("file://") else loc
    fmt = (info.get("format") or "").upper()

    def _read() -> DataFrame:
        from daft_spark.context import get_or_create

        spark = SparkSession.getActiveSession() or get_or_create()
        if fmt.startswith("ICEBERG"):
            from daft_spark.io.iceberg import read_iceberg_py

            return read_iceberg_py(path, spark)
        if fmt.startswith("PARQUET"):
            return spark.read.parquet(path)
        raise ValueError(
            f"Unsupported Gravitino table format: {info.get('format')!r} "
            f"(table_type={info.get('provider')!r})"
        )

    name = f"{info['catalog']}.{info['schema']}.{info['name']}"
    return Table(name, _read)  # read-only, like the reference adapter
