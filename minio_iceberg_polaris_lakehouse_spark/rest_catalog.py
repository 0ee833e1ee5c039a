"""Loopback Iceberg REST catalog — Polaris-shaped server + client
(SURVEY §2.9 D12, previously scoped to session conf).

The reference deploys Apache Polaris and bootstraps it over two PUBLIC
HTTP APIs (setup-polaris.sh:17-75; setup-polaris.ps1:11-86):

1. **Polaris management API** — OAuth2 client-credentials token
   (`POST /api/catalog/v1/oauth/tokens`), then catalog CRUD
   (`POST/GET /api/management/v1/catalogs`) with a storage config.
2. **Iceberg REST catalog API** (the Apache Iceberg
   rest-catalog-open-api spec) — config, namespace and table CRUD,
   `loadTable` returning the current metadata location, and
   `commitTable` with *requirements* that make the commit a CAS on the
   metadata pointer (HTTP 409 on conflict).

This module implements both surfaces offline: a stdlib
ThreadingHTTPServer whose catalogs are backed by engine `Warehouse`
instances, and a stdlib-urllib `RestCatalogClient`. The division of
labor matches the real stack exactly (reference README.md architecture:
Spark reads/writes data files on MinIO directly; Polaris only arbitrates
table METADATA): data and metadata files move through the engine /
shared filesystem, while the catalog owns the current-metadata pointer
and serializes commits by compare-and-swap — the conditional-PUT
semantics the engine's commit-lock docstring names as the object-store
deployment story (warehouse.py `_acquire_commit_lock`).

Scale: the server holds no data-plane state — per table it stores one
pointer string; commit CAS is O(1) under one mutex (Polaris uses its
database transaction for the same). A 1000-executor job touches the
catalog twice per table (load + commit), never per file.
"""

from __future__ import annotations

import json
import os
import re
import secrets
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from minio_iceberg_polaris_lakehouse_spark import fsio
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


class CommitConflict(Exception):
    """Client-side image of the server's 409: the commit's requirements
    no longer hold (someone else moved the pointer first)."""


# --------------------------------------------------------------- server


class _CatalogState:
    """Server-side state: principals, tokens, catalogs, and the
    per-table metadata pointers the CAS commits arbitrate."""

    def __init__(self, root: str, client_id: str, client_secret: str):
        self.root = root
        self.client_id = client_id
        self.client_secret = client_secret
        self.tokens: set[str] = set()
        self.catalogs: dict[str, dict] = {}  # name -> {properties, storage, warehouse}
        # (catalog, ns, table) -> current metadata location; the ONE piece
        # of state the catalog owns in the real architecture
        self.pointers: dict[tuple[str, str, str], str] = {}
        # (catalog, ns, view) -> current view-metadata location
        self.view_pointers: dict[tuple[str, str, str], str] = {}
        self.lock = threading.Lock()

    def warehouse_for(self, catalog: str, spark) -> Warehouse:
        base = self.catalogs[catalog]["properties"].get(
            "default-base-location", os.path.join(self.root, catalog)
        )
        return Warehouse(spark, base)


class _Handler(BaseHTTPRequestHandler):
    state: _CatalogState  # injected by make_server

    # -- plumbing
    def log_message(self, *a):  # silence test output
        pass

    def _json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, msg: str, etype: str = "BadRequestException") -> None:
        # Iceberg REST error envelope (rest-catalog-open-api: ErrorModel)
        self._json(code, {"error": {"message": msg, "type": etype, "code": code}})

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        ctype = self.headers.get("Content-Type", "")
        if "x-www-form-urlencoded" in ctype:
            return {k: v[0] for k, v in urllib.parse.parse_qs(raw.decode()).items()}
        return json.loads(raw) if raw else {}

    def _authed(self) -> bool:
        auth = self.headers.get("Authorization", "")
        return auth.startswith("Bearer ") and auth[7:] in self.state.tokens

    # -- dispatch
    def do_POST(self):  # noqa: N802
        path = urllib.parse.urlparse(self.path).path
        if path == "/api/catalog/v1/oauth/tokens":
            return self._oauth_token()
        if not self._authed():
            return self._error(401, "missing or invalid bearer token", "NotAuthorizedException")
        if path == "/api/management/v1/catalogs":
            return self._create_catalog()
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces", path)
        if m:
            return self._create_namespace(m.group(1))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/tables", path)
        if m:
            return self._create_table(m.group(1), m.group(2))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/tables/rename", path)
        if m:
            return self._rename_table(m.group(1))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/tables/([^/]+)", path)
        if m:
            return self._commit_table(*m.groups())
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/transactions/commit", path)
        if m:
            return self._commit_transaction(m.group(1))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/views", path)
        if m:
            return self._create_view(m.group(1), m.group(2))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/views/([^/]+)", path)
        if m:
            return self._replace_view(*m.groups())
        self._error(404, f"no route for POST {path}", "NoSuchResourceException")

    def do_GET(self):  # noqa: N802
        path = urllib.parse.urlparse(self.path).path
        if not self._authed():
            return self._error(401, "missing or invalid bearer token", "NotAuthorizedException")
        if path == "/api/management/v1/catalogs":
            return self._json(
                200,
                {"catalogs": [
                    {"name": n, "type": "INTERNAL", "properties": c["properties"]}
                    for n, c in sorted(self.state.catalogs.items())
                ]},
            )
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/config", path)
        if m:
            return self._json(200, {"defaults": {}, "overrides": {"prefix": m.group(1)}})
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces", path)
        if m:
            return self._list_namespaces(m.group(1))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/tables", path)
        if m:
            return self._list_tables(m.group(1), m.group(2))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/tables/([^/]+)", path)
        if m:
            return self._load_table(*m.groups())
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/views", path)
        if m:
            return self._list_views(m.group(1), m.group(2))
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/views/([^/]+)", path)
        if m:
            return self._load_view(*m.groups())
        self._error(404, f"no route for GET {path}", "NoSuchResourceException")

    def do_DELETE(self):  # noqa: N802
        path = urllib.parse.urlparse(self.path).path
        if not self._authed():
            return self._error(401, "missing or invalid bearer token", "NotAuthorizedException")
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/tables/([^/]+)", path)
        if m:
            return self._drop_table(*m.groups())
        m = re.fullmatch(r"/api/catalog/v1/([^/]+)/namespaces/([^/]+)/views/([^/]+)", path)
        if m:
            return self._drop_view(*m.groups())
        self._error(404, f"no route for DELETE {path}", "NoSuchResourceException")

    # -- handlers
    def _oauth_token(self):
        """OAuth2 client-credentials → bearer token
        (setup-polaris.sh:17-21: grant_type/client_id/client_secret/scope)."""
        form = self._body()
        if (
            form.get("grant_type") != "client_credentials"
            or form.get("client_id") != self.state.client_id
            or form.get("client_secret") != self.state.client_secret
        ):
            return self._error(401, "invalid client credentials", "NotAuthorizedException")
        token = secrets.token_hex(16)
        self.state.tokens.add(token)
        self._json(
            200,
            {"access_token": token, "token_type": "bearer",
             "expires_in": 3600, "scope": form.get("scope", "")},
        )

    def _create_catalog(self):
        """POST /api/management/v1/catalogs (setup-polaris.sh:37-57)."""
        doc = self._body().get("catalog") or {}
        name = doc.get("name")
        if not name:
            return self._error(400, "catalog.name required")
        with self.state.lock:
            if name in self.state.catalogs:
                return self._error(409, f"catalog {name} exists", "AlreadyExistsException")
            self.state.catalogs[name] = {
                "properties": doc.get("properties", {}),
                "storage": doc.get("storageConfigInfo", {}),
            }
        self._json(201, {"catalog": {"name": name, "type": doc.get("type", "INTERNAL")}})

    def _wh(self, catalog: str) -> Warehouse | None:
        if catalog not in self.state.catalogs:
            self._error(404, f"no catalog {catalog}", "NoSuchCatalogException")
            return None
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession() or SparkSession._instantiatedSession
        return self.state.warehouse_for(catalog, spark)

    def _create_namespace(self, catalog: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        ns = ".".join(self._body().get("namespace", []))
        if not ns:
            return self._error(400, "namespace required")
        wh.create_namespace(ns)
        self._json(200, {"namespace": [ns], "properties": {}})

    def _list_namespaces(self, catalog: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        self._json(200, {"namespaces": [[n] for n in wh.list_namespaces()]})

    def _list_tables(self, catalog: str, ns: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        self._json(
            200,
            {"identifiers": [
                {"namespace": [ns], "name": t} for t in wh.list_tables(ns)
            ]},
        )

    def _metadata_location(self, tab) -> str:
        mdir = os.path.join(tab.path, "metadata")
        hint = os.path.join(mdir, "version-hint.text")
        if not fsio.isfile(hint):
            # a freshly created table has no commits yet; Iceberg's
            # createTable still answers with an initial metadata doc
            # (zero snapshots), so export one
            from minio_iceberg_polaris_lakehouse_spark.iceberg_export import (
                write_iceberg_metadata,
            )

            write_iceberg_metadata(tab)
        v = fsio.read_text(hint).strip()
        return os.path.join(mdir, f"v{v}.metadata.json")

    def _create_table(self, catalog: str, ns: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        doc = self._body()
        name = doc.get("name")
        schema = doc.get("schema")  # engine DDL string form
        if not name or not schema:
            return self._error(400, "name and schema required")
        # check + create under the catalog mutex: the server is threaded,
        # and two racing creates must produce one 200 and one 409, not an
        # unhandled warehouse error (creation is driver-side metadata
        # writes only, so holding the lock across it is cheap)
        with self.state.lock:
            if name in wh.list_tables(ns):
                return self._error(409, f"table {ns}.{name} exists", "AlreadyExistsException")
            tab = wh.create_table(ns, name, schema)
            loc = self._metadata_location(tab)
            self.state.pointers[(catalog, ns, name)] = loc
        self._json(200, self._table_response(loc))

    def _rename_table(self, catalog: str):
        """POST /v1/{prefix}/tables/rename (Iceberg REST spec
        renameTable): body {source: {namespace, name}, destination:
        {namespace, name}}. A pure catalog-identifier move — the engine's
        rename_table keeps the storage untouched — plus the CAS pointer
        key follows the identity so in-flight commitTable retries against
        the new name see the same pointer lineage. 204 on success."""
        wh = self._wh(catalog)
        if wh is None:
            return
        doc = self._body()
        src, dst = doc.get("source") or {}, doc.get("destination") or {}
        s_ns = ".".join(src.get("namespace") or [])
        d_ns = ".".join(dst.get("namespace") or [])
        s_name, d_name = src.get("name"), dst.get("name")
        if not (s_ns and s_name and d_ns and d_name):
            return self._error(400, "source and destination identifiers required")
        with self.state.lock:
            known = s_name in wh.list_tables(s_ns) or f"{s_ns}.{s_name}" in wh.foreign_tables()
            if not known:
                return self._error(
                    404, f"table {s_ns}.{s_name} does not exist", "NoSuchTableException"
                )
            try:
                wh.rename_table(s_ns, s_name, d_ns, d_name)
            except WarehouseError as e:
                return self._error(409, str(e), "AlreadyExistsException")
            ptr = self.state.pointers.pop((catalog, s_ns, s_name), None)
            if ptr is not None:
                self.state.pointers[(catalog, d_ns, d_name)] = ptr
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _table_response(self, loc: str) -> dict:
        return {
            "metadata-location": loc,
            "metadata": json.loads(fsio.read_text(loc)),
        }

    def _load_table(self, catalog: str, ns: str, name: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        key = (catalog, ns, name)
        # resolve AND lazily export under one critical section:
        # _metadata_location writes initial Iceberg metadata when
        # version-hint.text is absent (a warehouse-created table never
        # loaded before), and write_iceberg_metadata takes no commit
        # lock — two concurrent loadTable calls must not both run the
        # export and race on version numbering (same discipline as
        # _create_table)
        with self.state.lock:
            loc = self.state.pointers.get(key)
            if loc is None:
                if name not in wh.list_tables(ns):
                    return self._error(404, f"no table {ns}.{name}", "NoSuchTableException")
                loc = self._metadata_location(wh.table(ns, name))
                self.state.pointers[key] = loc
        self._json(200, self._table_response(loc))

    def _commit_table(self, catalog: str, ns: str, name: str):
        """commitTable: CAS on the metadata pointer. The client stages
        data+metadata on the shared filesystem (like Spark against
        Polaris), then asks the catalog to move the pointer iff its
        requirements still hold — 409 otherwise (the client re-loads and
        retries). Requirement supported: assert-metadata-location (the
        conditional-PUT form)."""
        doc = self._body()
        key = (catalog, ns, name)
        new_loc = doc.get("metadata-location")
        if not new_loc:
            return self._error(400, "metadata-location required")
        if not fsio.isfile(new_loc):
            return self._error(400, f"metadata file not found: {new_loc}")
        reqs = doc.get("requirements", [])
        with self.state.lock:
            cur = self.state.pointers.get(key)
            if cur is None:
                return self._error(404, f"no table {ns}.{name}", "NoSuchTableException")
            for r in reqs:
                if r.get("type") == "assert-metadata-location" and r.get("metadata-location") != cur:
                    return self._error(
                        409,
                        f"requirement failed: pointer moved to {cur}",
                        "CommitFailedException",
                    )
            self.state.pointers[key] = new_loc
        self._json(200, self._table_response(new_loc))

    def _commit_transaction(self, catalog: str):
        """commitTransaction (Iceberg REST spec POST
        /v1/{prefix}/transactions/commit): ONE request carrying several
        tables' pointer swaps, applied ALL-or-NOTHING under the catalog
        mutex — validate every change's requirements first, then swap
        every pointer; any failed requirement returns 409 with ZERO
        tables moved. This is the atomicity a filesystem catalog cannot
        give (transactions.py documents the read-skew window there):
        readers that resolve tables through the catalog can never see a
        half-committed transaction."""
        doc = self._body()
        changes = doc.get("table-changes", [])
        if not changes:
            return self._error(400, "table-changes required")
        staged: list[tuple[tuple[str, str, str], str]] = []
        seen_idents: set[tuple[str, str, str]] = set()
        for ch in changes:
            ident = ch.get("identifier") or {}
            ns = ident.get("namespace")
            ns = ".".join(ns) if isinstance(ns, list) else ns
            name = ident.get("name")
            new_loc = ch.get("metadata-location")
            if not (ns and name and new_loc):
                return self._error(
                    400, "each change needs identifier{namespace,name} + metadata-location"
                )
            if not fsio.isfile(new_loc):
                return self._error(400, f"metadata file not found: {new_loc}")
            key = (catalog, ns, name)
            if key in seen_idents:
                # two changes to one table in a single transaction: last
                # write would win silently, defeating the 409 contract —
                # reject loudly instead
                return self._error(
                    400, f"duplicate table {ns}.{name} in one commitTransaction"
                )
            seen_idents.add(key)
            staged.append((key, new_loc))
        with self.state.lock:
            # phase 1: validate EVERY requirement before touching anything
            for ch, (key, _loc) in zip(changes, staged):
                cur = self.state.pointers.get(key)
                if cur is None:
                    return self._error(
                        404, f"no table {key[1]}.{key[2]}", "NoSuchTableException"
                    )
                for r in ch.get("requirements", []):
                    rtype = r.get("type")
                    if rtype == "assert-metadata-location":
                        if r.get("metadata-location") != cur:
                            return self._error(
                                409,
                                f"requirement failed on {key[1]}.{key[2]}: "
                                f"pointer moved to {cur}",
                                "CommitFailedException",
                            )
                    else:
                        # an unrecognized requirement SILENTLY accepted
                        # would be a conflict check the client believes
                        # ran and the server never did
                        return self._error(
                            400,
                            f"unsupported requirement type {rtype!r} on "
                            f"{key[1]}.{key[2]} (this catalog validates "
                            "assert-metadata-location)",
                        )
            # phase 2: swap every pointer — still inside the mutex, so no
            # reader ever resolves a mix of old and new
            for key, new_loc in staged:
                self.state.pointers[key] = new_loc
        self._json(200, {"committed": len(staged)})

    # -- views (Iceberg REST view spec, the surface Polaris exposes) ------
    #
    # View metadata lives as a spec-shaped JSON document under the
    # warehouse (<ns>/<name>.view/metadata/vN.view-metadata.json); the
    # SQL representation is ALSO registered in the warehouse's view
    # registry, so a LakehouseSQL session bound to the same warehouse
    # can SELECT the view the moment the REST call returns — the same
    # division of labor as tables (catalog arbitrates metadata, engine
    # executes).

    def _view_dir(self, wh, ns: str, name: str) -> str:
        return os.path.join(wh.root, ns, f"{name}.view")

    @staticmethod
    def _view_sql(doc: dict) -> tuple[str, str]:
        """(sql, dialect) of the create/replace request body — accepts
        both the flat {sql, dialect} convenience form and the spec's
        {view-version: {representations: [{type: sql, ...}]}}."""
        if "sql" in doc:
            return doc["sql"], doc.get("dialect", "spark")
        reps = (doc.get("view-version") or {}).get("representations") or []
        for r in reps:
            if r.get("type") == "sql":
                return r["sql"], r.get("dialect", "spark")
        return "", ""

    def _write_view_metadata(
        self, vdir: str, prev: dict | None, sql: str, dialect: str, ns: str, props: dict
    ) -> str:
        import uuid as _uuid

        now = int(time.time() * 1000)
        if prev is None:
            vid, versions, log = 1, [], []
            vuuid = str(_uuid.uuid4())
        else:
            vid = prev["current-version-id"] + 1
            versions, log = prev["versions"], prev["version-log"]
            vuuid = prev["view-uuid"]
        versions = versions + [
            {
                "version-id": vid,
                "timestamp-ms": now,
                "schema-id": 0,
                "summary": {"engine-name": "lakehouse", "operation": "create" if prev is None else "replace"},
                "representations": [{"type": "sql", "sql": sql, "dialect": dialect}],
                "default-namespace": [ns],
            }
        ]
        doc = {
            "view-uuid": vuuid,
            "format-version": 1,
            "location": vdir,
            "current-version-id": vid,
            "versions": versions,
            "version-log": log + [{"timestamp-ms": now, "version-id": vid}],
            "schemas": [],
            "properties": props,
        }
        mdir = os.path.join(vdir, "metadata")
        fsio.makedirs(mdir, exist_ok=True)
        loc = os.path.join(mdir, f"v{vid}.view-metadata.json")
        fsio.write_bytes(loc, json.dumps(doc, indent=1).encode())
        fsio.write_bytes(os.path.join(mdir, "version-hint.text"), str(vid).encode())
        return loc

    def _view_response(self, loc: str) -> dict:
        return {"metadata-location": loc, "metadata": json.loads(fsio.read_text(loc))}

    def _create_view(self, catalog: str, ns: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        doc = self._body()
        name = doc.get("name")
        sql, dialect = self._view_sql(doc)
        if not name or not sql:
            return self._error(400, "name and a sql representation required")
        key = (catalog, ns, name)
        with self.state.lock:
            # the warehouse registry is the source of truth: an engine
            # session may have dropped the view since the pointer was
            # cached — purge rather than 409 on a ghost
            if f"{ns}.{name}" not in wh.views():
                self.state.view_pointers.pop(key, None)
            if f"{ns}.{name}" in wh.views():
                return self._error(409, f"view {ns}.{name} exists", "AlreadyExistsException")
            try:
                wh.create_view(ns, name, sql)
            except Exception as e:  # table/name collision etc.
                return self._error(409, str(e), "AlreadyExistsException")
            loc = self._write_view_metadata(
                self._view_dir(wh, ns, name), None, sql, dialect, ns, doc.get("properties", {})
            )
            self.state.view_pointers[key] = loc
        self._json(200, self._view_response(loc))

    def _list_views(self, catalog: str, ns: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        names = sorted(
            v.split(".", 1)[1] for v in wh.views() if v.split(".", 1)[0] == ns
        )
        self._json(200, {"identifiers": [{"namespace": [ns], "name": n} for n in names]})

    def _load_view(self, catalog: str, ns: str, name: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        key = (catalog, ns, name)
        with self.state.lock:
            # warehouse registry is the source of truth: serve ITS sql.
            # An engine-side CREATE OR REPLACE VIEW / DROP VIEW since the
            # pointer was cached must surface here, not stale metadata.
            sql = wh.views().get(f"{ns}.{name}")
            if sql is None:
                self.state.view_pointers.pop(key, None)
                return self._error(404, f"no view {ns}.{name}", "NoSuchViewException")
            loc = self.state.view_pointers.get(key)
            prev = json.loads(fsio.read_text(loc)) if loc and fsio.isfile(loc) else None
            cur_sql = None
            if prev is not None:
                cur_ver = next(
                    v for v in prev["versions"] if v["version-id"] == prev["current-version-id"]
                )
                cur_sql = next(
                    (r["sql"] for r in cur_ver["representations"] if r["type"] == "sql"), None
                )
            if prev is None or cur_sql != sql:
                # never exported, or the engine replaced the definition:
                # append/export a version reflecting the registry's sql
                loc = self._write_view_metadata(
                    self._view_dir(wh, ns, name), prev, sql, "spark", ns,
                    (prev or {}).get("properties", {}),
                )
                self.state.view_pointers[key] = loc
        self._json(200, self._view_response(loc))

    def _replace_view(self, catalog: str, ns: str, name: str):
        """replaceView (the spec's commit on a view): append a new
        version with the new SQL representation and advance
        current-version-id; the engine registry updates in the same
        critical section."""
        wh = self._wh(catalog)
        if wh is None:
            return
        doc = self._body()
        sql, dialect = self._view_sql(doc)
        if not sql:
            return self._error(400, "a sql representation is required")
        key = (catalog, ns, name)
        with self.state.lock:
            loc = self.state.view_pointers.get(key)
            if loc is None and f"{ns}.{name}" not in wh.views():
                return self._error(404, f"no view {ns}.{name}", "NoSuchViewException")
            prev = json.loads(fsio.read_text(loc)) if loc else None
            wh.create_view(ns, name, sql, replace=True)
            loc = self._write_view_metadata(
                self._view_dir(wh, ns, name), prev, sql, dialect, ns,
                doc.get("properties", (prev or {}).get("properties", {})),
            )
            self.state.view_pointers[key] = loc
        self._json(200, self._view_response(loc))

    def _drop_view(self, catalog: str, ns: str, name: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        if f"{ns}.{name}" not in wh.views():
            return self._error(404, f"no view {ns}.{name}", "NoSuchViewException")
        wh.drop_view(ns, name)
        with self.state.lock:
            self.state.view_pointers.pop((catalog, ns, name), None)
        vdir = self._view_dir(wh, ns, name)
        if fsio.isdir(vdir):
            fsio.rmtree(vdir)
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _drop_table(self, catalog: str, ns: str, name: str):
        wh = self._wh(catalog)
        if wh is None:
            return
        if name not in wh.list_tables(ns):
            return self._error(404, f"no table {ns}.{name}", "NoSuchTableException")
        wh.drop_table(ns, name)
        with self.state.lock:
            self.state.pointers.pop((catalog, ns, name), None)
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()


def make_server(
    root: str, client_id: str, client_secret: str, port: int = 0
) -> tuple[ThreadingHTTPServer, int]:
    """Start the loopback catalog on 127.0.0.1:port (0 = ephemeral);
    returns (server, bound_port). Call server.shutdown() when done."""
    state = _CatalogState(root, client_id, client_secret)
    handler = type("BoundHandler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


# --------------------------------------------------------------- client


class RestCatalogClient:
    """stdlib-urllib client for the two APIs, mirroring the reference's
    curl flow (setup-polaris.sh): token → create catalog → use the
    Iceberg REST surface. Commit is load → stage (engine-side) → CAS
    POST, with a bounded conflict-retry loop."""

    def __init__(self, base_url: str, client_id: str, client_secret: str):
        self.base = base_url.rstrip("/")
        form = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
                "scope": "PRINCIPAL_ROLE:ALL",
            }
        ).encode()
        tok = self._request(
            "POST",
            "/api/catalog/v1/oauth/tokens",
            data=form,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            auth=False,
        )
        self.token = tok["access_token"]

    def _request(
        self,
        method: str,
        path: str,
        data: bytes | None = None,
        headers: dict | None = None,
        auth: bool = True,
    ) -> dict:
        h = dict(headers or {})
        if auth:
            h["Authorization"] = f"Bearer {self.token}"
        req = urllib.request.Request(
            self.base + path, data=data, headers=h, method=method
        )
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else {}
        except urllib.error.HTTPError as e:
            payload = e.read().decode()
            try:
                err = json.loads(payload)["error"]
            except (ValueError, KeyError):
                err = {"message": payload, "type": "HTTPError"}
            if e.code == 409 and err.get("type") == "CommitFailedException":
                raise CommitConflict(err["message"]) from None
            raise RuntimeError(f"{e.code} {err.get('type')}: {err.get('message')}") from None

    def _post_json(self, path: str, obj: dict) -> dict:
        return self._request(
            "POST", path, json.dumps(obj).encode(), {"Content-Type": "application/json"}
        )

    # -- management API
    def create_catalog(self, name: str, base_location: str, allowed: str | None = None) -> dict:
        return self._post_json(
            "/api/management/v1/catalogs",
            {
                "catalog": {
                    "name": name,
                    "type": "INTERNAL",
                    "properties": {"default-base-location": base_location},
                    "storageConfigInfo": {
                        "storageType": "FILE",
                        "allowedLocations": [allowed or base_location + "/*"],
                    },
                }
            },
        )

    def list_catalogs(self) -> list[str]:
        return [c["name"] for c in self._request("GET", "/api/management/v1/catalogs")["catalogs"]]

    # -- iceberg REST catalog API
    def config(self, catalog: str) -> dict:
        return self._request("GET", f"/api/catalog/v1/{catalog}/config")

    def create_namespace(self, catalog: str, ns: str) -> dict:
        return self._post_json(f"/api/catalog/v1/{catalog}/namespaces", {"namespace": [ns]})

    def list_namespaces(self, catalog: str) -> list[str]:
        out = self._request("GET", f"/api/catalog/v1/{catalog}/namespaces")
        return [".".join(n) for n in out["namespaces"]]

    def create_table(self, catalog: str, ns: str, name: str, schema_ddl: str) -> dict:
        return self._post_json(
            f"/api/catalog/v1/{catalog}/namespaces/{ns}/tables",
            {"name": name, "schema": schema_ddl},
        )

    def list_tables(self, catalog: str, ns: str) -> list[str]:
        out = self._request("GET", f"/api/catalog/v1/{catalog}/namespaces/{ns}/tables")
        return [i["name"] for i in out["identifiers"]]

    def load_table(self, catalog: str, ns: str, name: str) -> dict:
        return self._request("GET", f"/api/catalog/v1/{catalog}/namespaces/{ns}/tables/{name}")

    def drop_table(self, catalog: str, ns: str, name: str) -> None:
        self._request("DELETE", f"/api/catalog/v1/{catalog}/namespaces/{ns}/tables/{name}")

    def rename_table(
        self, catalog: str, ns: str, name: str, new_ns: str, new_name: str
    ) -> None:
        """renameTable (Iceberg REST spec POST /v1/{prefix}/tables/rename)."""
        self._post_json(
            f"/api/catalog/v1/{catalog}/tables/rename",
            {
                "source": {"namespace": [ns], "name": name},
                "destination": {"namespace": [new_ns], "name": new_name},
            },
        )

    # -- views (Iceberg REST view spec) ----------------------------------

    def create_view(
        self, catalog: str, ns: str, name: str, sql: str, dialect: str = "spark"
    ) -> dict:
        return self._post_json(
            f"/api/catalog/v1/{catalog}/namespaces/{ns}/views",
            {
                "name": name,
                "view-version": {
                    "representations": [{"type": "sql", "sql": sql, "dialect": dialect}]
                },
            },
        )

    def list_views(self, catalog: str, ns: str) -> list[str]:
        out = self._request("GET", f"/api/catalog/v1/{catalog}/namespaces/{ns}/views")
        return [i["name"] for i in out["identifiers"]]

    def load_view(self, catalog: str, ns: str, name: str) -> dict:
        return self._request("GET", f"/api/catalog/v1/{catalog}/namespaces/{ns}/views/{name}")

    def replace_view(
        self, catalog: str, ns: str, name: str, sql: str, dialect: str = "spark"
    ) -> dict:
        return self._post_json(
            f"/api/catalog/v1/{catalog}/namespaces/{ns}/views/{name}",
            {
                "view-version": {
                    "representations": [{"type": "sql", "sql": sql, "dialect": dialect}]
                },
            },
        )

    def drop_view(self, catalog: str, ns: str, name: str) -> None:
        self._request("DELETE", f"/api/catalog/v1/{catalog}/namespaces/{ns}/views/{name}")

    def commit_table(
        self, catalog: str, ns: str, name: str, base_location: str, new_location: str
    ) -> dict:
        """One CAS attempt: move the pointer from base to new. Raises
        CommitConflict on 409."""
        return self._post_json(
            f"/api/catalog/v1/{catalog}/namespaces/{ns}/tables/{name}",
            {
                "requirements": [
                    {"type": "assert-metadata-location", "metadata-location": base_location}
                ],
                "updates": [],
                "metadata-location": new_location,
            },
        )

    def commit_transaction(
        self, catalog: str, changes: list[tuple[str, str, str, str]]
    ) -> dict:
        """Atomic multi-table commit (Iceberg REST commitTransaction).
        ``changes`` = [(ns, name, base_location, new_location), ...]; the
        catalog swaps EVERY pointer or none — CommitConflict if any
        table's pointer moved off its base."""
        return self._post_json(
            f"/api/catalog/v1/{catalog}/transactions/commit",
            {
                "table-changes": [
                    {
                        "identifier": {"namespace": [ns], "name": name},
                        "requirements": [
                            {
                                "type": "assert-metadata-location",
                                "metadata-location": base,
                            }
                        ],
                        "updates": [],
                        "metadata-location": new,
                    }
                    for ns, name, base, new in changes
                ]
            },
        )

    def commit_with_retry(
        self, catalog: str, ns: str, name: str, do_commit, max_attempts: int = 5
    ) -> dict:
        """The standard optimistic loop Iceberg clients run against a
        REST catalog: load current pointer → stage a commit on top of it
        (``do_commit(metadata)`` returns the NEW metadata location) →
        CAS; on conflict, re-load and re-stage."""
        for _ in range(max_attempts):
            cur = self.load_table(catalog, ns, name)
            new_loc = do_commit(cur)
            try:
                return self.commit_table(
                    catalog, ns, name, cur["metadata-location"], new_loc
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_attempts} attempts on {ns}.{name}")
