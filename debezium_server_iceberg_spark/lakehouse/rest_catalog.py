"""Iceberg REST-catalog publication client (spec-level, stdlib HTTP).

The reference's deployment story is CATALOG-REGISTERED tables: the sink
bootstraps an Iceberg catalog from config and every destination table is
created/loaded through it (IcebergChangeConsumer.java:100-102;
``debezium.sink.iceberg.type=rest`` + ``.uri`` in the REST variant —
testresources/CatalogRest.java:39-41 runs the stock
``apache/iceberg-rest-fixture`` image).  The engine's exporter
(``iceberg_export.export_iceberg_table``) already produces the standard
metadata chain on shared storage; what was missing is advertising that
metadata to a catalog service so ANY engine configured against the same
catalog resolves the table by name.  This module closes the gap with the
public Iceberg REST Catalog OpenAPI surface (apache/iceberg
``rest-catalog-open-api.yaml``) — exactly the subset a *publisher* needs:

- ``GET  /v1/config``                            → prefix/overrides
- ``GET  /v1/{prefix}/namespaces/{ns}``          → namespace existence
- ``POST /v1/{prefix}/namespaces``               → CreateNamespace
- ``POST /v1/{prefix}/namespaces/{ns}/register`` → RegisterTable
  (name + metadata-location: the catalog adopts an EXISTING metadata
  file — the spec's endpoint for externally-written tables, which is
  precisely what a filesystem publish produces)
- ``GET  /v1/{prefix}/namespaces/{ns}/tables/{t}``   → LoadTable
- ``DELETE /v1/{prefix}/namespaces/{ns}/tables/{t}`` → DropTable

Re-publishing bumps the metadata version on disk, so ``register_table``
with ``overwrite=True`` re-points the catalog via drop+register (the
spec has no "update metadata-location" shortcut for registered tables;
the full commit protocol is a catalog-OWNED-metadata concern and stays
out of scope for a publisher).

Transport is injectable (``transport(method, url, headers, body) ->
(status, body)``): production uses stdlib ``urllib`` — no third-party
HTTP dependency — and tests replay recorded request/response fixtures
offline, asserting the exact byte sequence on the wire.  No network is
touched at import or construction time except the one ``GET /v1/config``
the spec mandates before any other call (lazy, memoized).
"""

from __future__ import annotations

import json
from typing import Callable, Optional
from urllib import error as _urlerror
from urllib import parse as _urlparse
from urllib import request as _urlrequest

Transport = Callable[[str, str, dict, Optional[bytes]], tuple]


class RestCatalogError(RuntimeError):
    """Non-2xx catalog response, carrying the spec ErrorModel fields."""

    def __init__(self, status: int, message: str, error_type: str = ""):
        super().__init__(f"{status} {error_type}: {message}")
        self.status = status
        self.error_type = error_type
        self.message = message


class NoSuchNamespaceError(RestCatalogError):
    pass


class NoSuchTableError(RestCatalogError):
    pass


class AlreadyExistsError(RestCatalogError):
    pass


def _urllib_transport(
    method: str, url: str, headers: dict, body: bytes | None
) -> tuple:
    req = _urlrequest.Request(url, data=body, headers=headers, method=method)
    try:
        with _urlrequest.urlopen(req) as resp:
            return resp.status, resp.read()
    except _urlerror.HTTPError as e:  # non-2xx still carries an ErrorModel
        return e.code, e.read()


def _quote(part: str) -> str:
    return _urlparse.quote(part, safe="")


class RestCatalogClient:
    """Minimal spec-conformant client for table PUBLICATION.

    ``uri`` is the catalog root (e.g. ``http://catalog:8181``); ``token``
    adds the spec's ``Authorization: Bearer`` header; ``warehouse`` is
    forwarded as the ``warehouse`` query param on ``GET /v1/config``
    (multi-warehouse catalogs route the prefix on it)."""

    def __init__(
        self,
        uri: str,
        token: str | None = None,
        warehouse: str | None = None,
        transport: Transport | None = None,
    ) -> None:
        self.uri = uri.rstrip("/")
        self.token = token
        self.warehouse = warehouse
        self._transport = transport or _urllib_transport
        self._prefix: str | None = None  # resolved lazily from /v1/config

    # ------------------------------------------------------------ plumbing
    def _headers(self, has_body: bool) -> dict:
        h = {"Accept": "application/json"}
        if has_body:
            h["Content-Type"] = "application/json"
        if self.token:
            h["Authorization"] = f"Bearer {self.token}"
        return h

    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        payload = (
            json.dumps(body, sort_keys=True).encode("utf-8")
            if body is not None
            else None
        )
        status, raw = self._transport(
            method, f"{self.uri}{path}", self._headers(payload is not None), payload
        )
        doc = {}
        if raw:
            try:
                doc = json.loads(raw.decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                doc = {}
        if 200 <= status < 300:
            return doc
        err = doc.get("error", {}) if isinstance(doc, dict) else {}
        msg = err.get("message", raw.decode("utf-8", "replace")[:200] if raw else "")
        etype = err.get("type", "")
        cls = RestCatalogError
        if status == 404:
            cls = (
                NoSuchNamespaceError
                if "Namespace" in etype
                else NoSuchTableError
            )
        elif status == 409:
            cls = AlreadyExistsError
        raise cls(status, msg, etype)

    def _p(self) -> str:
        """Spec handshake: the first real call must be preceded by
        ``GET /v1/config``; its ``overrides.prefix`` (if any) is spliced
        into every subsequent path."""
        if self._prefix is None:
            q = f"?warehouse={_quote(self.warehouse)}" if self.warehouse else ""
            cfg = self._call("GET", f"/v1/config{q}")
            pref = {
                **cfg.get("defaults", {}),
                **cfg.get("overrides", {}),
            }.get("prefix", "")
            self._prefix = f"/{_quote(pref)}" if pref else ""
        return self._prefix

    # ------------------------------------------------------------- surface
    def create_namespace(
        self, namespace: str, properties: dict | None = None,
        exist_ok: bool = True,
    ) -> dict:
        """CreateNamespace; multipart names use the spec's unit-separator
        convention only on the PATH side — the body carries the list form."""
        try:
            return self._call(
                "POST",
                f"/v1{self._p()}/namespaces",
                {
                    "namespace": namespace.split("."),
                    "properties": properties or {},
                },
            )
        except AlreadyExistsError:
            if not exist_ok:
                raise
            return {"namespace": namespace.split(".")}

    def namespace_exists(self, namespace: str) -> bool:
        try:
            self._call("GET", f"/v1{self._p()}/namespaces/{self._ns(namespace)}")
            return True
        except NoSuchNamespaceError:
            return False

    def register_table(
        self,
        namespace: str,
        name: str,
        metadata_location: str,
        overwrite: bool = False,
    ) -> dict:
        """RegisterTable: point the catalog at an existing metadata file
        (the exporter's ``v{N}.metadata.json``).  ``overwrite=True``
        re-registers an already-known table (drop WITHOUT purge — the
        metadata/data stay on shared storage — then register), which is
        the re-publish path."""
        body = {"name": name, "metadata-location": metadata_location}
        try:
            return self._call(
                "POST",
                f"/v1{self._p()}/namespaces/{self._ns(namespace)}/register",
                body,
            )
        except AlreadyExistsError:
            if not overwrite:
                raise
            self.drop_table(namespace, name, purge=False)
            return self._call(
                "POST",
                f"/v1{self._p()}/namespaces/{self._ns(namespace)}/register",
                body,
            )

    def load_table(self, namespace: str, name: str) -> dict:
        """LoadTableResult: ``metadata-location`` + inline metadata."""
        return self._call(
            "GET",
            f"/v1{self._p()}/namespaces/{self._ns(namespace)}/tables/{_quote(name)}",
        )

    def table_exists(self, namespace: str, name: str) -> bool:
        try:
            self.load_table(namespace, name)
            return True
        except NoSuchTableError:
            return False

    def drop_table(self, namespace: str, name: str, purge: bool = False) -> None:
        purge_q = "?purgeRequested=true" if purge else ""
        self._call(
            "DELETE",
            f"/v1{self._p()}/namespaces/{self._ns(namespace)}/tables/"
            f"{_quote(name)}{purge_q}",
        )

    def list_tables(self, namespace: str) -> list[dict]:
        doc = self._call(
            "GET", f"/v1{self._p()}/namespaces/{self._ns(namespace)}/tables"
        )
        return doc.get("identifiers", [])

    @staticmethod
    def _ns(namespace: str) -> str:
        # multipart namespace path encoding: unit separator %1F (spec)
        return _quote("\x1f".join(namespace.split(".")))


def publish_to_rest_catalog(
    client: RestCatalogClient,
    namespace: str,
    name: str,
    metadata_location: str,
) -> dict:
    """The full publication sequence a sink runs after an export:
    ensure the namespace, then (re-)register the metadata file.
    Idempotent: re-running with the same metadata re-points the catalog
    at the identical location."""
    client.create_namespace(namespace, exist_ok=True)
    return client.register_table(
        namespace, name, metadata_location, overwrite=True
    )
