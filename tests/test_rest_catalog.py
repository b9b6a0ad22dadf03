"""Iceberg REST-catalog publication client: spec-level request/response
tests against recorded fixtures (no network) — the wire sequence is
byte-asserted, mirroring how the reference deploys against a REST
catalog (testresources/CatalogRest.java runs apache/iceberg-rest-fixture
and points ``debezium.sink.iceberg.type=rest`` at it)."""

import json

import pytest

from debezium_server_iceberg_spark.lakehouse.rest_catalog import (
    AlreadyExistsError,
    NoSuchTableError,
    RestCatalogClient,
    RestCatalogError,
    publish_to_rest_catalog,
)


class RecordedTransport:
    """Replays canned (status, body) responses and records every request
    as (method, url, content-type, body-bytes)."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests = []

    def __call__(self, method, url, headers, body):
        self.requests.append(
            (method, url, headers.get("Content-Type"), body)
        )
        status, doc = self.responses.pop(0)
        return status, json.dumps(doc).encode() if doc is not None else b""


CONFIG_OK = (200, {"defaults": {}, "overrides": {"prefix": "w1"}})
CONFIG_NOPREFIX = (200, {"defaults": {}, "overrides": {}})


def test_publish_sequence_fresh_table_bytes():
    """Fresh publish: config handshake -> create namespace -> register.
    Exact bytes on the wire, spec-shaped bodies."""
    t = RecordedTransport(
        [
            CONFIG_OK,
            (200, {"namespace": ["cdc"], "properties": {}}),
            (200, {"metadata-location": "file:///wh/t/metadata/v1.metadata.json",
                   "metadata": {"table-uuid": "u"}}),
        ]
    )
    c = RestCatalogClient("http://cat:8181", transport=t)
    out = publish_to_rest_catalog(
        c, "cdc", "orders", "file:///wh/t/metadata/v1.metadata.json"
    )
    assert out["metadata-location"].endswith("v1.metadata.json")
    assert [(m, u) for m, u, _, _ in t.requests] == [
        ("GET", "http://cat:8181/v1/config"),
        ("POST", "http://cat:8181/v1/w1/namespaces"),
        ("POST", "http://cat:8181/v1/w1/namespaces/cdc/register"),
    ]
    # byte-exact spec bodies (sorted keys -> deterministic)
    assert t.requests[1][3] == b'{"namespace": ["cdc"], "properties": {}}'
    assert t.requests[2][3] == (
        b'{"metadata-location": "file:///wh/t/metadata/v1.metadata.json", '
        b'"name": "orders"}'
    )
    assert all(
        ct == "application/json" for _, _, ct, b in t.requests if b is not None
    )


def test_republish_drops_and_reregisters():
    """Re-publish: namespace 409 tolerated, register 409 -> drop (no
    purge — data stays on shared storage) -> register again."""
    t = RecordedTransport(
        [
            CONFIG_NOPREFIX,
            (409, {"error": {"message": "exists", "type":
                   "AlreadyExistsException", "code": 409}}),
            (409, {"error": {"message": "table exists", "type":
                   "AlreadyExistsException", "code": 409}}),
            (204, None),
            (200, {"metadata-location": "file:///wh/t/metadata/v2.metadata.json"}),
        ]
    )
    c = RestCatalogClient("http://cat:8181", transport=t)
    out = publish_to_rest_catalog(
        c, "cdc", "orders", "file:///wh/t/metadata/v2.metadata.json"
    )
    assert out["metadata-location"].endswith("v2.metadata.json")
    assert [(m, u) for m, u, _, _ in t.requests] == [
        ("GET", "http://cat:8181/v1/config"),
        ("POST", "http://cat:8181/v1/namespaces"),
        ("POST", "http://cat:8181/v1/namespaces/cdc/register"),
        ("DELETE", "http://cat:8181/v1/namespaces/cdc/tables/orders"),
        ("POST", "http://cat:8181/v1/namespaces/cdc/register"),
    ]
    # both register attempts carry the identical spec body
    assert t.requests[2][3] == t.requests[4][3]


def test_register_without_overwrite_propagates_conflict():
    t = RecordedTransport(
        [
            CONFIG_NOPREFIX,
            (409, {"error": {"message": "table exists", "type":
                   "AlreadyExistsException", "code": 409}}),
        ]
    )
    c = RestCatalogClient("http://cat:8181", transport=t)
    with pytest.raises(AlreadyExistsError):
        c.register_table("cdc", "orders", "file:///x/v1.metadata.json")


def test_error_model_mapping_and_auth_header():
    """404 -> NoSuchTable, bearer token on every request, multipart
    namespace uses the spec's %1F unit-separator path encoding, and the
    config handshake forwards the warehouse."""
    t = RecordedTransport(
        [
            CONFIG_OK,
            (404, {"error": {"message": "no table", "type":
                   "NoSuchTableException", "code": 404}}),
        ]
    )
    c = RestCatalogClient(
        "http://cat:8181/", token="tok123", warehouse="s3://wh", transport=t
    )
    with pytest.raises(NoSuchTableError):
        c.load_table("a.b", "t1")
    assert t.requests[0][1] == "http://cat:8181/v1/config?warehouse=s3%3A%2F%2Fwh"
    assert t.requests[1][1] == "http://cat:8181/v1/w1/namespaces/a%1Fb/tables/t1"
    # bearer token rides every request
    seen = []

    def spy(method, url, headers, body):
        seen.append(headers.get("Authorization"))
        return 200, json.dumps({"defaults": {}, "overrides": {}}).encode()

    RestCatalogClient("http://cat:8181", token="tok123", transport=spy)._p()
    assert seen == ["Bearer tok123"]


def test_unexpected_status_raises_generic_error():
    t = RecordedTransport([CONFIG_NOPREFIX, (503, None)])
    c = RestCatalogClient("http://cat:8181", transport=t)
    with pytest.raises(RestCatalogError) as ei:
        c.list_tables("cdc")
    assert ei.value.status == 503


def test_consumer_publish_registers_with_catalog(spark, warehouse, tmp_path):
    """End-to-end: consumer export + REST registration — the recorded
    transport sees the catalog adopt the EXACT metadata file the
    exporter wrote."""
    from fixtures import customer_event

    from debezium_server_iceberg_spark.config import EngineConfig
    from debezium_server_iceberg_spark.sources.debezium_json import (
        RAW_ENVELOPE_SCHEMA,
    )
    from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer

    cfg = EngineConfig()
    cfg.iceberg.warehouse = warehouse
    cfg.iceberg.namespace = "debeziumevents"
    c = ChangeConsumer(cfg)
    c.handle_batch(
        spark.createDataFrame(
            [customer_event(1, "a", op="c", ts_ms=1)], RAW_ENVELOPE_SCHEMA
        ),
        epoch_id=0,
    )
    (tbl,) = c.catalog.list_tables("debeziumevents")
    t = RecordedTransport(
        [
            CONFIG_NOPREFIX,
            (200, {"namespace": ["debeziumevents"]}),
            (200, {"metadata-location": "registered"}),
        ]
    )
    md = c.publish_iceberg(
        spark, tbl, str(tmp_path / "export"),
        rest_uri="http://cat:8181", rest_transport=t,
    )
    reg = json.loads(t.requests[2][3])
    assert reg["metadata-location"] == md  # the file export_iceberg wrote
    assert reg["name"] == tbl
    assert t.requests[1][3] == (
        b'{"namespace": ["debeziumevents"], "properties": {}}'
    )
