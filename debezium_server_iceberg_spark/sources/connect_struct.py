"""Connect-Struct event format (operator S3).

The reference ingests two wire formats selected by ``debezium.format.value``:
JSON envelopes (JsonEventConverter) and Kafka-Connect ``Struct`` objects
(StructEventConverter.java:52-94 over StructSchemaConverter.java:330-438).
The Java code maintains two parallel converter implementations and keeps
them behaviorally identical by hand (every upsert test runs in both formats,
IcebergChangeConsumerUpsertTest.java:141-145).

Here the struct format is first-class but the parity is *by construction*:

- ``ConnectSchema`` models the in-memory Connect schema tree (type, logical
  name, parameters, nested fields — the ``SchemaBuilder`` surface).
- ``StructSchemaConverter`` renders that tree as the same schema *document*
  the JSON envelope embeds and delegates to ``DebeziumSchemaConverter`` —
  one type-mapping table serves both formats, so they cannot drift.
- Typed struct values (datetime/Decimal/bytes/dicts) are serialized to the
  wire envelope with schema-driven coercions mirroring the struct-specific
  half of AbstractEventConverter (datetime -> epoch by logical type,
  Decimal -> number-string, bytes -> base64), then the identical columnar
  ``from_json`` pipeline parses them — no second row-path to maintain.

Scale note: Connect structs are in-memory objects handed over by the
embedded engine on the driver (``handleBatch`` receives at most
``max.batch.size`` = 2048 of them, BatchConfig.java:16-18); the adapter
serializes one bounded batch to a DataFrame and every subsequent step is
distributed.  A firehose source at cluster scale arrives via Kafka as JSON
bytes and takes the other format by design.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
from dataclasses import dataclass, field as dc_field
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..schema.converter import (
    DebeziumSchemaConverter,
    InferredSchema,
    _DATE_INT,
    _DECIMAL,
    _TS_NTZ,
)
from .debezium_json import RAW_ENVELOPE_SCHEMA, parse_events


# --------------------------------------------------------------- schema model


@dataclass
class ConnectSchema:
    """One node of a Kafka-Connect schema tree (org.apache.kafka.connect.data
    .Schema re-modeled; SchemaBuilder builds these in the reference tests).

    ``type`` uses Connect's names: int8 int16 int32 int64 float32 float64
    boolean string bytes array map struct."""

    type: str
    name: str | None = None  # logical (semantic) type name
    optional: bool = True
    parameters: dict[str, str] | None = None
    fields: list[tuple[str, "ConnectSchema"]] = dc_field(default_factory=list)  # struct
    key_schema: "ConnectSchema | None" = None  # map keys
    value_schema: "ConnectSchema | None" = None  # map values / array elements

    # -- SchemaBuilder-style conveniences -------------------------------
    @staticmethod
    def struct(fields: list[tuple[str, "ConnectSchema"]], name: str | None = None,
               optional: bool = True) -> "ConnectSchema":
        return ConnectSchema("struct", name=name, optional=optional, fields=list(fields))

    @staticmethod
    def array(element: "ConnectSchema", optional: bool = True) -> "ConnectSchema":
        return ConnectSchema("array", optional=optional, value_schema=element)

    @staticmethod
    def map(keys: "ConnectSchema", values: "ConnectSchema", optional: bool = True) -> "ConnectSchema":
        return ConnectSchema("map", optional=optional, key_schema=keys, value_schema=values)

    @staticmethod
    def primitive(type_: str, name: str | None = None, optional: bool = True,
                  parameters: dict[str, str] | None = None) -> "ConnectSchema":
        return ConnectSchema(type_, name=name, optional=optional, parameters=parameters)


# Connect Schema.Type -> the type names used in embedded schema documents
# (the JSON envelope writes float32/float64 as "float"/"double")
_DOC_TYPES = {"float32": "float", "float64": "double"}


def schema_document(cs: ConnectSchema, field_name: str | None = None) -> dict[str, Any]:
    """Render a ConnectSchema node as the Debezium embedded-JSON schema
    document shape — the single input format of DebeziumSchemaConverter."""
    doc: dict[str, Any] = {
        "type": _DOC_TYPES.get(cs.type, cs.type),
        "optional": cs.optional,
    }
    if field_name is not None:
        doc["field"] = field_name
    if cs.name:
        doc["name"] = cs.name
    if cs.parameters:
        doc["parameters"] = dict(cs.parameters)
    if cs.type == "struct":
        doc["fields"] = [schema_document(s, n) for n, s in cs.fields]
    elif cs.type == "array":
        doc["items"] = schema_document(cs.value_schema or ConnectSchema("string"))
    elif cs.type == "map":
        doc["keys"] = schema_document(cs.key_schema or ConnectSchema("string"))
        doc["values"] = schema_document(cs.value_schema or ConnectSchema("string"))
    return doc


class StructSchemaConverter:
    """ConnectSchema -> InferredSchema (StructSchemaConverter.java:330-438).

    Delegates to the shared DebeziumSchemaConverter over the rendered schema
    documents: PK extraction from the key schema, column exclusion,
    __ts_ms forcing, map/array-PK rejection and the whole primitive/logical
    type table apply identically to both event formats."""

    def __init__(self, converter: DebeziumSchemaConverter | None = None) -> None:
        self.delegate = converter or DebeziumSchemaConverter()

    def convert(
        self,
        value_schema: ConnectSchema,
        key_schema: ConnectSchema | None = None,
    ) -> InferredSchema:
        return self.delegate.convert(
            schema_document(value_schema),
            schema_document(key_schema) if key_schema is not None else None,
        )


# --------------------------------------------------------------- event values


@dataclass
class StructEvent:
    """One change event in Connect-Struct form: typed Python values standing
    in for org.apache.kafka.connect.data.Struct (dict keyed by field name)."""

    destination: str
    key: dict[str, Any] | None
    value: dict[str, Any] | None
    key_schema: ConnectSchema | None
    value_schema: ConnectSchema


def _wire_value(cs: ConnectSchema, v: Any) -> Any:
    """Typed struct datum -> JSON-wire form (the struct half of
    AbstractEventConverter.java:86-361: Connect carries typed objects where
    the JSON envelope carries their wire encodings)."""
    if v is None:
        return None
    t, name = cs.type, cs.name or ""
    if t == "bytes":
        if name == _DECIMAL:
            # precise decimals: BigDecimal object -> number-string (one of
            # the two wire forms the parse layer decodes columnar)
            return str(v) if isinstance(v, (Decimal, int, float)) else v
        if isinstance(v, (bytes, bytearray)):
            return base64.b64encode(bytes(v)).decode()
        return v
    if isinstance(v, dt.datetime):
        # java.util.Date / typed temporals -> epoch per the logical type
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        if name in _TS_NTZ or t == "int64":
            if "Micro" in name:
                return int(v.timestamp() * 1_000_000)
            if "Nano" in name:
                return int(v.timestamp() * 1_000_000) * 1000
            return int(v.timestamp() * 1000)
        return v.isoformat()
    if isinstance(v, dt.date):
        if name in _DATE_INT:
            return (v - dt.date(1970, 1, 1)).days
        return v.isoformat()
    if t == "struct":
        return {n: _wire_value(s, v.get(n)) for n, s in cs.fields}
    if t == "array":
        el = cs.value_schema or ConnectSchema("string")
        return [_wire_value(el, x) for x in v]
    if t == "map":
        val = cs.value_schema or ConnectSchema("string")
        return {str(k): _wire_value(val, x) for k, x in v.items()}
    if isinstance(v, Decimal):
        return float(v)
    return v


def envelope_rows(events: list[StructEvent]) -> list[tuple[str, str | None, str | None]]:
    """Serialize struct events to raw envelope rows ``(destination, key,
    value)`` — the reference's StructEventConverter likewise serializes
    Structs through a JSON serde (StructEventConverter.java:49-50)."""
    rows = []
    for e in events:
        key_json = None
        if e.key is not None and e.key_schema is not None:
            key_json = json.dumps(
                {
                    "schema": schema_document(e.key_schema),
                    "payload": _wire_value(e.key_schema, e.key),
                }
            )
        value_json = None
        if e.value is not None:
            value_json = json.dumps(
                {
                    "schema": schema_document(e.value_schema),
                    "payload": _wire_value(e.value_schema, e.value),
                }
            )
        rows.append((e.destination, key_json, value_json))
    return rows


def struct_events_to_df(spark: SparkSession, events: list[StructEvent]) -> DataFrame:
    """One bounded engine batch of struct events -> raw envelope DataFrame
    (drop-in input for ChangeConsumer.handle_batch)."""
    return spark.createDataFrame(envelope_rows(events), RAW_ENVELOPE_SCHEMA)


def parse_struct_events(
    spark: SparkSession,
    events: list[StructEvent],
    converter: DebeziumSchemaConverter | None = None,
) -> tuple[DataFrame, InferredSchema]:
    """Struct batch -> typed rows + inferred schema in one call (schema from
    the first event, like table auto-create from a sample event)."""
    if not events:
        raise ValueError("empty struct event batch")
    sample = events[0]
    inferred = StructSchemaConverter(converter).convert(sample.value_schema, sample.key_schema)
    raw = struct_events_to_df(spark, events)
    return parse_events(raw, inferred), inferred
