"""Debezium/Kafka-Connect schema JSON -> Spark StructType.

Re-expresses the reference's type mapping (JsonSchemaConverter.java:282-396,
StructSchemaConverter.java:330-438 — see SURVEY.md §1.2) for Spark's type
system.  Divergences, matching the survey's documented policy:

- UUID        -> StringType (Spark has no UUID type)
- TIME types  -> kept as long/string — the reference itself disables them
                 "not supported by spark" (JsonSchemaConverter.java:293-301)
- Variant     -> real Spark ``VariantType`` by default in variant mode
                 (``nested-as-variant``, IcebergConfig.java:102-104 —
                 reference v3 writes true Iceberg Variant,
                 JsonSchemaConverter.java:87-94): values land via
                 ``parse_json`` and are queried with ``variant_get``.
                 ``variant_as_json_string=True`` selects the legacy
                 JSON-text carrier (StringType) for engines that cannot
                 read parquet Variant.

The converter also extracts identifier (key) fields from the key schema
(JsonSchemaConverter.java:240-258), applies column exclusion
(JsonSchemaConverter.java:204-221), forces ``__ts_ms``/``__source_ts_ms``
int64 columns to timestamps (DebeziumConfig.java:18,
JsonSchemaConverter.java:305-307), and enforces the reference's PK rules
(no map/array keys, flattened events required when keys are present —
JsonSchemaConverter.java:111-141,240-253).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import types as T

# Debezium semantic-type names (logical types carried in "name")
_UUID = "io.debezium.data.Uuid"
_DATE_INT = ("io.debezium.time.Date", "org.apache.kafka.connect.data.Date")
_DATE_ISO = "io.debezium.time.IsoDate"
_TS_NTZ = (
    "io.debezium.time.Timestamp",
    "io.debezium.time.MicroTimestamp",
    "io.debezium.time.NanoTimestamp",
    "org.apache.kafka.connect.data.Timestamp",
)
_TS_ISO_NTZ = "io.debezium.time.IsoTimestamp"
_TS_ZONED = "io.debezium.time.ZonedTimestamp"
_DECIMAL = "org.apache.kafka.connect.data.Decimal"
_TIME_TYPES = (
    "io.debezium.time.Time",
    "io.debezium.time.MicroTime",
    "io.debezium.time.NanoTime",
    "io.debezium.time.ZonedTime",
    "io.debezium.time.IsoTime",
    "org.apache.kafka.connect.data.Time",
)


class SchemaConversionError(ValueError):
    pass


@dataclass
class InferredSchema:
    """Result of converting one event's (key, value) schema pair."""

    struct: T.StructType
    key_fields: list[str] = dc_field(default_factory=list)
    #: per-field semantic annotations needed by the value-normalization layer
    #: field name -> debezium semantic name (for temporal/decimal/uuid handling)
    semantics: dict[str, str] = dc_field(default_factory=dict)

    def is_keyed(self) -> bool:
        return bool(self.key_fields)


def _is_schema_change_event(value_schema_fields: list[dict]) -> bool:
    """DDL/schema-topic detection (JsonEventConverter.java:182-185)."""
    names = {f.get("field") for f in value_schema_fields}
    return {"ddl", "databaseName", "tableChanges"}.issubset(names)


class DebeziumSchemaConverter:
    """Converts one Debezium-JSON schema document to a Spark schema.

    Parameters mirror the reference's config surface: ``excluded_columns``
    (IcebergConfig.java:91-92), ``preserve_required_property``
    (IcebergConfig.java:98-100), ``decimal_handling_mode``
    (DebeziumConfig.java:28-30), ``ts_ms_columns`` (DebeziumConfig.java:18).
    """

    def __init__(
        self,
        excluded_columns: list[str] | None = None,
        preserve_required_property: bool = False,
        decimal_handling_mode: str = "double",
        ts_ms_columns: tuple[str, ...] = ("__ts_ms", "__source_ts_ms"),
        create_identifier_fields: bool = True,
        nested_as_variant: bool = False,
        variant_as_json_string: bool = False,
    ) -> None:
        self.excluded = set(excluded_columns or [])
        self.preserve_required = preserve_required_property
        self.decimal_mode = decimal_handling_mode
        self.ts_ms_columns = set(ts_ms_columns)
        self.create_identifier_fields = create_identifier_fields
        self.nested_as_variant = nested_as_variant
        self.variant_as_json_string = variant_as_json_string

    # ------------------------------------------------------------------ api

    def convert(
        self,
        value_schema: dict[str, Any],
        key_schema: dict[str, Any] | None = None,
    ) -> InferredSchema:
        if value_schema.get("type") != "struct":
            raise SchemaConversionError(
                f"top-level event schema must be a struct, got {value_schema.get('type')!r}"
            )
        vfields = value_schema.get("fields", [])

        key_fields: list[str] = []
        if key_schema is not None and self.create_identifier_fields:
            if not _is_schema_change_event(vfields):
                key_fields = [f["field"] for f in key_schema.get("fields", [])]

        # reference: unnested events + identifier fields -> hard error telling
        # the user to enable the unwrap SMT (JsonSchemaConverter.java:240-253)
        if key_fields:
            names = {f.get("field") for f in vfields}
            if {"before", "after", "source"}.issubset(names):
                raise SchemaConversionError(
                    "events are unnested (no unwrap SMT) but identifier fields "
                    "are requested; enable the unwrap transform or disable "
                    "create_identifier_fields"
                )
            missing = [k for k in key_fields if k not in names]
            if missing:
                raise SchemaConversionError(
                    f"key fields {missing} not present in value schema"
                )

        semantics: dict[str, str] = {}
        out_fields: list[T.StructField] = []
        for f in vfields:
            name = f["field"]
            if name in self.excluded:
                # column exclusion (JsonSchemaConverter.java:204-221)
                continue
            if self.nested_as_variant and f.get("type") in ("struct", "map", "array"):
                # variant mode: nested values become Spark VariantType by
                # default (the reference maps them to Iceberg VariantType,
                # format v3 — JsonSchemaConverter.java:87-94, value
                # conversion JsonVariantObject.java:44-120); queried with
                # variant_get / to_json, stored natively in parquet.
                # variant_as_json_string keeps the legacy JSON-text carrier
                # for downstream engines without parquet-Variant support.
                if self.variant_as_json_string:
                    semantics[name] = "variant_json"
                    out_fields.append(T.StructField(name, T.StringType(), True))
                else:
                    semantics[name] = "variant"
                    out_fields.append(T.StructField(name, T.VariantType(), True))
                continue
            dtype = self._field_type(f, top_level_name=name, semantics=semantics)
            is_key = name in key_fields
            if is_key and isinstance(dtype, (T.MapType, T.ArrayType)):
                # PKs on map/array rejected (JsonSchemaConverter.java:111-141)
                raise SchemaConversionError(
                    f"identifier field {name!r} has non-primitive type {dtype}"
                )
            if self.preserve_required:
                nullable = bool(f.get("optional", True)) and not is_key
            else:
                # default: everything optional except PK columns
                # (JsonSchemaConverter.java:83-84)
                nullable = not is_key
            out_fields.append(T.StructField(name, dtype, nullable))

        return InferredSchema(T.StructType(out_fields), key_fields, semantics)

    # ------------------------------------------------------------ internals

    def _field_type(
        self, f: dict[str, Any], top_level_name: str | None, semantics: dict[str, str]
    ) -> T.DataType:
        ftype = f.get("type")
        name = f.get("name", "")
        params = f.get("parameters") or {}

        # semantic (logical) types first — mirrors the switch at
        # JsonSchemaConverter.java:287-346
        if name:
            if name == _UUID:
                if top_level_name:
                    semantics[top_level_name] = "uuid"
                return T.StringType()
            if name in _DATE_INT:
                if top_level_name:
                    semantics[top_level_name] = "date_days"
                return T.DateType()
            if name == _DATE_ISO:
                if top_level_name:
                    semantics[top_level_name] = "date_iso"
                return T.DateType()
            if name in _TS_NTZ:
                if top_level_name:
                    semantics[top_level_name] = {
                        "io.debezium.time.Timestamp": "ts_millis",
                        "io.debezium.time.MicroTimestamp": "ts_micros",
                        "io.debezium.time.NanoTimestamp": "ts_nanos",
                        "org.apache.kafka.connect.data.Timestamp": "ts_millis",
                    }[name]
                return T.TimestampNTZType()
            if name == _TS_ISO_NTZ:
                if top_level_name:
                    semantics[top_level_name] = "ts_iso"
                return T.TimestampNTZType()
            if name == _TS_ZONED:
                if top_level_name:
                    semantics[top_level_name] = "ts_zoned_iso"
                return T.TimestampType()
            if name == _DECIMAL:
                return self._decimal_type(params, top_level_name, semantics)
            if name in _TIME_TYPES:
                # deliberately NOT mapped to a time type — reference policy
                # (JsonSchemaConverter.java:293-301,316-324,342-344)
                return T.LongType() if ftype in ("int32", "int64") else T.StringType()

        # __ts_ms / __source_ts_ms int64 -> timestamptz
        # (DebeziumConfig.java:18, JsonSchemaConverter.java:305-307)
        if ftype == "int64" and top_level_name in self.ts_ms_columns:
            semantics[top_level_name] = "ts_millis_tz"
            return T.TimestampType()

        if ftype in ("int8", "int16", "int32"):
            return T.IntegerType()
        if ftype == "int64":
            return T.LongType()
        if ftype in ("float8", "float16", "float32", "float"):
            return T.FloatType()
        if ftype in ("float64", "double"):
            return T.DoubleType()
        if ftype == "boolean":
            return T.BooleanType()
        if ftype == "string":
            return T.StringType()
        if ftype == "bytes":
            if top_level_name:
                semantics[top_level_name] = "binary_b64"
            return T.BinaryType()
        if ftype == "struct":
            sub = [
                T.StructField(
                    sf["field"],
                    self._field_type(sf, top_level_name=None, semantics=semantics),
                    True,
                )
                for sf in f.get("fields", [])
            ]
            return T.StructType(sub)
        if ftype == "array":
            items = f.get("items") or {"type": "string"}
            return T.ArrayType(
                self._field_type(items, top_level_name=None, semantics=semantics), True
            )
        if ftype == "map":
            keys = f.get("keys") or {"type": "string"}
            values = f.get("values") or {"type": "string"}
            if keys.get("type") in ("struct", "map", "array"):
                # nested map keys rejected (JsonSchemaConverter.java:110-134)
                raise SchemaConversionError("map keys must be primitive")
            return T.MapType(
                self._field_type(keys, top_level_name=None, semantics=semantics),
                self._field_type(values, top_level_name=None, semantics=semantics),
                True,
            )
        # unknown -> string with the reference's fallback policy
        # (JsonSchemaConverter.java:386-392)
        return T.StringType()

    def _decimal_type(
        self, params: dict, top_level_name: str | None, semantics: dict[str, str]
    ) -> T.DataType:
        if self.decimal_mode == "double":
            # the wire value is still a number-string or base64 bytes
            # (AbstractEventConverter.java:86-104 then .doubleValue()) — mark
            # it so the parse layer decodes before casting to double
            if top_level_name:
                scale = int(params.get("scale", 10) or 10)
                semantics[top_level_name] = f"decimal_dbl:{scale}"
            return T.DoubleType()
        if self.decimal_mode == "string":
            return T.StringType()
        # precise mode: precision/scale from connect params, default (38,10),
        # validated (JsonSchemaConverter.java:353-384)
        try:
            scale = int(params.get("scale", 10))
            precision = int(
                params.get("connect.decimal.precision", params.get("precision", 38))
            )
        except (TypeError, ValueError):
            precision, scale = 38, 10
        if not (0 < precision <= 38) or not (0 <= scale <= precision):
            precision, scale = 38, 10
        if top_level_name:
            semantics[top_level_name] = f"decimal_b64:{precision}:{scale}"
        return T.DecimalType(precision, scale)
