from .debezium_json import (
    RAW_ENVELOPE_SCHEMA,
    infer_event_schema,
    parse_events,
    read_events_jsonl,
    read_events_stream,
    wire_struct,
)

__all__ = [
    "RAW_ENVELOPE_SCHEMA",
    "infer_event_schema",
    "parse_events",
    "read_events_jsonl",
    "read_events_stream",
    "wire_struct",
]
