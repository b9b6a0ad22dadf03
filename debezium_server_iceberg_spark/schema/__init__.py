from .converter import DebeziumSchemaConverter, InferredSchema
from .evolution import merge_schemas, schema_added_fields

__all__ = [
    "DebeziumSchemaConverter",
    "InferredSchema",
    "merge_schemas",
    "schema_added_fields",
]
