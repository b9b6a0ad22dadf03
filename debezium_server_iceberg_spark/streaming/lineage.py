"""OpenLineage emission (operator W16).

The reference emits an OpenLineage event after each successful commit:
dataset name + output kind + field definitions, failure non-critical
(tableoperator/IcebergTableOperator.java:242-285).  Here the emitter builds
standard OpenLineage 1.x ``RunEvent`` JSON documents (the public spec at
openlineage.io/spec) with the ``schema`` dataset facet, and ships them over
a pluggable transport: a JSONL file sink (always available, queryable — in
keeping with this engine's files-first state stores) or an HTTP POST
endpoint (stdlib urllib, no client dependency).  Emission errors never fail
the batch — same policy as the reference's catch-and-debug.
"""

from __future__ import annotations

import datetime as _dt
import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T

PRODUCER = "urn:debezium-server-iceberg-spark"
SCHEMA_URL = "https://openlineage.io/spec/1-0-5/OpenLineage.json"


@dataclass
class OpenLineageEmitter:
    job_namespace: str = "debezium-server-iceberg-spark"
    job_name: str = "cdc-consumer"
    dataset_namespace: str = "lakehouse"
    file_path: str = ""   # JSONL sink ("" = disabled)
    url: str = ""         # HTTP endpoint ("" = disabled)
    run_id: str = field(default_factory=lambda: str(uuid.uuid4()))

    def dataset(self, table_name: str, schema: T.StructType) -> dict:
        """Output-dataset document with the schema facet
        (DatasetMetadata w/ FieldDefinitions in the reference)."""
        return {
            "namespace": self.dataset_namespace,
            "name": table_name,
            "facets": {
                "schema": {
                    "_producer": PRODUCER,
                    "_schemaURL": SCHEMA_URL + "#/$defs/SchemaDatasetFacet",
                    "fields": [
                        {"name": f.name, "type": f.dataType.simpleString()}
                        for f in schema.fields
                    ],
                }
            },
        }

    def build_event(self, outputs: list[dict], event_type: str = "RUNNING") -> dict:
        return {
            "eventType": event_type,
            "eventTime": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "run": {"runId": self.run_id},
            "job": {"namespace": self.job_namespace, "name": self.job_name},
            "inputs": [],
            "outputs": outputs,
            "producer": PRODUCER,
            "schemaURL": SCHEMA_URL + "#/$defs/RunEvent",
        }

    def emit(self, outputs: list[dict], event_type: str = "RUNNING") -> bool:
        """Ship one RunEvent; returns False (never raises) on any transport
        failure — lineage is observability, not correctness
        (IcebergTableOperator.java:243-248)."""
        try:
            event = self.build_event(outputs, event_type)
            payload = json.dumps(event)
            if self.file_path:
                with open(self.file_path, "a") as fh:
                    fh.write(payload + "\n")
            if self.url:
                import urllib.request

                req = urllib.request.Request(
                    self.url,
                    data=payload.encode(),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                urllib.request.urlopen(req, timeout=5).read()
            return True
        except Exception:
            return False
