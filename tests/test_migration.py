"""Legacy state-file migrations (S5/S6).

tests/data/file_offsets.dat is a REAL java.io.ObjectOutputStream product
(HashMap<byte[], byte[]> of JSON offsets, the exact FileOffsetBackingStore
layout) generated with the JDK — wire-level interop, not a Python-made
lookalike."""

import json
import os

import pytest

from debezium_server_iceberg_spark.lakehouse import LakeCatalog
from debezium_server_iceberg_spark.state import OffsetStore, SchemaHistoryStore
from debezium_server_iceberg_spark.state.migration import (
    JavaStreamError,
    migrate_file_history,
    migrate_file_offsets,
    read_java_map_file,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "file_offsets.dat")


def test_parse_java_serialized_offset_file():
    m = read_java_map_file(FIXTURE)
    assert m == {
        '["engine",{"server":"srv"}]': '{"lsn":12345,"txId":42}',
        '["engine2",{"server":"other"}]': '{"pos":99,"file":"binlog.000003"}',
    }


def test_parse_rejects_non_java_stream(tmp_path):
    p = str(tmp_path / "bogus.dat")
    with open(p, "wb") as fh:
        fh.write(b'{"not":"java"}')
    with pytest.raises(JavaStreamError):
        read_java_map_file(p)


def test_migrate_offsets_into_store(spark, tmp_path):
    cat = LakeCatalog(str(tmp_path / "wh"))
    store = OffsetStore(cat, "state")
    migrated = migrate_file_offsets(spark, store, FIXTURE)
    loaded = store.load(spark)
    assert loaded == migrated
    assert json.loads(loaded['["engine",{"server":"srv"}]'])["lsn"] == 12345


def test_migrate_history_file(spark, tmp_path):
    cat = LakeCatalog(str(tmp_path / "wh"))
    store = SchemaHistoryStore(cat, "state")
    p = str(tmp_path / "history.dat")
    docs = [
        json.dumps({"ddl": "CREATE TABLE t (id int)", "ts_ms": 1}),
        "",  # empty lines skipped
        json.dumps({"ddl": "ALTER TABLE t ADD c text", "ts_ms": 2}),
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(docs) + "\n")
    n = migrate_file_history(spark, store, p)
    assert n == 2
    recovered = [json.loads(r)["ddl"] for r in store.recover(spark)]
    assert recovered == ["CREATE TABLE t (id int)", "ALTER TABLE t ADD c text"]
