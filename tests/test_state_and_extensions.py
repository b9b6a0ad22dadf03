"""State stores (offset/history/archive), variant mode, multimodal plumbing."""

import json

from pyspark.sql import functions as F

from debezium_server_iceberg_spark.config import EngineConfig
from debezium_server_iceberg_spark.functions.multimodal import (
    as_binary_items,
    frame_sample,
    image_features,
)
from debezium_server_iceberg_spark.lakehouse import LakeCatalog
from debezium_server_iceberg_spark.sources.debezium_json import (
    RAW_ENVELOPE_SCHEMA,
    infer_event_schema,
    parse_events,
)
from debezium_server_iceberg_spark.schema.converter import DebeziumSchemaConverter
from debezium_server_iceberg_spark.state import EventsArchive, OffsetStore, SchemaHistoryStore
from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer
from tests.fixtures import make_event


def test_offset_store_roundtrip_overwrite(spark, warehouse):
    cat = LakeCatalog(warehouse)
    store = OffsetStore(cat, "state")
    assert store.load(spark) == {}
    store.save(spark, {"lsn": "100", "txid": "5"})
    assert store.load(spark) == {"lsn": "100", "txid": "5"}
    store.save(spark, {"lsn": "200"})
    assert store.load(spark) == {"lsn": "200"}  # full overwrite, single row
    assert store.table.to_df(spark).count() == 1
    # snapshot history retains both commits (time travel over state)
    assert [s.operation for s in store.table.metadata().snapshots] == [
        "overwrite",
        "overwrite",
    ]


def test_offset_store_id_with_quote(spark, warehouse):
    # store ids go through a column expression, not an f-string predicate —
    # a quote (or any SQL metachar) in the id must not break the filter
    cat = LakeCatalog(warehouse)
    store = OffsetStore(cat, "state")
    weird = "o'connor; drop--"
    store.save(spark, {"lsn": "7"}, store_id=weird)
    assert store.load(spark, store_id=weird) == {"lsn": "7"}
    assert store.load(spark, store_id="missing") == {}


def test_schema_history_append_and_recover(spark, warehouse):
    cat = LakeCatalog(warehouse)
    store = SchemaHistoryStore(cat, "state")
    store.append(spark, ['{"ddl":"CREATE TABLE a"}'])
    store.append(spark, ['{"ddl":"ALTER TABLE a ADD c"}'])
    recovered = store.recover(spark)
    assert len(recovered) == 2
    assert "CREATE" in recovered[0] and "ALTER" in recovered[1]


def test_events_archive_partitioned_append(spark, warehouse):
    cat = LakeCatalog(warehouse)
    arch = EventsArchive(cat)
    rows = [
        make_event("srv.db.t1", {"id": 1, "x": "a"}, ["id"], "c", 1),
        make_event("srv.db.t2", {"id": 2, "x": "b"}, ["id"], "c", 1),
    ]
    arch.append_batch(spark.createDataFrame(rows, RAW_ENVELOPE_SCHEMA))
    df = arch.table.to_df(spark)
    assert df.count() == 2
    got = {r["event_destination"]: json.loads(r["event_value_payload"]) for r in df.collect()}
    assert got["srv.db.t1"]["id"] == 1
    # hidden partitioning on destination + hour reflected in file manifest
    files = arch.table.current_files()
    assert all("_p_event_destination" in f.partition for f in files)


def test_variant_mode_nested_as_variant(spark):
    ev = make_event(
        "d.t",
        {"id": 1, "geo": {"lat": 1.5, "lon": 2.5}, "tags": [1, 2, 3]},
        ["id"],
        "c",
        1,
    )
    conv = DebeziumSchemaConverter(nested_as_variant=True)
    inferred = infer_event_schema(ev["value"], ev["key"], conv)
    by = {f.name: f.dataType.typeName() for f in inferred.struct.fields}
    assert by["geo"] == "variant" and by["tags"] == "variant"
    typed = parse_events(spark.createDataFrame([ev], RAW_ENVELOPE_SCHEMA), inferred)
    row = typed.select(
        F.variant_get("geo", "$.lat", "double").alias("lat"),
        F.to_json("geo").alias("geo_json"),
        F.variant_get("tags", "$[1]", "int").alias("tag1"),
    ).collect()[0]
    assert row["lat"] == 1.5
    assert json.loads(row["geo_json"]) == {"lat": 1.5, "lon": 2.5}
    assert row["tag1"] == 2


def test_schema_change_topic_goes_append_only(spark, warehouse):
    # value with ddl+databaseName+tableChanges -> keys ignored -> append path
    cfg = EngineConfig()
    cfg.iceberg.warehouse = warehouse
    c = ChangeConsumer(cfg)
    ev = make_event(
        "srv",
        {"ddl": "ALTER TABLE x", "databaseName": "db", "tableChanges": "[]"},
        key_fields=["databaseName"],
        op="c",
    )
    c.handle_batch(spark.createDataFrame([ev, ev], RAW_ENVELOPE_SCHEMA))
    df = c.table_df(spark, "srv")
    assert df.count() == 2  # duplicates kept: append, not upsert


def test_multimodal_image_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc"), (3, None)],
        "doc_id long, payload string",
    )
    items = as_binary_items(docs, "doc_id", "payload")
    feats = image_features(items).orderBy("item_id").collect()
    assert [f["item_id"] for f in feats] == [1, 2, 3]
    assert feats[0]["n_bytes"] == 11
    assert feats[0]["decoder"] in ("fake-deterministic", "pil", "corrupt")
    # deterministic: same content -> same pseudo dims
    again = image_features(items).orderBy("item_id").collect()
    assert [ (f["width"], f["height"]) for f in feats ] == [ (f["width"], f["height"]) for f in again ]
    assert feats[2]["n_bytes"] == 0 and feats[2]["decoder"] == "empty"


def test_multimodal_frame_sample_fanout(spark):
    big = "x" * 10000
    items = as_binary_items(
        spark.createDataFrame([(1, big)], "doc_id long, payload string"),
        "doc_id",
        "payload",
    )
    frames = frame_sample(items, every_n_bytes=4096).collect()
    assert len(frames) == 2
    assert {f["frame_index"] for f in frames} == {0, 1}
    assert all(len(f["frame_bytes"]) > 0 for f in frames)


def test_multimodal_real_bmp_decode_and_resize(spark):
    """Real decoders (not stubs): synthesized BMPs round-trip through the
    dependency-free parser; resize is a true nearest-neighbor resample
    whose output re-decodes to the target dims with the expected pixels."""
    import numpy as np

    from debezium_server_iceberg_spark.functions.multimodal import (
        decode_bmp,
        resize_images,
        synthesize_images,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 7, 33, 260)], "doc_id long")
    items = synthesize_images(docs, "doc_id")

    feats = {r["item_id"]: r for r in image_features(items).collect()}
    for i in (0, 7, 33, 260):
        f = feats[i]
        assert f["decoder"] == "bmp"
        assert (f["width"], f["height"]) == (4 + i % 16, 4 + (i // 16) % 16)
        assert f["channels"] == 3
        expect = 3 * f["width"] * sum((i + y) % 256 for y in range(f["height"]))
        assert f["pixel_sum"] == expect

    rz = {r["item_id"]: r for r in resize_images(items, 8, 8).collect()}
    for i in (0, 7, 33, 260):
        r = rz[i]
        assert r["resizer"] == "bmp-nn" and r["out_n_bytes"] == 246
        w, h, c, px = decode_bmp(bytes(r["resized_bytes"]))
        assert (w, h, c) == (8, 8, 3)
        src_h = 4 + (i // 16) % 16
        expect = 3 * 8 * sum((i + (y * src_h) // 8) % 256 for y in range(8))
        assert r["pixel_sum"] == expect == int(px.astype("int64").sum())


def test_multimodal_real_wav_decode(spark):
    from debezium_server_iceberg_spark.functions.multimodal import (
        audio_features,
        synthesize_audio,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 5, 129)], "doc_id long")
    au = {r["item_id"]: r for r in audio_features(synthesize_audio(docs, "doc_id")).collect()}
    for i in (0, 5, 129):
        a = au[i]
        n = 64 + i % 128
        assert a["decoder"] == "wav" and a["sample_rate"] == 8000
        assert a["n_samples"] == n and a["n_bytes"] == 44 + 2 * n
        assert a["est_duration_ms"] == n * 1000 // 8000
        expect_sq = sum(((((i + 7 * s) % 256) - 128) * 64) ** 2 for s in range(n))
        assert a["sumsq"] == expect_sq
        import math

        assert abs(a["rms_proxy"] - round(math.sqrt(expect_sq / n), 6)) < 1e-9


def test_multimodal_real_video_frame_parse(spark):
    from debezium_server_iceberg_spark.functions.multimodal import (
        frame_sample as fs,
        synthesize_videos,
    )

    docs = spark.createDataFrame([(i,) for i in (1, 3, 10)], "doc_id long")
    frames = fs(synthesize_videos(docs, "doc_id"), every_n_frames=2).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r["item_id"], []).append(r)
    for i in (1, 3, 10):
        nf = 2 + i % 4
        kept = sorted(by_item[i], key=lambda r: r["frame_index"])
        assert [r["frame_index"] for r in kept] == [f for f in range(nf) if f % 2 == 0]
        for r in kept:
            f = r["frame_index"]
            w, h = 4 + (i + f) % 8, 4 + (i * 3 + f) % 8
            assert (r["frame_width"], r["frame_height"]) == (w, h)
            assert r["frame_n_bytes"] == 54 + ((w * 3 + 3) // 4 * 4) * h
            assert len(r["frame_bytes"]) == r["frame_n_bytes"]


def test_variant_end_to_end_through_lakehouse(spark, warehouse):
    """nested_as_variant=True: events flow through the consumer into a table
    whose variant column survives the parquet roundtrip and is queryable
    with variant_get (IcebergChangeConsumerVariantTest.java:45-166 parity)."""
    cfg = EngineConfig()
    cfg.iceberg.warehouse = warehouse
    cfg.iceberg.nested_as_variant = True
    c = ChangeConsumer(cfg)
    rows = [
        make_event(
            "v.t.docs",
            {"id": i, "meta": {"tag": f"t{i}", "rank": i * 10}},
            ["id"],
            "c",
            i,
        )
        for i in range(3)
    ]
    c.handle_batch(
        spark.createDataFrame(rows, RAW_ENVELOPE_SCHEMA), epoch_id=0
    )
    tdf = c.table_df(spark, "v_t_docs")
    assert dict(tdf.dtypes)["meta"] == "variant"
    got = {
        r["id"]: (r["tag"], r["rank"])
        for r in tdf.select(
            "id",
            F.variant_get("meta", "$.tag", "string").alias("tag"),
            F.variant_get("meta", "$.rank", "int").alias("rank"),
        ).collect()
    }
    assert got == {0: ("t0", 0), 1: ("t1", 10), 2: ("t2", 20)}


def test_two_dimensional_arrays(spark):
    """2-D arrays (IcebergChangeConsumerTest.java:244-282 coverage): nested
    array-of-array schema conversion + value parse."""
    value = {
        "schema": {
            "type": "struct",
            "fields": [
                {"field": "id", "type": "int64"},
                {
                    "field": "grid",
                    "type": "array",
                    "items": {"type": "array", "items": {"type": "int32"}},
                },
            ],
        },
        "payload": {"id": 1, "grid": [[1, 2], [3, 4]]},
    }
    ev = {"destination": "d.t", "key": None, "value": json.dumps(value)}
    inferred = infer_event_schema(ev["value"], None, DebeziumSchemaConverter())
    assert inferred.struct["grid"].dataType.simpleString() == "array<array<int>>"
    row = parse_events(
        spark.createDataFrame([ev], RAW_ENVELOPE_SCHEMA), inferred
    ).collect()[0]
    assert row["grid"] == [[1, 2], [3, 4]]


def test_multimodal_resize_and_audio_stubs(spark):
    docs = spark.createDataFrame(
        [(1, "some image bytes here"), (2, ""), (3, None)],
        "doc_id long, payload string",
    )
    items = as_binary_items(docs, "doc_id", "payload")

    from debezium_server_iceberg_spark.functions.multimodal import (
        audio_features,
        resize_images,
    )

    rz = {r["item_id"]: r for r in resize_images(items, 32, 32).collect()}
    assert len(rz[1]["resized_bytes"]) == 32 * 32 // 64
    assert rz[1]["resizer"] == "fake-cycle"
    assert rz[2]["resizer"] == "empty" and rz[3]["resizer"] == "empty"
    # deterministic: same input -> same output hash
    again = {r["item_id"]: r for r in resize_images(items, 32, 32).collect()}
    assert rz[1]["resized_sha256"] == again[1]["resized_sha256"]

    au = {r["item_id"]: r for r in audio_features(items).collect()}
    assert au[1]["n_bytes"] == 21 and au[1]["est_duration_ms"] == 0
    assert au[1]["rms_proxy"] > 0
    assert au[2]["decoder"] == "empty"


def test_openlineage_emission_per_batch(spark, tmp_path):
    """W16: a committed batch emits one OpenLineage RunEvent per batch with
    an output dataset + schema facet per written table; transport failure
    never fails the batch."""
    import json

    from debezium_server_iceberg_spark.config import EngineConfig
    from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer
    from tests.fixtures import customer_event, write_jsonl
    from debezium_server_iceberg_spark.sources.debezium_json import read_events_jsonl

    lineage_file = str(tmp_path / "lineage.jsonl")
    cfg = EngineConfig()
    cfg.iceberg.warehouse = str(tmp_path / "wh")
    cfg.iceberg.openlineage_enabled = True
    cfg.iceberg.openlineage_file = lineage_file
    c = ChangeConsumer(cfg)
    write_jsonl(
        [customer_event(i, f"v{i}", op="c", ts_ms=1) for i in range(3)],
        str(tmp_path / "b1.jsonl"),
    )
    c.handle_batch(read_events_jsonl(spark, str(tmp_path / "b1.jsonl")))

    events = [json.loads(l) for l in open(lineage_file)]
    assert len(events) == 1
    ev = events[0]
    assert ev["eventType"] == "RUNNING" and ev["run"]["runId"]
    assert ev["job"]["namespace"] == "debezium-server-iceberg-spark"
    (out,) = ev["outputs"]
    assert out["name"] == "testc_inventory_customers_upsert"
    fields = {f["name"] for f in out["facets"]["schema"]["fields"]}
    assert {"id", "first_name", "__op"} <= fields

    # unreachable HTTP endpoint: emit returns False, batch still commits
    cfg2 = EngineConfig()
    cfg2.iceberg.warehouse = str(tmp_path / "wh2")
    cfg2.iceberg.openlineage_enabled = True
    cfg2.iceberg.openlineage_url = "http://127.0.0.1:1/nope"
    c2 = ChangeConsumer(cfg2)
    r = c2.handle_batch(read_events_jsonl(spark, str(tmp_path / "b1.jsonl")))
    assert r.tables_written == {"testc.inventory.customers_upsert": 3}


def test_image_ahash_matches_independent_reimplementation(spark):
    """Column-varying pixels (the synthetic fixtures are row-uniform, so
    they can't catch x-axis packing mistakes) against a pure-python loop
    reimplementation of resize -> gray -> threshold -> pack."""
    import numpy as np

    from debezium_server_iceberg_spark.functions.multimodal import (
        encode_bmp,
        image_ahash,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(11, 13, 3)).astype(np.uint8)

    # independent reference: per-pixel loops, no numpy vector tricks
    gray, total = {}, 0
    for yd in range(8):
        for xd in range(8):
            sy, sx = (yd * 11) // 8, (xd * 13) // 8
            g = (int(px[sy, sx, 0]) + int(px[sy, sx, 1]) + int(px[sy, sx, 2])) // 3
            gray[(yd, xd)] = g
            total += g
    bits = 0
    for yd in range(8):
        for xd in range(8):
            bits = (bits << 1) | (1 if 64 * gray[(yd, xd)] >= total else 0)
    expected_hex = bits.to_bytes(8, "big").hex()

    df = spark.createDataFrame([(1, bytearray(encode_bmp(px)))], "item_id long, content binary")
    row = image_ahash(df).collect()[0]
    assert row.hasher == "bmp-ahash"
    assert (row.width, row.height) == (13, 11)
    assert row.ahash_hex == expected_hex
    packed = bytes.fromhex(expected_hex)
    for k in range(4):
        assert row[f"band{k}"] == int.from_bytes(packed[2 * k : 2 * k + 2], "big")


def test_image_ahash_invariant_under_nn_upscale(spark):
    """An image and its 2x nearest-neighbor upscale must hash identically
    — the property that makes aHash a dedup key across re-encodes."""
    import numpy as np

    from debezium_server_iceberg_spark.functions.multimodal import (
        encode_bmp,
        image_ahash,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    up = px.repeat(2, axis=0).repeat(2, axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px))), (2, bytearray(encode_bmp(up)))],
        "item_id long, content binary",
    )
    rows = {r.item_id: r for r in image_ahash(df).collect()}
    assert rows[1].ahash_hex == rows[2].ahash_hex


def test_image_ahash_fallbacks_and_strict(spark):
    import pytest as _pytest

    from debezium_server_iceberg_spark.functions.multimodal import image_ahash

    df = spark.createDataFrame(
        [(1, bytearray(b"not-a-bmp")), (2, None)], "item_id long, content binary"
    )
    rows = {r.item_id: r for r in image_ahash(df).collect()}
    assert rows[1].hasher == "fake-deterministic" and rows[1].width is None
    assert rows[2].hasher == "empty"
    with _pytest.raises(Exception):  # NotImplementedError surfaces via py4j
        image_ahash(df, strict=True).collect()


def test_ahash_near_dup_fixture_pairs(spark):
    """The near-dup fixture contract end-to-end through the REAL pipeline:
    within a group of 4 the planted flips are nested, so pair (a, b) has
    hamming |j_a - j_b| <= 3 and every within-group pair is found; the
    md5-derived base patterns keep distinct groups ~32 bits apart."""
    from debezium_server_iceberg_spark.functions.dedup import (
        banded_hamming_pairs,
    )
    from debezium_server_iceberg_spark.functions.multimodal import (
        image_ahash,
        synthesize_near_dup_images,
    )
    from pyspark.sql import functions as F

    ids = spark.range(0, 16).withColumnRenamed("id", "doc_id")  # 4 groups
    hashed = image_ahash(synthesize_near_dup_images(ids, "doc_id"))
    assert {r.hasher for r in hashed.select("hasher").distinct().collect()} == {
        "bmp-ahash"
    }
    sigi = hashed.select(
        F.col("item_id").alias("doc"),
        *[F.col(f"band{b}").cast("long").alias(f"sb{b}") for b in range(4)],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming for r in banded_hamming_pairs(sigi).collect()
    }
    expected = {
        (g * 4 + a, g * 4 + b): b - a
        for g in range(4)
        for a in range(4)
        for b in range(a + 1, 4)
    }
    assert pairs == expected


def test_banded_hamming_rejects_loose_threshold():
    import pytest as _pytest

    from debezium_server_iceberg_spark.functions.dedup import (
        banded_hamming_pairs,
    )

    with _pytest.raises(ValueError):
        banded_hamming_pairs(None, max_hamming=4)


def test_keyframe_select_matches_pixel_delta_model(spark):
    """keyframe_select vs a pure-numpy model over the synthesized VID0
    containers: frame 0 always rank 1; remaining slots are the largest
    exact integer inter-frame pixel deltas, ties to the earlier frame;
    emitted bytes are the container's original frame slices."""
    import hashlib

    import numpy as np

    from debezium_server_iceberg_spark.functions.multimodal import (
        decode_bmp,
        decode_video,
        keyframe_select,
        synthesize_videos,
    )

    base = spark.range(6).withColumnRenamed("id", "doc_id")
    vids = synthesize_videos(base)  # (item_id, content)
    out = keyframe_select(vids, k=3).collect()
    raw = {r["item_id"]: bytes(r["content"]) for r in vids.collect()}
    by_item = {}
    for r in out:
        by_item.setdefault(r["item_id"], []).append(r)
    assert set(by_item) == set(raw)
    for item_id, rows in by_item.items():
        rows = sorted(rows, key=lambda r: r["rank"])
        frames = decode_video(raw[item_id])
        # model: scores
        decoded = [decode_bmp(f)[3].astype(np.int64) for f in frames]
        scores = []
        for i in range(1, len(decoded)):
            a, b = decoded[i], decoded[i - 1]
            if a.shape != b.shape:  # geometry cut = maximal change
                scores.append(int(a.sum() + b.sum()))
            else:
                scores.append(int(np.abs(a - b).sum()))
        want_rest = sorted(
            ((s, i + 1) for i, s in enumerate(scores)), key=lambda t: (-t[0], t[1])
        )[:2]
        assert rows[0]["frame_index"] == 0 and rows[0]["rank"] == 1
        got_rest = [(r["change_score"], r["frame_index"]) for r in rows[1:]]
        assert got_rest == want_rest
        for r in rows:
            chunk = frames[r["frame_index"]]
            assert bytes(r["frame"]) == chunk
            assert r["frame_sha256"] == hashlib.sha256(chunk).hexdigest()
    # determinism
    again = sorted(
        (r["item_id"], r["frame_index"], r["rank"]) for r in keyframe_select(vids, k=3).collect()
    )
    assert again == sorted((r["item_id"], r["frame_index"], r["rank"]) for r in out)
