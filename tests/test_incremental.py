"""Incremental MinHash index: batch-split results must equal one-shot LSH."""

from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.dedup import minhash_near_dup_pairs
from debezium_server_iceberg_spark.functions.incremental import MinHashIndex
from debezium_server_iceberg_spark.lakehouse import LakeCatalog

from conftest import SF_DIR


def _pairs_set(df):
    return {
        (r.doc_a, r.doc_b, round(r.agreement, 6)) for r in df.collect()
    }


def test_incremental_equals_batch_at_once(spark, warehouse):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    oneshot = _pairs_set(
        minhash_near_dup_pairs(docs).select("doc_a", "doc_b", "agreement")
    )

    idx = MinHashIndex.create(LakeCatalog(warehouse), "idx", "minhash_bands")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    got = _pairs_set(idx.add_batch(half1)) | _pairs_set(idx.add_batch(half2))
    assert got == oneshot
    assert len(oneshot) > 0  # the corpus actually has near-dups

    # the index now holds every doc's band rows exactly once
    n_docs = docs.count()
    n_bands = 4  # 8 hashes / band_size 2
    assert idx.table.to_df(spark).count() == n_docs * n_bands


def test_incremental_empty_batch_is_noop(spark, warehouse):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = MinHashIndex.create(LakeCatalog(warehouse), "idx", "minhash_bands")
    idx.add_batch(docs.limit(20)).collect()
    before = idx.table.row_count()
    out = idx.add_batch(docs.limit(0))
    assert out.count() == 0
    assert idx.table.row_count() == before


def test_incremental_cross_batch_pair_found(spark, warehouse):
    # a doc and its near-copy land in DIFFERENT batches; the pair must
    # surface when the second batch arrives
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows1 = [(1, base, "en")]
    rows2 = [(2, base + " tail", "en")]
    schema = "doc_id long, text string, lang string"
    idx = MinHashIndex.create(LakeCatalog(warehouse), "idx", "minhash_bands")
    first = idx.add_batch(spark.createDataFrame(rows1, schema))
    assert first.count() == 0
    second = idx.add_batch(spark.createDataFrame(rows2, schema)).collect()
    assert [(r.doc_a, r.doc_b) for r in second] == [(1, 2)]


def test_maintain_compacts_batch_files(spark, warehouse):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = MinHashIndex.create(LakeCatalog(warehouse), "idx", "minhash_bands")
    for b in range(4):
        idx.add_batch(docs.filter(F.col("doc_id") % 4 == b)).collect()
    before_files = len(idx.table.current_files())
    before_rows = idx.table.to_df(spark).count()
    assert before_files >= 4  # one (or more) per batch
    removed = idx.maintain(spark, min_input_files=2)
    assert removed >= 4
    after = idx.table.current_files()
    assert len(after) < before_files
    assert idx.table.to_df(spark).count() == before_rows  # contents unchanged


# ------------------------------------------------------- substring index


def _prof_set(df):
    return {
        (r[0], r.n_grams, r.n_shared, r.shared_frac, r.keep) for r in df.collect()
    }


def test_substring_batch_probe_equals_one_shot(spark, warehouse):
    """add_batch(N) must equal the ONE-SHOT profile over (history ∪ batch N)
    restricted to batch N's docs — the proof that a recurring refresh
    never needs the corpus re-scan."""
    from debezium_server_iceberg_spark.functions.dedup import (
        exact_substring_profile,
    )
    from debezium_server_iceberg_spark.functions.incremental import SubstringIndex

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)

    idx = SubstringIndex.create(LakeCatalog(warehouse), "idx", "substr_grams")
    p1 = idx.add_batch(half1)
    p2 = idx.add_batch(half2)

    assert _prof_set(p1) == _prof_set(exact_substring_profile(half1, k=8))
    oneshot_full = exact_substring_profile(docs, k=8)
    assert _prof_set(p2) == _prof_set(
        oneshot_full.filter(F.col("doc_id") % 2 == 1)
    )
    # cross-batch sharing is genuinely exercised: some batch-2 doc shares a
    # window ONLY with history (its batch-1-restricted profile would differ)
    only_b2 = exact_substring_profile(half2, k=8)
    assert _prof_set(p2) != _prof_set(only_b2)


def test_substring_index_maintain_compacts(spark, warehouse):
    from debezium_server_iceberg_spark.functions.incremental import SubstringIndex

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = SubstringIndex.create(LakeCatalog(warehouse), "idx", "substr_grams")
    for b in range(4):
        idx.add_batch(docs.filter(F.col("doc_id") % 4 == b)).collect()
    before_files = len(idx.table.current_files())
    before = idx.table.to_df(spark).count()
    assert before_files >= 4
    removed = idx.maintain(spark, min_input_files=2)
    assert removed >= 4
    assert len(idx.table.current_files()) < before_files
    assert idx.table.to_df(spark).count() == before  # contents unchanged
    # probes against the compacted index still see all history
    tail = idx.add_batch(docs.limit(5).select("doc_id", "text"))
    assert tail.filter(F.col("n_shared") > 0).count() > 0  # dup of history


def test_streaming_minhash_index_feed_exactly_once(spark, tmp_path):
    """Streaming feed of the persistent MinHash index: two micro-batches
    through a real stream produce the SAME index contents and the same
    cumulative verified pairs as two direct add_batch calls; a replayed
    epoch (simulated direct re-call with the same epoch_id) appends
    nothing and returns no pairs."""
    import json
    import os

    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.functions.incremental import (
        MinHashIndex,
    )
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.streaming.windows import (
        run_minhash_index_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    b2 = docs.filter("doc_id % 2 = 1").select("doc_id", "text")

    # reference: two direct admissions
    ref = MinHashIndex.create(LakeCatalog(str(tmp_path / "ref")), "dd", "idx")
    ref_pairs = sorted(
        map(tuple, ref.add_batch(b1).collect())
    ) + sorted(map(tuple, ref.add_batch(b2).collect()))

    # stream: same batches as two files, maxFilesPerTrigger=1
    indir = str(tmp_path / "docs_in")
    os.makedirs(indir)
    for name, bdf in [("b1.jsonl", b1), ("b2.jsonl", b2)]:
        with open(f"{indir}/{name}", "w") as fh:
            for r in bdf.collect():
                fh.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    idx = MinHashIndex.create(LakeCatalog(str(tmp_path / "str")), "dd", "idx")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(indir)
    q = run_minhash_index_stream(
        stream, idx, str(tmp_path / "pairs"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # same stored index relation
    stored_ref = sorted(map(tuple, ref.table.to_df(spark).collect()))
    stored_str = sorted(map(tuple, idx.table.to_df(spark).collect()))
    assert stored_str == stored_ref
    # same cumulative pairs (file order == trigger order here)
    got_pairs = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "pairs")).drop("epoch").collect())
    )
    assert got_pairs == sorted(ref_pairs)
    # replay guard: re-admitting an already-stamped epoch is a no-op
    before = idx.table.row_count()
    replay = idx.add_batch(b2, epoch_id=1)
    assert replay.count() == 0
    assert idx.table.row_count() == before


def test_streaming_substring_index_feed_exactly_once(spark, tmp_path):
    """The generic stream wrapper drives SubstringIndex too: two
    streamed micro-batches == two direct admissions (stored gram
    relation and cumulative profiles), and a replayed epoch is a
    no-op."""
    import json
    import os

    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.functions.incremental import (
        SubstringIndex,
    )
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.streaming.windows import (
        run_dedup_index_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    b2 = docs.filter("doc_id % 2 = 1").select("doc_id", "text")

    ref = SubstringIndex.create(LakeCatalog(str(tmp_path / "ref")), "dd", "sub")
    ref_prof = sorted(map(tuple, ref.add_batch(b1).collect())) + sorted(
        map(tuple, ref.add_batch(b2).collect())
    )

    indir = str(tmp_path / "docs_in")
    os.makedirs(indir)
    for name, bdf in [("b1.jsonl", b1), ("b2.jsonl", b2)]:
        with open(f"{indir}/{name}", "w") as fh:
            for r in bdf.collect():
                fh.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    idx = SubstringIndex.create(LakeCatalog(str(tmp_path / "str")), "dd", "sub")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(indir)
    q = run_dedup_index_stream(
        stream, idx, str(tmp_path / "profiles"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stored_ref = sorted(map(tuple, ref.table.to_df(spark).collect()))
    stored_str = sorted(map(tuple, idx.table.to_df(spark).collect()))
    assert stored_str == stored_ref
    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "profiles")).drop("epoch").collect())
    )
    assert got == sorted(ref_prof)
    before = idx.table.row_count()
    assert idx.add_batch(b2, epoch_id=1).count() == 0
    assert idx.table.row_count() == before
