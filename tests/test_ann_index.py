"""Persistent IVF index: partition-pruned search, incremental adds."""

import numpy as np
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.ann_index import IVFIndex
from debezium_server_iceberg_spark.functions.similarity import cosine_topk
from debezium_server_iceberg_spark.lakehouse import LakeCatalog

from conftest import SF_DIR

QUERIES = [0, 7, 21]


def test_ivf_search_prunes_files_and_finds_neighbors(spark, warehouse):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IVFIndex.build(LakeCatalog(warehouse), "ann", "ivf", emb, n_cells=8)

    total_files = len(idx.table.current_files())
    q_rows = emb.filter(F.col("vec_id").isin(QUERIES)).collect()
    qmat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
    files, per_query = idx.probed_files(qmat, n_probe=2)
    cells = set().union(*per_query.values())
    # partition pruning is real: probing 2 of 8 cells per query must skip
    # files, and every query gets exactly its own 2 probes
    assert all(len(v) == 2 for v in per_query.values())
    assert len(cells) < 8
    assert 0 < len(files) < total_files

    got = idx.search(spark, QUERIES, k=5, n_probe=6)
    rows = got.collect()
    assert {r.query_id for r in rows} == set(QUERIES)
    for qid in QUERIES:
        ranks = sorted(r.rank for r in rows if r.query_id == qid)
        assert ranks == [1, 2, 3, 4, 5]

    # recall vs the exact path (per-query probing: each query sees ONLY
    # its own n_probe cells, so recall is the real IVF tradeoff —
    # deterministic on this data at 6 of 8 cells)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, QUERIES, k=1).collect()
    }
    approx = {(r.query_id, r.rank): r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(
        1 for k in approx if k in exact and exact[k] == approx[k]
    )
    assert hits >= 2  # >=2/3 top-1 recall at n_probe=6 of 8


def test_ivf_add_batch_extends_index(spark, warehouse):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    first = emb.filter(F.col("vec_id") < 100)
    rest = emb.filter(F.col("vec_id") >= 100)
    idx = IVFIndex.build(LakeCatalog(warehouse), "ann", "ivf", first, n_cells=8)
    n0 = idx.table.row_count()
    added = idx.add_batch(rest)
    assert added == rest.count()
    assert idx.table.row_count() == n0 + added
    # a later vector is searchable after the incremental add
    later_id = int(rest.agg(F.min("vec_id")).first()[0])
    out = idx.search(spark, [later_id], k=3, n_probe=8).collect()
    assert {r.query_id for r in out} == {later_id}


def test_ivf_search_batch_independence_and_missing_ids(spark, warehouse):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IVFIndex.build(LakeCatalog(warehouse), "ann", "ivf", emb, n_cells=8)
    # per-query probes: results for a query don't change when co-batched
    solo = {(r.rank, r.neighbor_id) for r in idx.search(spark, [0], k=3, n_probe=2).collect()}
    batched = {
        (r.rank, r.neighbor_id)
        for r in idx.search(spark, QUERIES, k=3, n_probe=2).collect()
        if r.query_id == 0
    }
    assert solo == batched
    # unknown ids return an empty frame, not a crash
    assert idx.search(spark, [10**9], k=3).count() == 0
    # caller-provided vectors skip the id lookup
    import numpy as np
    qv = np.array([np.asarray(r["embedding"], dtype=np.float64)
                   for r in emb.filter(F.col("vec_id") == 0).collect()])
    via_vec = {(r.rank, r.neighbor_id)
               for r in idx.search(spark, [0], k=3, n_probe=2, query_vecs=qv).collect()}
    assert via_vec == solo


def test_zero_norm_vectors_excluded_from_topk(spark, warehouse):
    """A zero-norm stored embedding must never outrank real neighbors
    (ADVICE r6: 0/0 = NaN sorts above every real cosine in the descending
    window; the guard nulls + drops it)."""
    rows = [(i, [float(i + j + 1) for j in range(4)]) for i in range(12)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))  # degenerate vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IVFIndex.build(LakeCatalog(warehouse), "ann", "zn", emb, n_cells=2)
    got = idx.search(spark, [0], k=5, n_probe=2).collect()
    assert len(got) == 5
    assert all(r.neighbor_id != 99 for r in got)
    assert all(not np.isnan(r.cosine) for r in got)


def test_null_stored_embeddings_dropped_not_crashing(spark, warehouse):
    """A NULL embedding row in the stored table must drop out of search
    results (the pre-GEMM plan's nullif/isNotNull semantics), not produce
    a ragged np.array that fails the task (ADVICE r15)."""
    rows = [(i, [float(i + j + 1) for j in range(4)]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IVFIndex.build(LakeCatalog(warehouse), "ann", "nul", emb, n_cells=2)
    nulls = spark.createDataFrame(
        [(98, 0, None), (97, 1, [1.0])],  # null vec + wrong-length vec
        "vec_id long, cell int, embedding array<float>",
    )
    idx.table.append(nulls)  # poison rows land in the stored table
    got = idx.search(spark, [0], k=5, n_probe=2).collect()
    assert len(got) == 5
    assert all(r.neighbor_id not in (97, 98) for r in got)


def test_ivf_topk_null_vectors_dropped(spark):
    from debezium_server_iceberg_spark.functions.similarity import ivf_topk

    rows = [(i, [float(i + j + 1) for j in range(4)]) for i in range(12)]
    rows += [(98, None), (97, [1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ivf_topk(emb, [0], k=5, n_cells=2, n_probe=2).collect()
    assert len(got) == 5
    assert all(r.neighbor_id not in (97, 98) for r in got)


def test_kmeans_codebook_beats_hash_recall(spark, warehouse):
    """Trained spherical-k-means codebook must reach at least the hash
    codebook's recall@k at the same n_probe (deterministic: both trainers
    are RNG-free and the fixture data is fixed)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = list(range(12))
    k, n_probe, n_cells = 5, 2, 8

    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=k).collect()
    }

    def recall(train):
        idx = IVFIndex.build(
            LakeCatalog(warehouse), "ann", f"cb_{train}", emb,
            n_cells=n_cells, train=train,
        )
        got = {
            (r.query_id, r.neighbor_id)
            for r in idx.search(spark, queries, k=k, n_probe=n_probe).collect()
        }
        return len(got & exact) / len(exact)

    r_hash, r_kmeans = recall("hash"), recall("kmeans")
    assert r_kmeans >= r_hash, (r_kmeans, r_hash)
    # near-uniform synthetic embeddings bound what ANY coarse quantizer can
    # do at 2/8 cells; the trained codebook must still beat random probing
    # (2/8 of the corpus -> ~0.25 expected recall for a useless codebook)
    assert r_kmeans > 0.3


def test_kmeans_codebook_deterministic(spark):
    from debezium_server_iceberg_spark.functions.ann_index import (
        train_kmeans_codebook,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = train_kmeans_codebook(emb, n_cells=4, n_iters=2)
    b = train_kmeans_codebook(emb, n_cells=4, n_iters=2)
    assert np.allclose(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_incremental_add_batch_equals_one_shot_build(spark, tmp_path):
    """Index-maintenance proof: build on the even half + add_batch the
    odd half == one-shot build on everything, under exhaustive probing
    (exact in both cases regardless of codebook training set)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    incr = IVFIndex.build(
        LakeCatalog(str(tmp_path / "a")), "ann", "ivf",
        emb.filter(F.col("vec_id") % 2 == 0), n_cells=8,
    )
    added = incr.add_batch(emb.filter(F.col("vec_id") % 2 == 1))
    assert added == emb.filter(F.col("vec_id") % 2 == 1).count()
    full = IVFIndex.build(
        LakeCatalog(str(tmp_path / "b")), "ann", "ivf", emb, n_cells=8
    )
    r_incr = sorted(map(tuple, incr.search(spark, list(range(10)), 5, 8).collect()))
    r_full = sorted(map(tuple, full.search(spark, list(range(10)), 5, 8).collect()))
    assert r_incr == r_full


def test_ivfpq_exhaustive_equals_adc_and_approx_bounded(spark):
    """n_probe = n_cells reproduces the pure ADC scan exactly; the
    approximate mode returns a (query, k)-bounded subset ranked by the
    same ADC metric."""
    from pyspark.sql import functions as F  # noqa: F401
    from debezium_server_iceberg_spark.functions.pq import (
        ivfpq_adc_topk,
        pq_adc_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = sorted(map(tuple, pq_adc_topk(emb, list(range(5)), k=5).collect()))
    comp = sorted(
        map(tuple, ivfpq_adc_topk(emb, list(range(5)), k=5, n_cells=8, n_probe=8).collect())
    )
    assert comp == full
    approx = ivfpq_adc_topk(emb, list(range(5)), k=5, n_cells=8, n_probe=2).collect()
    assert 0 < len(approx) <= 25
    for qid in {r["query_id"] for r in approx}:
        mine = sorted((r for r in approx if r["query_id"] == qid), key=lambda r: r["rank"])
        dists = [r["adc_dist2"] for r in mine]
        assert dists == sorted(dists)


def _qmat(emb, qids):
    import numpy as np
    from pyspark.sql import functions as F

    rows = emb.filter(F.col("vec_id").isin(qids)).select(
        "vec_id", "embedding"
    ).collect()
    by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    return np.array([by_id[q] for q in qids])


def test_ivfpq_index_exhaustive_equals_adc(spark, warehouse):
    """Persistent layout, exhaustive probing: bit-identical to the
    one-shot pure-ADC scan — pins the whole stored-codes path (single
    Arrow encode pass, cell-partitioned append, driver-side LUT fold,
    probe-pruned scan)."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex
    from debezium_server_iceberg_spark.functions.pq import pq_adc_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(10))
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "ivfpq", emb, dim=64, n_cells=8
    )
    got = sorted(map(tuple, idx.search(spark, qids, _qmat(emb, qids), k=5, n_probe=8).collect()))
    want = sorted(map(tuple, pq_adc_topk(emb, qids, k=5, dim=64).collect()))
    assert got == want


def test_ivfpq_index_add_batch_equals_one_shot(spark, warehouse):
    """Batch update == rebuild: building on the PQ seed set (ids 0..15,
    so the frozen codebooks equal full-corpus ones) then add_batch-ing
    the rest yields the identical stored relation and identical search
    results as the one-shot full build."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(6))
    qm = _qmat(emb, qids)
    one = IVFPQIndex.build(
        LakeCatalog(f"{warehouse}/one"), "ann", "ivfpq", emb, dim=64, n_cells=8
    )
    inc = IVFPQIndex.build(
        LakeCatalog(f"{warehouse}/inc"), "ann", "ivfpq",
        emb.filter(F.col("vec_id") < 16), dim=64, n_cells=8,
    )
    added = inc.add_batch(emb.filter(F.col("vec_id") >= 16))
    assert added == (emb.count() - 16) * 8  # m rows per vector
    # PQ codebooks frozen on the seed set == full-corpus codebooks
    assert np.array_equal(one.codebooks, inc.codebooks)
    stored_one = sorted(map(tuple, one.table.to_df(spark).select("vec_id", "s", "code").collect()))
    stored_inc = sorted(map(tuple, inc.table.to_df(spark).select("vec_id", "s", "code").collect()))
    assert stored_one == stored_inc
    r1 = sorted(map(tuple, one.search(spark, qids, qm, k=5, n_probe=8).collect()))
    r2 = sorted(map(tuple, inc.search(spark, qids, qm, k=5, n_probe=8).collect()))
    assert r1 == r2


def test_ivfpq_index_partial_probe_prunes_files_and_ranks(spark, warehouse):
    """n_probe < n_cells: the manifest plans strictly fewer files, every
    result comes from a probed cell, and per-query ranking stays
    ADC-ordered; the search plan has NO corpus-sized join (broadcasts
    only) — the query-time no-corpus-join contract."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(5))
    qm = _qmat(emb, qids)
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "ivfpq", emb, dim=64, n_cells=8
    )
    all_files, _ = idx.probed_files(qm, 8)
    few_files, per_q = idx.probed_files(qm, 2)
    assert len(few_files) < len(all_files)
    assert all(len(cells) == 2 for cells in per_q.values())
    res = idx.search(spark, qids, qm, k=5, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = res.collect()
    assert 0 < len(rows) <= 25
    for qid in {r["query_id"] for r in rows}:
        mine = sorted((r for r in rows if r["query_id"] == qid), key=lambda r: r["rank"])
        dists = [r["adc_dist2"] for r in mine]
        assert dists == sorted(dists)
        assert all(r["neighbor_id"] != qid for r in mine)


def test_ivfpq_index_compaction_preserves_search(spark, warehouse):
    """Maintenance story: repeated add_batch fragments cell partitions;
    LakeTable.compact bin-packs within cells (partition transforms
    recomputed from rows) and search results are bit-identical before
    and after, with fewer files planned."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(5))
    qm = _qmat(emb, qids)
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "ivfpq",
        emb.filter(F.col("vec_id") < 16), dim=64, n_cells=4,
    )
    # fragment: several small appends
    for m in range(3):
        idx.add_batch(emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") % 3 == m)))
    before_files = len(idx.table.current_files())
    before = sorted(map(tuple, idx.search(spark, qids, qm, k=5, n_probe=4).collect()))
    removed = idx.table.compact(spark)
    assert removed > 0
    after_files = len(idx.table.current_files())
    assert after_files < before_files
    after = sorted(map(tuple, idx.search(spark, qids, qm, k=5, n_probe=4).collect()))
    assert after == before


def test_ivfpq_index_small_corpus_fewer_seeds_than_ks(spark, warehouse):
    """A corpus smaller than ks yields fewer PQ seeds; codebook arrays
    size by the real seed count and search still ranks correctly (no
    phantom zero-centroid codes, no index-out-of-bounds)."""
    import numpy as np

    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex
    from debezium_server_iceberg_spark.functions.pq import pq_adc_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 10  # < ks=16 vectors
    )
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "tiny", emb, dim=64, n_cells=2
    )
    assert idx.codebooks.shape[1] == 10  # real seed count, not ks
    qids = [0, 1]
    got = sorted(map(tuple, idx.search(spark, qids, _qmat(emb, qids), k=3, n_probe=2).collect()))
    want = sorted(map(tuple, pq_adc_topk(emb, qids, k=3, dim=64).collect()))
    assert got == want


def test_ivfpq_rerank_recovers_exact_cosine_order(spark, warehouse):
    """Exact re-ranking of the expanded ADC shortlist: with exhaustive
    probing and a generous expand factor the reranked top-k equals
    brute-force cosine_topk — quantization error no longer decides the
    final order.  The unreranked ADC top-k generally differs (that gap
    is WHY production reranks)."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex
    from debezium_server_iceberg_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(6))
    qm = _qmat(emb, qids)
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "ivfpq", emb, dim=64, n_cells=8
    )
    # expand covering the whole corpus: rerank machinery must be exact
    reranked = sorted(map(tuple, idx.search(
        spark, qids, qm, k=5, n_probe=8,
        rerank_source=emb, rerank_expand=100,
    ).collect()))
    exact = sorted(map(tuple, cosine_topk(emb, qids, k=5).collect()))
    assert reranked == exact
    # modest expand: high recall of the exact top-5 (the seed codebooks
    # are deliberately coarse — 16 codes — so this is a band, not equality)
    modest = idx.search(
        spark, qids, qm, k=5, n_probe=8, rerank_source=emb, rerank_expand=8
    ).collect()
    exact_set = {(r[0], r[2]) for r in exact}
    hits = sum((r["query_id"], r["neighbor_id"]) in exact_set for r in modest)
    assert hits >= int(0.8 * len(exact_set))
    # rerank output follows the cosine_topk contract
    cols = idx.search(
        spark, qids, qm, k=5, n_probe=8, rerank_source=emb
    ).columns
    assert cols == ["query_id", "rank", "neighbor_id", "cosine"]


def test_ivfpq_search_empty_inputs_keep_rerank_schema(spark, warehouse):
    """Empty query lists / zero probed files must return the SAME schema
    as the non-empty path: cosine shape when rerank_source is set, ADC
    shape otherwise — downstream unions break on a schema that flips
    with the row count."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "ivfpq", emb, dim=64, n_cells=8
    )
    no_q_plain = idx.search(spark, [], np.zeros((0, 64)), k=5)
    assert no_q_plain.columns == ["query_id", "rank", "neighbor_id", "adc_dist2"]
    no_q_rerank = idx.search(
        spark, [], np.zeros((0, 64)), k=5, rerank_source=emb
    )
    assert no_q_rerank.columns == ["query_id", "rank", "neighbor_id", "cosine"]
    assert no_q_rerank.count() == 0
    # both empty frames union cleanly with their non-empty counterparts
    qm = _qmat(emb, [0])
    full = idx.search(spark, [0], qm, k=3, n_probe=8, rerank_source=emb)
    assert full.unionByName(no_q_rerank).count() == full.count()


def test_vector_index_stream_exactly_once(spark, tmp_path):
    """run_vector_index_stream: two streamed micro-batches of embeddings
    produce the identical stored index relation (and search results) as
    two direct add_batch calls; a replayed epoch appends nothing; an
    epoch regression raises."""
    import json
    import os

    import pytest
    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.functions.incremental import (
        EpochRegressionError,
    )
    from debezium_server_iceberg_spark.streaming.windows import (
        run_vector_index_stream,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") < 100)
    b1 = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") % 2 == 0))
    b2 = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") % 2 == 1))

    # reference: same seed build + two direct admissions
    ref = IVFIndex.build(LakeCatalog(str(tmp_path / "ref")), "ann", "ivf", seed, n_cells=8)
    ref.add_batch(b1)
    ref.add_batch(b2)

    idx = IVFIndex.build(LakeCatalog(str(tmp_path / "str")), "ann", "ivf", seed, n_cells=8)
    indir = str(tmp_path / "vecs_in")
    os.makedirs(indir)
    for name, bdf in [("b1.jsonl", b1), ("b2.jsonl", b2)]:
        with open(f"{indir}/{name}", "w") as fh:
            for r in bdf.collect():
                fh.write(json.dumps(
                    {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
                ) + "\n")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(indir)
    q = run_vector_index_stream(stream, idx, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stored_ref = sorted(map(tuple, ref.table.to_df(spark).collect()))
    stored_str = sorted(map(tuple, idx.table.to_df(spark).collect()))
    assert stored_str == stored_ref
    # identical search results through the streamed index
    qids = [0, 7, 21]
    qm = _qmat(emb, qids)
    got = sorted(map(tuple, idx.search(spark, qids, k=5, n_probe=4, query_vecs=qm).collect()))
    want = sorted(map(tuple, ref.search(spark, qids, k=5, n_probe=4, query_vecs=qm).collect()))
    assert got == want
    # replay guard + regression guard (shared epoch contract)
    before = idx.table.row_count()
    assert idx.add_batch(b2, epoch_id=1) == 0
    assert idx.table.row_count() == before
    with pytest.raises(EpochRegressionError):
        idx.add_batch(b2, epoch_id=0)


def test_ivf_remove_vectors_stops_matching(spark, warehouse):
    """remove_vectors: one zero-read equality-delete commit; searches
    stop returning the removed vector immediately (scan_files applies
    current-snapshot deletes), re-removal is a no-op on results, and
    maintain materializes the tombstones without changing them."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IVFIndex.build(LakeCatalog(warehouse), "ann", "ivf_rm", emb, n_cells=8)

    before = idx.search(spark, [0], k=3, n_probe=8).collect()
    victim = next(r.neighbor_id for r in before if r.rank == 1)
    files_before = len(idx.table.current_files())
    idx.remove_vectors(spark, [victim])
    # zero-read: no data file was rewritten by the removal
    assert len(idx.table.current_files()) == files_before

    after = idx.search(spark, [0], k=3, n_probe=8).collect()
    assert victim not in {r.neighbor_id for r in after}
    assert sorted(r.rank for r in after) == [1, 2, 3]  # backfilled from cell

    # idempotent: re-deleting the same key changes nothing
    idx.remove_vectors(spark, [victim])
    again = idx.search(spark, [0], k=3, n_probe=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, after))

    # compaction folds the tombstones; results identical
    idx.maintain(spark, min_input_files=2)
    folded = idx.search(spark, [0], k=3, n_probe=8).collect()
    assert sorted(map(tuple, folded)) == sorted(map(tuple, after))
    live = {r["vec_id"] for r in idx.table.to_df(spark).select("vec_id").distinct().collect()}
    assert victim not in live


def test_ivfpq_remove_vectors_removes_all_segments(spark, warehouse):
    """IVFPQ stores m segment rows per vector; an equality delete on
    vec_id removes all of them, and ADC search stops returning the id."""
    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    dim = len(emb.first()["embedding"])
    idx = IVFPQIndex.build(
        LakeCatalog(warehouse), "ann", "pq_rm", emb, dim=dim, n_cells=4, m=4, ks=8
    )
    m = idx.m
    qids = [0]
    qm = _qmat(emb, qids)
    before = idx.search(spark, qids, qm, k=3, n_probe=4).collect()
    victim = next(r.neighbor_id for r in before if r.rank == 1)

    n0 = idx.table.to_df(spark).count()
    idx.remove_vectors(spark, [victim])
    resolved = idx.table.to_df(spark)
    assert resolved.count() == n0 - m  # every segment row of the vector went
    assert resolved.filter(F.col("vec_id") == victim).count() == 0
    after = idx.search(spark, qids, qm, k=3, n_probe=4).collect()
    assert victim not in {r.neighbor_id for r in after}


def test_soak_cdc_vector_feed_random_ops(spark, tmp_path):
    """Model-based soak for the FULL continuous-SemDeDup loop under CDC:
    a seeded random embedding history (create/update/delete chains
    across 4 epochs, one stream restart per epoch, one crash-replay in
    the middle) through run_vector_index_stream(op_col=, pairs_dir=,
    cluster_index=) must leave

    - the stored index rows IDENTICAL to a fresh index over the
      surviving vectors under the SAME frozen codebook (any
      removal/replay bug shows as a row diff),
    - every epoch's pairs_dir content equal to a numpy model
      (new-vs-history against the live stored state at that moment +
      exact in-batch pairs, rounded-cosine threshold, max-dedup),
    - the chained ClusterIndex resolution equal to a one-shot
      clustering of the union of all logged pairs."""
    import json as _json
    import os
    import random

    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.functions.incremental import ClusterIndex
    from debezium_server_iceberg_spark.functions.dedup import near_dup_clusters
    from debezium_server_iceberg_spark.streaming.windows import (
        run_vector_index_stream,
    )

    rng = random.Random(29)
    base = np.eye(4)

    def mkvec():
        v = base[rng.randrange(3)] + rng.choice([0.0, 0.02, 0.05]) * base[3]
        return [round(float(x), 3) for x in v]

    docs = list(range(1, 9))
    alive: dict[int, list] = {}
    ts = 0
    epochs = []
    for _ in range(4):
        events = []
        for d in rng.sample(docs, rng.randint(2, 6)):
            for _ in range(rng.randint(1, 2)):
                ts += 1
                if d not in alive:
                    v = mkvec()
                    events.append((d, v, "c", ts))
                    alive[d] = v
                elif rng.random() < 0.3:
                    events.append((d, None, "d", ts))
                    del alive[d]
                else:
                    v = mkvec()
                    events.append((d, v, "u", ts))
                    alive[d] = v
        epochs.append(events)

    THR, NCELLS = 0.9, 2
    seed_df = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = IVFIndex.build(
        LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", seed_df, n_cells=NCELLS
    )
    cl = ClusterIndex.create(LakeCatalog(str(tmp_path / "cl")), "dd", "cl")
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    pairs_dir = str(tmp_path / "pairs")
    os.makedirs(indir)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
            T.StructField("__op", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
        ]
    )

    def run_all():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(indir)
        q = run_vector_index_stream(
            stream, idx, ckpt, op_col="__op", ts_col="ts",
            pairs_dir=pairs_dir, pair_threshold=THR,
            pair_k=64, pair_n_probe=NCELLS,  # exact probe: modelable
            cluster_index=cl,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # numpy model of the stored live state (id -> vec), seeded rows first
    def rcos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 3)

    stored = {100: [1.0, 0.0, 0.0, 0.0], 101: [0.0, 1.0, 0.0, 0.0]}
    model_pairs: dict[int, set] = {}
    for e, events in enumerate(epochs):
        survivors = {}
        for d, v, op, t in sorted(events, key=lambda r: r[3]):
            survivors[d] = (v, op)
        touched = {d for d, _, op, _ in events if op in ("d", "u")}
        for d in touched:
            stored.pop(d, None)
        batch = {d: v for d, (v, op) in survivors.items() if op != "d"}
        ep = {}
        for d, v in batch.items():  # new-vs-history (k=64 >> candidates)
            for h, hv in stored.items():
                c = rcos(v, hv)
                if c >= THR:
                    key = (min(d, h), max(d, h))
                    ep[key] = max(ep.get(key, -1.0), c)
        bd = sorted(batch)
        for i in range(len(bd)):  # in-batch exact
            for j in range(i + 1, len(bd)):
                c = rcos(batch[bd[i]], batch[bd[j]])
                if c >= THR:
                    key = (bd[i], bd[j])
                    ep[key] = max(ep.get(key, -1.0), c)
        model_pairs[e] = {(a, b, c) for (a, b), c in ep.items()}
        stored.update(batch)

    for i, events in enumerate(epochs):
        with open(f"{indir}/e{i}.jsonl", "w") as fh:
            for vid, vec, op, t in events:
                fh.write(_json.dumps(
                    {"vec_id": vid, "embedding": vec, "__op": op, "ts": t}
                ) + "\n")
        run_all()  # restart per epoch: checkpoint recovery every time
        if i == 1:  # crash-replay epoch 1 (commit marker wiped)
            os.remove(os.path.join(ckpt, "commits", "1"))
            crc = os.path.join(ckpt, "commits", ".1.crc")
            if os.path.exists(crc):
                os.remove(crc)
            run_all()

    # per-epoch pairs ≡ model
    for e in range(len(epochs)):
        got = {
            (r.doc_a, r.doc_b, r.cosine)
            for r in spark.read.parquet(f"{pairs_dir}/epoch={e}").collect()
        }
        assert got == model_pairs[e], f"epoch {e}"
    assert any(model_pairs.values()), "seed produced no pairs; vacuous"

    # stored rows ≡ fresh index over survivors under the SAME codebook
    assert alive, "seed produced an empty surviving corpus"
    ref = IVFIndex.build(
        LakeCatalog(str(tmp_path / "ref")), "ann", "ivf", seed_df, n_cells=NCELLS
    )
    ref.add_batch(spark.createDataFrame(
        sorted(alive.items()), "vec_id long, embedding array<double>"
    ))
    got_rows = sorted(
        (r.vec_id, r.cell, tuple(r.embedding))
        for r in idx.table.to_df(spark).collect()
    )
    want_rows = sorted(
        (r.vec_id, r.cell, tuple(r.embedding))
        for r in ref.table.to_df(spark).collect()
    )
    assert got_rows == want_rows

    # chained cluster index ≡ one-shot over the union of logged pairs
    allp = spark.read.parquet(pairs_dir).select("doc_a", "doc_b")
    want_cl = {
        (r.doc, r.cluster_id, r.is_canonical)
        for r in near_dup_clusters(allp).collect()
    }
    got_cl = {
        (r.doc, r.cluster_id, r.is_canonical)
        for r in cl.resolve(spark).collect()
    }
    assert got_cl == want_cl


def test_vector_index_stream_op_aware_cdc(spark, tmp_path):
    """CDC-aware vector feed (op_col): an updated embedding stops
    matching under its OLD direction and matches under its NEW one, a
    deleted vector disappears, and a crash-replayed epoch (commit
    marker wiped) does not let the replayed removal erase the first
    attempt's re-added rows."""
    import json
    import os

    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.streaming.windows import (
        run_vector_index_stream,
    )

    E1, E2, E3 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]
    seed = spark.createDataFrame(
        [(1, E1), (2, E2)], "vec_id long, embedding array<double>"
    )
    idx = IVFIndex.build(LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", seed, n_cells=2)

    indir, ckpt = str(tmp_path / "vecs_in"), str(tmp_path / "ckpt")
    os.makedirs(indir)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
            T.StructField("__op", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
        ]
    )

    def write_ops(name, rows):
        with open(f"{indir}/{name}", "w") as fh:
            for vid, vec, op, ts in rows:
                fh.write(
                    json.dumps(
                        {"vec_id": vid, "embedding": vec, "__op": op, "ts": ts}
                    )
                    + "\n"
                )

    from debezium_server_iceberg_spark.streaming.progress import RemovalCounters

    counters = RemovalCounters()

    def run_all():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(indir)
        q = run_vector_index_stream(
            stream, idx, ckpt, op_col="__op", ts_col="ts", counters=counters
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_ops("e0.jsonl", [(10, E1, "c", 1), (11, E2, "c", 2)])
    run_all()
    # epoch 1: update 10 -> E3 (old row must go), delete 11, create 12
    write_ops("e1.jsonl", [(10, E3, "u", 3), (11, E2, "d", 4), (12, E2, "c", 5)])
    run_all()
    # observability parity with the dedup feed: epoch 1 removed the
    # updated and deleted ids; id-keyed removal never skips
    assert counters.epochs[1] == {"removed": 2, "skipped_null_before": 0}

    live = {
        r["vec_id"]
        for r in idx.table.to_df(spark).select("vec_id").distinct().collect()
    }
    assert live == {1, 2, 10, 12}  # 11 deleted; 10 present once, re-encoded
    state = sorted(map(tuple, idx.table.to_df(spark).collect()))

    # 10 matches its NEW direction at rank 1...
    got = idx.search(spark, [99], k=1, n_probe=2, query_vecs=np.array([E3])).collect()
    assert got[0].neighbor_id == 10 and got[0].cosine == 1.0
    # ...and its OLD row is gone: without the removal, 10's stale E1 row
    # would take rank 2 here (cos 1.0); with it, rank 2 falls to a
    # zero-cos candidate
    old = idx.search(spark, [99], k=2, n_probe=2, query_vecs=np.array([E1])).collect()
    assert [r.neighbor_id for r in sorted(old, key=lambda r: r.rank)] == [1, 2]

    # crash window: epoch 1 fully durable, its commit marker wiped — the
    # replayed removal must be skipped by the front-of-process guard
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_all()
    assert sorted(map(tuple, idx.table.to_df(spark).collect())) == state


def test_emit_epoch_pairs_multichunk_spill_matches_numpy(spark, tmp_path):
    """The pairs body's chunked-GEMM spill path (chunk < n forces
    multiple staging appends) produces exactly the numpy brute-force
    pairs at the rounded-cosine threshold, with no staging debris
    visible to a pairs_dir reader — pins the r14 bounded-driver-memory
    rewrite (ADVICE: pair volume must never accumulate driver-side)."""
    import numpy as np

    from debezium_server_iceberg_spark.streaming.windows import (
        emit_vector_epoch_pairs,
    )

    rng = np.random.default_rng(7)
    n, dim = 3000, 8  # chunk = 8M // 3000 = 2666 < n => 2 chunks
    vecs = rng.normal(size=(n, dim))
    batch = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    # empty index (train-then-add): all pairs come from the in-batch GEMM
    idx = IVFIndex.build(
        LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", batch,
        n_cells=4, admit_rows=False,
    )
    pairs_dir = str(tmp_path / "pairs")
    thr = 0.8
    emit_vector_epoch_pairs(
        idx, batch, pairs_dir=pairs_dir, epoch_id=0,
        pair_threshold=thr, pair_n_probe=4, pair_k=64,
    )
    vn = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = np.round(vn @ vn.T, 3)
    want = {
        (i, j, sims[i, j])
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= thr
    }
    assert want, "seed produced no pairs; test would be vacuous"
    got = {
        (r.doc_a, r.doc_b, r.cosine)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert got == want
    # staging cleaned up; even if it weren't, the underscore prefix
    # hides it from the partitioned read above
    import os

    assert not any(e.startswith("_staging") for e in os.listdir(pairs_dir))


def test_vector_index_stream_pairs_semantic_dedup(spark, tmp_path):
    """pairs_dir: continuous semantic dedup — each epoch's cosine
    near-dup pairs (new-vs-history via the pruned index search +
    new-vs-new exact in-batch) land in pairs_dir/epoch=N before the
    stamped append; a crash-replayed epoch does not clobber them."""
    import json
    import os

    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.streaming.windows import (
        run_vector_index_stream,
    )

    seed = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = IVFIndex.build(LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", seed, n_cells=2)

    indir, ckpt, pairs = str(tmp_path / "in"), str(tmp_path / "ckpt"), str(tmp_path / "pairs")
    os.makedirs(indir)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def write_vecs(name, rows):
        with open(f"{indir}/{name}", "w") as fh:
            for vid, vec in rows:
                fh.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")

    def run_all():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(indir)
        q = run_vector_index_stream(
            stream, idx, ckpt,
            pairs_dir=pairs, pair_threshold=0.95, pair_n_probe=2,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # epoch 0: 10 is a near-dup of stored 1; 11 is new direction
    write_vecs("e0.jsonl", [(10, [0.999, 0.01, 0.0, 0.0]), (11, [0.0, 0.0, 1.0, 0.0])])
    run_all()
    e0 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(f"{pairs}/epoch=0").collect()}
    assert e0 == {(1, 10)}

    # epoch 1: 12 and 13 are near-identical (new-vs-new) AND both are
    # near-dups of stored 11 (new-vs-history)
    write_vecs("e1.jsonl", [(12, [0.0, 0.0, 0.9, 0.1]), (13, [0.0, 0.0, 0.9, 0.1])])
    run_all()
    e1 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(f"{pairs}/epoch=1").collect()}
    assert e1 == {(11, 12), (11, 13), (12, 13)}

    state = sorted(map(tuple, idx.table.to_df(spark).collect()))
    # crash window: epoch 1 durable, commit marker wiped — replay must
    # not recompute/clobber pairs nor double-append
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_all()
    assert {(r.doc_a, r.doc_b) for r in spark.read.parquet(f"{pairs}/epoch=1").collect()} == e1
    assert sorted(map(tuple, idx.table.to_df(spark).collect())) == state

    # IVFPQ refused: ADC distances are not cosines
    import pytest

    from debezium_server_iceberg_spark.functions.ann_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(32)
    dim = len(emb.first()["embedding"])
    pq = IVFPQIndex.build(
        LakeCatalog(str(tmp_path / "wh2")), "ann", "pq", emb, dim=dim, n_cells=2, m=4, ks=8
    )
    with pytest.raises(ValueError, match="IVFIndex"):
        run_vector_index_stream(None, pq, ckpt, pairs_dir=pairs)


def test_vector_stream_cluster_chain(spark, tmp_path):
    """The full continuous SemDeDup loop: embeddings stream in, cosine
    pairs stream out, and a chained ClusterIndex keeps queryable
    cluster assignments — identical to clustering all emitted pairs
    one-shot (min-id canonical)."""
    import json
    import os

    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.functions.incremental import ClusterIndex
    from debezium_server_iceberg_spark.streaming.windows import (
        run_vector_index_stream,
    )

    seed = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = IVFIndex.build(LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", seed, n_cells=2)
    clusters = ClusterIndex.create(LakeCatalog(str(tmp_path / "cl")), "ann", "cc")

    indir, ckpt, pairs = str(tmp_path / "in"), str(tmp_path / "ckpt"), str(tmp_path / "pairs")
    os.makedirs(indir)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def write_vecs(name, rows):
        with open(f"{indir}/{name}", "w") as fh:
            for vid, vec in rows:
                fh.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")

    def run_all():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(indir)
        q = run_vector_index_stream(
            stream, idx, ckpt,
            pairs_dir=pairs, pair_threshold=0.95, pair_n_probe=2,
            cluster_index=clusters,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_vecs("e0.jsonl", [(10, [0.999, 0.01, 0.0, 0.0]), (11, [0.0, 0.0, 1.0, 0.0])])
    run_all()
    # epoch 1 merges across epochs: 12 pairs with stored 11 AND with 13
    write_vecs("e1.jsonl", [(12, [0.0, 0.0, 0.9, 0.1]), (13, [0.0, 0.0, 0.9, 0.1])])
    run_all()

    got = {
        (r.doc, r.cluster_id, r.is_canonical)
        for r in clusters.resolve(spark).collect()
    }
    assert got == {
        (1, 1, True), (10, 1, False),
        (11, 11, True), (12, 11, False), (13, 11, False),
    }
    # replay: wiped marker reruns the epoch; cluster state unchanged
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_all()
    assert {
        (r.doc, r.cluster_id, r.is_canonical)
        for r in clusters.resolve(spark).collect()
    } == got

    # cluster_index without pairs_dir is a config error
    import pytest

    with pytest.raises(ValueError, match="pairs_dir"):
        run_vector_index_stream(None, idx, ckpt, cluster_index=clusters)


def test_emit_epoch_pairs_cells_guard_trips_below_row_guard(spark, tmp_path):
    """r15 byte-aware guard: a WIDE-embedding batch whose row count is
    fine can still be driver-hostile (rows x dim float64 cells); the
    cells bound trips first, with the same loud backfill hint, and the
    row guard stays intact above it."""
    import pytest as _pt

    from debezium_server_iceberg_spark.streaming.windows import (
        emit_vector_epoch_pairs,
    )

    batch = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 0.25]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    idx = IVFIndex.build(
        LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", batch,
        n_cells=2, admit_rows=False,
    )
    pairs_dir = str(tmp_path / "pairs")
    # 10 rows x dim 4 = 40 cells > 32: cells guard fires below the
    # 100-row guard
    with _pt.raises(ValueError, match="max_pair_batch_cells"):
        emit_vector_epoch_pairs(
            idx, batch, pairs_dir=pairs_dir, epoch_id=0,
            max_pair_batch_rows=100, max_pair_batch_cells=32,
        )
    import os

    assert not os.path.exists(f"{pairs_dir}/epoch=0")  # nothing written
    # at a sane cells bound the same batch sails through
    emit_vector_epoch_pairs(
        idx, batch, pairs_dir=pairs_dir, epoch_id=0,
        max_pair_batch_rows=100, max_pair_batch_cells=1_000,
    )
    assert os.path.exists(f"{pairs_dir}/epoch=0")
    # row guard unchanged: rows trip their own message
    with _pt.raises(ValueError, match="max_pair_batch_rows"):
        emit_vector_epoch_pairs(
            idx, batch, pairs_dir=pairs_dir, epoch_id=1,
            max_pair_batch_rows=5, max_pair_batch_cells=1_000,
        )


def test_vector_feed_counters_record_after_removal_commit(spark, tmp_path):
    """r15 (VERDICT nit 3): RemovalCounters.record runs AFTER the
    removal commit — a failed remove_vectors must not count as removed
    (at-least-once observability should not over-report)."""
    import os

    import pytest as _pt

    from debezium_server_iceberg_spark.functions.ann_index import IVFIndex
    from debezium_server_iceberg_spark.streaming.progress import RemovalCounters
    from debezium_server_iceberg_spark.streaming.windows import (
        run_vector_index_stream,
    )

    seed = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    idx = IVFIndex.build(
        LakeCatalog(str(tmp_path / "wh")), "ann", "ivf", seed, n_cells=2
    )
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(indir)
    with open(f"{indir}/b0.jsonl", "w") as fh:
        fh.write('{"vec_id": 1, "embedding": [9.0, 9.0], "__op": "d"}\n')
    counters = RemovalCounters()
    boom = RuntimeError("removal refused (test)")

    def failing_remove(self, *a, **kw):
        raise boom

    orig = IVFIndex.remove_vectors
    IVFIndex.remove_vectors = failing_remove
    try:
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>, __op string"
        ).json(indir)
        q = run_vector_index_stream(
            stream, idx, ckpt, op_col="__op", counters=counters
        )
        with _pt.raises(Exception, match="removal refused"):
            q.processAllAvailable()
        q.stop()
    finally:
        IVFIndex.remove_vectors = orig
    assert counters.epochs == {}  # nothing recorded for the failed epoch
    assert counters.total_removed == 0
