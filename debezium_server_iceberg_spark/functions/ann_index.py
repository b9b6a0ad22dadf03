"""Persistent IVF (inverted-file) ANN index backed by a lakehouse table.

The one-shot ``similarity.ivf_topk`` re-assigns every vector to a cell on
each call; at corpus scale the assignment IS the index and must live on
disk. Here the cell assignment is stored once in a lakehouse table
PARTITIONED BY identity(cell), so a search probing ``n_probe`` cells
plans with the manifest's partition values and READS ONLY THOSE CELLS'
FILES — disk-level IVF, the same file-skipping a Faiss inverted list
gives in memory (cf. Jégou et al., "Product Quantization for Nearest
Neighbor Search", the IVF coarse-quantizer half):

- build: pick ``n_cells`` deterministic centroids (hash-lowest ids — swap
  in k-means when a training pass is affordable), assign every vector
  with one broadcast-codebook GEMM pass (``mapInPandas``), append
  partitioned by cell; centroids persist in table properties.
- search: score the probed cells' files only; exact cosine rerank inside
  them (the same windowed top-k the exact path uses).
- add_batch: assign new vectors against the FROZEN codebook and append —
  incremental growth without touching stored cells (centroid drift is
  handled by a periodic rebuild, as in every IVF system).

Scale notes: per-search I/O is |probed cells| / |cells| of the corpus;
the codebook is tiny and broadcast; appends are cell-partitioned so
compaction (LakeTable.compact) bin-packs within cells.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..lakehouse.catalog import LakeCatalog
from ..lakehouse.table import LakeTable
from .similarity import _l2_normalize, _vec_matrix


def _hash_codebook(df: DataFrame, n_cells: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic no-training codebook: the vectors whose ids hash
    lowest (distributed top-k by hash — only n_cells rows reach the
    driver)."""
    cent_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.crc32(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    return _l2_normalize(
        np.array([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])
    )


def train_kmeans_codebook(
    df: DataFrame,
    n_cells: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means (Lloyd's on the unit sphere) trained distributed:

    - init: the deterministic hash-lowest codebook (no RNG state — reruns
      converge to the identical codebook);
    - each iteration: one Arrow-batched ``mapInPandas`` pass GEMMs every
      partition against the broadcast codebook and emits ONE partial
      (cell, count, sum-vector) row per non-empty cell per batch, then a
      per-cell ``applyInPandas`` reduce sums partials — driver traffic is
      n_cells rows per iteration regardless of corpus size;
    - update: centroid = L2-normalized member mean (max-cosine assignment
      and the mean direction are the spherical k-means pair); empty cells
      keep their previous centroid.

    Cost: n_iters scans; assignment quality typically cuts probed-cell
    imbalance vs the hash codebook, which is what recall@k per probed
    cell buys (pytest asserts trained >= hash recall on fixture data)."""
    cmat = _hash_codebook(df, n_cells, id_col, vec_col)
    part_schema = "cell int, n long, s array<double>"

    for _ in range(n_iters):
        cm = cmat  # freeze for closure

        def partials(batches, cm=cm):
            sums = None
            counts = np.zeros(len(cm), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = _l2_normalize(_vec_matrix(pdf[vec_col]))
                if sums is None:
                    sums = np.zeros((len(cm), vecs.shape[1]))
                cells = np.argmax(vecs @ cm.T, axis=1)
                np.add.at(sums, cells, vecs)
                counts += np.bincount(cells, minlength=len(cm))
            if sums is None:
                return
            live = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "cell": live.astype("int32"),
                    "n": counts[live],
                    "s": [sums[c].tolist() for c in live],
                }
            )

        part = df.select(vec_col).mapInPandas(partials, part_schema)

        def reduce_cell(key, pdf):
            s = np.sum(np.stack([np.asarray(v) for v in pdf["s"]]), axis=0)
            return pd.DataFrame(
                {"cell": [key[0]], "n": [int(pdf["n"].sum())], "s": [s.tolist()]}
            )

        agg = (
            part.groupBy("cell").applyInPandas(reduce_cell, part_schema).collect()
        )
        new = cmat.copy()
        for r in agg:
            if r["n"]:
                new[r["cell"]] = np.asarray(r["s"]) / r["n"]
        cmat = _l2_normalize(new)
    return cmat


class IVFIndex:
    def __init__(self, table: LakeTable) -> None:
        self.table = table
        props = table.metadata().properties
        self.centroids = np.array(json.loads(props["ivf.centroids"]))
        self.n_cells = int(props["ivf.n-cells"])

    # ------------------------------------------------------------ build
    @staticmethod
    def build(
        catalog: LakeCatalog,
        namespace: str,
        name: str,
        df: DataFrame,
        n_cells: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        train: str = "hash",
        train_iters: int = 5,
        admit_rows: bool = True,
    ) -> "IVFIndex":
        """``train='hash'`` uses the zero-pass deterministic codebook;
        ``train='kmeans'`` runs ``train_iters`` spherical-k-means passes
        first (better-balanced cells, higher recall per probed cell).
        ``admit_rows=False`` trains the codebook on ``df`` but stores
        NOTHING — the FAISS train-then-add shape, seeding an empty index
        for a streaming feed (``run_vector_index_stream``) whose epochs
        admit the rows."""
        if train == "kmeans":
            cmat = train_kmeans_codebook(
                df, n_cells, n_iters=train_iters, id_col=id_col, vec_col=vec_col
            )
        elif train == "hash":
            cmat = _hash_codebook(df, n_cells, id_col, vec_col)
        else:
            raise ValueError(f"unknown trainer {train!r}")
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("cell", T.IntegerType()),
                T.StructField("embedding", df.schema[vec_col].dataType),
            ]
        )
        from ..lakehouse.transforms import parse_partition_spec

        table = catalog.create_table(
            namespace,
            name,
            schema,
            # `vec_id` declares the DELETE key (remove_vectors' equality-
            # delete target), mirroring the dedup indexes' removal parity
            identifier_fields=["vec_id"],
            partition_spec=parse_partition_spec("cell"),
            properties={
                "ivf.centroids": json.dumps([[float(x) for x in c] for c in cmat]),
                "ivf.n-cells": str(n_cells),
            },
        )
        idx = IVFIndex(table)
        if admit_rows:
            idx.add_batch(df, id_col=id_col, vec_col=vec_col)
        return idx

    # ------------------------------------------------------- incremental
    def add_batch(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        epoch_id: int | None = None,
    ) -> int:
        """Assign against the frozen codebook and append (cell-partitioned).

        ``epoch_id`` (streaming feeds — ``run_vector_index_stream``) makes
        the append idempotent via the shared snapshot-summary stamp
        (``incremental.epoch_already_applied``): a replayed micro-batch
        appends nothing and returns 0; an epoch regression raises."""
        from .incremental import epoch_already_applied

        if epoch_already_applied(self.table, epoch_id):
            return 0
        cmat = self.centroids

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = _l2_normalize(_vec_matrix(pdf[vec_col]))
                cells = np.argmax(vecs @ cmat.T, axis=1).astype("int32")
                yield pd.DataFrame(
                    {
                        "vec_id": pdf[id_col].to_numpy(),
                        "cell": cells,
                        "embedding": pdf[vec_col],
                    }
                )

        assigned = df.select(id_col, vec_col).mapInPandas(
            assign,
            schema=self.table.metadata().schema,
        )
        # rows added come from the commit's own file stats — the assignment
        # GEMM runs exactly once (a pre-count would compute it twice)
        before = self.table.row_count()
        self.table.append(
            assigned,
            summary={"epoch_id": str(epoch_id)} if epoch_id is not None else None,
        )
        return self.table.row_count() - before

    def remove_vectors(self, spark, vec_ids) -> int:
        """CDC deletes propagate into the index: ALL stored rows of the
        given vectors (one row here; m segment rows in
        :class:`IVFPQIndex`) are equality-deleted in one merge-on-read
        commit — zero reads of stored data, the reference's
        equality-delta shape (BaseDeltaTaskWriter.java:60-71) — so
        searches stop returning them immediately (``scan_files``
        applies current-snapshot deletes); ``maintain``/compaction
        materializes the tombstones.  ``vec_ids`` is a list of ids or a
        DataFrame with a ``vec_id`` column.  Replay-safe by IDEMPOTENCE
        (re-deleting the same keys matches nothing new), matching
        ``MinHashIndex.remove_docs`` — the streaming feed
        (``run_vector_index_stream(op_col=)``) routes removals without
        an epoch stamp; only the re-admitting append carries the guard.
        Requires the table to declare ``vec_id`` as its identifier
        field (indexes built before removal support need a rebuild —
        ``commit_row_delta`` raises on them).  Returns the deleted key
        count."""
        if "vec_id" not in self.table.metadata().identifier_fields:
            # pre-removal-support index tables (built before r13 declared
            # the delete key) would otherwise fail per-batch inside the
            # streaming feed's foreachBatch with the generic
            # commit_row_delta error and no hint that a rebuild fixes it
            raise ValueError(
                f"index table {self.table.location} does not declare "
                "vec_id as an identifier field (built before removal "
                "support) — rebuild the index (build() on the live "
                "corpus) to enable remove_vectors / op-aware streaming"
            )
        if isinstance(vec_ids, DataFrame):
            keys = vec_ids.select(F.col("vec_id").cast("long").alias("vec_id"))
        else:
            keys = spark.createDataFrame(
                [(int(v),) for v in vec_ids] or [], "vec_id long"
            )
        _, deleted = self.table.commit_row_delta(
            None, keys, summary={"operation_detail": "remove-vectors"}
        )
        return deleted

    def maintain(
        self, spark, min_input_files: int = 8, max_input_files: int | None = 256
    ) -> int:
        """Bin-pack per-batch appends (compaction recomputes partition
        transforms from rows, so the cell layout — and search-time
        partition pruning — survives).  ``max_input_files`` bounds one
        pass so a streaming cadence never rewrites the whole index.
        Atomic swap; returns files removed."""
        return self.table.compact(
            spark, min_input_files=min_input_files, max_input_files=max_input_files
        )

    # ------------------------------------------------------------ search
    def probed_files(
        self, query_vecs: np.ndarray, n_probe: int
    ) -> tuple[list, dict[int, list[int]]]:
        """Manifest-level planning: per-query n_probe nearest cells, plus
        the files whose partition cell any query probes. Driver-side, no
        Spark job."""
        qn = _l2_normalize(query_vecs)
        per_query: dict[int, list[int]] = {}
        cells: set[int] = set()
        for i, qv in enumerate(qn):
            order = np.argsort(-(self.centroids @ qv))[:n_probe]
            per_query[i] = [int(c) for c in order]
            cells.update(per_query[i])
        files = [
            f
            for f in self.table.current_files()
            if f.partition.get("_p_cell") is None
            or int(f.partition["_p_cell"]) in cells
        ]
        return files, per_query

    def search(
        self,
        spark: SparkSession,
        query_ids: list[int],
        k: int = 5,
        n_probe: int = 4,
        query_vecs: np.ndarray | None = None,
    ) -> DataFrame:
        """Top-k cosine neighbors, scanning only the probed cells' files.

        Per-query probe semantics: each query joins candidates from ITS
        OWN n_probe cells only (probe rows carry (qid, cell)), so results
        are independent of which other queries share the batch.

        ``query_vecs`` (row-aligned with ``query_ids``) skips the id
        lookup entirely — the right call shape at scale, where scanning
        the corpus for k query rows would dwarf the pruned candidate
        read. Without it, ids are resolved via a column-pruned scan of
        the stored table (fine for interactive use, documented cost)."""
        if query_vecs is not None:
            qpairs = list(zip(query_ids, np.asarray(query_vecs, dtype=np.float64)))
        else:
            q_rows = (
                self.table.to_df(spark)
                .filter(F.col("vec_id").isin(query_ids))
                .select("vec_id", "embedding")
                .collect()
            )
            qpairs = [
                (int(r["vec_id"]), np.asarray(r["embedding"], dtype=np.float64))
                for r in q_rows
            ]
        empty = spark.createDataFrame(
            [], schema="query_id long, rank int, neighbor_id long, cosine double"
        )
        if not qpairs:
            return empty
        qmat = np.array([v for _, v in qpairs])
        files, per_query = self.probed_files(qmat, n_probe)
        if not files:
            return empty
        qn = _l2_normalize(qmat)
        # per-cell query blocks, driver-held and shipped in the function
        # closure (the probe relation is planning-scale: |Q| * n_probe):
        # a candidate is scored ONLY against the queries probing its cell
        # — the same per-query n_probe semantics the former broadcast
        # equi-join enforced in-plan, now enforced by the cell lookup.
        cell_q: dict[int, list[int]] = {}
        for i, cells in per_query.items():
            for c in cells:
                cell_q.setdefault(int(c), []).append(i)
        qid_arr = np.array([int(qid) for qid, _ in qpairs], dtype=np.int64)
        cell_blocks = {
            c: (qid_arr[idxs], qn[idxs]) for c, idxs in cell_q.items()
        }
        k_local = int(k)
        dim = int(qn.shape[1])
        # executor-side broadcast: the query blocks (|Q|*n_probe*dim
        # doubles) deserialize once per executor instead of riding the
        # mapInPandas closure serialized into EVERY task (guide §4.5)
        bc_blocks = spark.sparkContext.broadcast(cell_blocks)

        # Arrow-batched scoring (one GEMM per (batch, cell) block) in
        # place of the per-pair interpreted zip_with/aggregate fold: the
        # higher-order-function path evaluated ~dim lambda steps per
        # (candidate x query) pair — the dominant cost of an exact probe
        # (n_probe = n_cells), measured 6x+ on the streaming-pairs gate.
        # cosine keeps the exact formula shape: dot(raw, qn) / ||raw||;
        # zero-norm candidates drop, as the former nullif-null filter did.
        # Per-batch partial top-k bounds the shuffle into the final
        # window at k rows per (query, batch) — at scale the reduce side
        # ranks shortlists, never the full scored relation.
        def _score(batches):
            blocks = bc_blocks.value  # one deserialize per executor
            for pdf in batches:
                if not len(pdf):
                    continue
                outs = []
                for c, grp in pdf.groupby("cell"):
                    blk = blocks.get(int(c))
                    if blk is None:
                        continue
                    qids_c, qmat_c = blk
                    # drop null/odd-length embeddings BEFORE stacking
                    # (matching the former plan's nullif/isNotNull drop
                    # semantics; a ragged np.array would raise and fail
                    # the task)
                    keep = [
                        i
                        for i, v in enumerate(grp["embedding"])
                        if v is not None and len(v) == dim
                    ]
                    if not keep:
                        continue
                    sub = grp.iloc[keep]
                    raw = np.array(
                        [np.asarray(v, dtype=np.float64) for v in sub["embedding"]]
                    )
                    vids = sub["vec_id"].to_numpy(dtype=np.int64)
                    norms = np.linalg.norm(raw, axis=1)
                    ok = norms > 0.0
                    if not ok.any():
                        continue
                    raw, vids, norms = raw[ok], vids[ok], norms[ok]
                    cos = (raw @ qmat_c.T) / norms[:, None]
                    for j in range(cos.shape[1]):
                        col, ids = cos[:, j], vids
                        m = ids != qids_c[j]
                        col, ids = col[m], ids[m]
                        if not len(col):
                            continue
                        order = np.lexsort((ids, -col))[:k_local]
                        outs.append(
                            pd.DataFrame(
                                {
                                    "qid": np.full(
                                        len(order), qids_c[j], dtype=np.int64
                                    ),
                                    "vec_id": ids[order],
                                    "cos": col[order],
                                }
                            )
                        )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        cand = self.table.scan_files(spark, files)
        scored = cand.select("vec_id", "cell", "embedding").mapInPandas(
            _score, schema="qid long, vec_id long, cos double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.col("qid").alias("query_id"),
                "rank",
                F.col("vec_id").alias("neighbor_id"),
                F.round("cos", 3).alias("cosine"),
            )
        )


class IVFPQIndex:
    """Persistent IVF-PQ: the cell-partitioned STORED-CODES layout the
    one-shot ``pq.ivfpq_adc_topk`` names as its scale gap (its
    codes-to-cells join is corpus x corpus at every call; here codes
    live on disk partitioned by cell, so a search is a partition-pruned
    file scan + two broadcast joins — no corpus-sized join at query
    time at all).  Mirrors :class:`IVFIndex` (raw-vector cells) but the
    stored rows are ``(vec_id, cell, s, code)`` — m narrow-int rows per
    vector, the FAISS ``IVFxx,PQyy`` inverted-list layout expressed as
    a lakehouse table:

    - build: ONE Arrow pass computes the coarse cell (GEMM vs the
      broadcast coarse codebook) AND the m PQ codes (sequential-fold
      argmin vs the frozen PQ codebooks) per vector, then appends
      partitioned by cell — raw vectors are read exactly once, and the
      one-shot path's corpus x corpus codes-to-cells SMJ never exists;
    - search: the per-query ADC lookup table (|Q| * m * ks doubles) is
      computed driver-side with the same sequential fold and broadcast;
      candidates come ONLY from probed cells' files (manifest-level
      pruning, zero Spark jobs to plan); the scan is join-broadcast-
      probes + join-broadcast-LUT + one (qid, vec_id) partial-agg sum —
      per-search I/O is ~n_probe/n_cells of the CODES (m bytes/vector),
      not of the raw vectors;
    - add_batch: encode against the FROZEN codebooks and append into
      cell partitions (batch update == rebuild given the same
      codebooks; codebook drift is a periodic-rebuild concern, as in
      every IVF system).

    Both codebooks persist in table properties (n_cells * dim +
    m * ks * dim/m doubles — planning-scale JSON).  The fold-order
    contract (``pq.seq_fold_d2_batch``) keeps every stored code and
    every LUT entry bit-identical to the in-plan ``pq_encode`` /
    ``pq_adc_topk`` arithmetic, which is what lets exhaustive probing
    reuse the brute-force-over-codes oracle."""

    def __init__(self, table: LakeTable) -> None:
        self.table = table
        props = table.metadata().properties
        self.centroids = np.array(json.loads(props["ivf.centroids"]))
        self.n_cells = int(props["ivf.n-cells"])
        self.codebooks = np.array(json.loads(props["pq.codebooks"]))
        self.code_ids = json.loads(props["pq.code-ids"])
        self.dim = int(props["pq.dim"])
        self.m = int(props["pq.m"])
        self.ks = int(props["pq.ks"])

    # ------------------------------------------------------------ build
    @staticmethod
    def build(
        catalog: LakeCatalog,
        namespace: str,
        name: str,
        df: DataFrame,
        dim: int,
        n_cells: int = 16,
        m: int = 8,
        ks: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        train: str = "hash",
        train_iters: int = 5,
    ) -> "IVFPQIndex":
        from ..lakehouse.transforms import parse_partition_spec
        from .pq import collect_pq_codebooks

        if train == "kmeans":
            cmat = train_kmeans_codebook(
                df, n_cells, n_iters=train_iters, id_col=id_col, vec_col=vec_col
            )
        elif train == "hash":
            cmat = _hash_codebook(df, n_cells, id_col, vec_col)
        else:
            raise ValueError(f"unknown trainer {train!r}")
        cb, code_ids = collect_pq_codebooks(df, dim, m, ks, id_col, vec_col)
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("cell", T.IntegerType()),
                T.StructField("s", T.IntegerType()),
                T.StructField("code", T.LongType()),
            ]
        )
        table = catalog.create_table(
            namespace,
            name,
            schema,
            # `vec_id` declares the DELETE key (one vector owns m segment
            # rows), not row uniqueness — remove_vectors' equality target
            identifier_fields=["vec_id"],
            partition_spec=parse_partition_spec("cell"),
            properties={
                "ivf.centroids": json.dumps([[float(x) for x in c] for c in cmat]),
                "ivf.n-cells": str(n_cells),
                "pq.codebooks": json.dumps(
                    [[[float(x) for x in c] for c in sub] for sub in cb]
                ),
                "pq.code-ids": json.dumps([int(c) for c in code_ids]),
                "pq.dim": str(dim),
                "pq.m": str(m),
                "pq.ks": str(ks),
            },
        )
        idx = IVFPQIndex(table)
        idx.add_batch(df, id_col=id_col, vec_col=vec_col)
        return idx

    # ------------------------------------------------------- incremental
    def add_batch(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        epoch_id: int | None = None,
    ) -> int:
        """One Arrow pass: coarse cell + all m PQ codes per vector
        against the FROZEN codebooks, appended cell-partitioned.  The
        raw vectors are read once and never stored.

        ``epoch_id`` (streaming feeds — ``run_vector_index_stream``)
        makes the append idempotent; replays return 0, regressions
        raise (``incremental.epoch_already_applied``)."""
        from .incremental import epoch_already_applied
        from .pq import seq_fold_d2_batch

        if epoch_already_applied(self.table, epoch_id):
            return 0

        cmat = self.centroids
        cb = self.codebooks
        code_ids = np.asarray(self.code_ids, dtype=np.int64)
        m, dsub = self.m, self.dim // self.m

        def encode(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf[id_col].to_numpy()
                vecs = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                vn = _l2_normalize(vecs)
                cells = np.argmax(vn @ cmat.T, axis=1).astype("int32")
                out_id, out_cell, out_s, out_code = [], [], [], []
                for s in range(m):
                    sub = vecs[:, s * dsub : (s + 1) * dsub]
                    # sequential fold == pq_encode's _fold_d2; argmin's
                    # first-occurrence rule == ties to the lower code id
                    codes = code_ids[np.argmin(seq_fold_d2_batch(sub, cb[s]), axis=1)]
                    out_id.extend(ids)
                    out_cell.extend(cells)
                    out_s.extend([s] * len(ids))
                    out_code.extend(codes)
                yield pd.DataFrame(
                    {
                        "vec_id": out_id,
                        "cell": pd.array(out_cell, dtype="int32"),
                        "s": pd.array(out_s, dtype="int32"),
                        "code": out_code,
                    }
                )

        assigned = df.select(id_col, vec_col).mapInPandas(
            encode, schema=self.table.metadata().schema
        )
        before = self.table.row_count()
        self.table.append(
            assigned,
            summary={"epoch_id": str(epoch_id)} if epoch_id is not None else None,
        )
        return self.table.row_count() - before

    maintain = IVFIndex.maintain
    remove_vectors = IVFIndex.remove_vectors

    # ------------------------------------------------------------ search
    def probed_files(
        self, query_vecs: np.ndarray, n_probe: int
    ) -> tuple[list, dict[int, list[int]]]:
        """Manifest-level planning (same as :meth:`IVFIndex.probed_files`):
        per-query n_probe nearest cells + the files any query probes."""
        qn = _l2_normalize(query_vecs)
        per_query: dict[int, list[int]] = {}
        cells: set[int] = set()
        for i, qv in enumerate(qn):
            order = np.argsort(-(self.centroids @ qv))[:n_probe]
            per_query[i] = [int(c) for c in order]
            cells.update(per_query[i])
        files = [
            f
            for f in self.table.current_files()
            if f.partition.get("_p_cell") is None
            or int(f.partition["_p_cell"]) in cells
        ]
        return files, per_query

    def search(
        self,
        spark: SparkSession,
        query_ids: list[int],
        query_vecs: np.ndarray,
        k: int = 5,
        n_probe: int = 4,
        rerank_source: DataFrame | None = None,
        rerank_expand: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k over the probed cells only.  ``query_vecs`` is
        row-aligned with ``query_ids`` and REQUIRED: the index stores
        codes, not raw vectors, so queries cannot be resolved from the
        table (by design — the raw corpus stays in its source table).

        Returns ``(query_id, rank, neighbor_id, adc_dist2)`` —
        the :func:`pq.pq_adc_topk` output contract.

        ``rerank_source`` enables the standard final step of a
        production IVF-PQ pipeline (Jégou et al. §V.C): fetch an
        EXPANDED ADC shortlist (``k * rerank_expand`` per query), join
        it against the raw-vector table, and re-rank by exact cosine —
        quantization error never decides the final order.  The join is
        shortlist-sized (|Q| * k * expand rows, broadcast) against the
        source scan, so the raw corpus is touched once, by id.  With
        rerank the return contract is ``(query_id, rank, neighbor_id,
        cosine)`` — the :func:`similarity.cosine_topk` shape."""
        from .pq import seq_fold_d2_batch

        # the empty frame must match the NON-empty path's contract: ADC
        # shape without rerank, cosine shape with — downstream unions/
        # writes break on a schema that flips with the row count
        empty = spark.createDataFrame(
            [],
            schema=(
                "query_id long, rank int, neighbor_id long, cosine double"
                if rerank_source is not None
                else "query_id long, rank int, neighbor_id long, adc_dist2 double"
            ),
        )
        if not query_ids:
            return empty
        qmat = np.asarray(query_vecs, dtype=np.float64)
        files, per_query = self.probed_files(qmat, n_probe)
        if not files:
            return empty
        probe_rows = [
            (int(qid), int(cell))
            for i, qid in enumerate(query_ids)
            for cell in per_query[i]
        ]
        probes = spark.createDataFrame(probe_rows, schema="_qid long, cell int")
        m, dsub = self.m, self.dim // self.m
        lut_rows = []
        for qid, qv in zip(query_ids, qmat):
            for s in range(m):
                d2s = seq_fold_d2_batch(
                    qv[s * dsub : (s + 1) * dsub][None, :], self.codebooks[s]
                )[0]
                lut_rows.extend(
                    (int(qid), s, int(self.code_ids[j]), float(d2s[j]))
                    for j in range(len(self.code_ids))  # real seed count (<= ks)
                )
        lut = spark.createDataFrame(
            lut_rows, schema="_qid long, s int, code long, _qd2 double"
        )
        cand = self.table.scan_files(spark, files)
        adc = (
            cand.join(F.broadcast(probes), "cell")
            .join(F.broadcast(lut), ["_qid", "s", "code"])
            .filter(F.col("vec_id") != F.col("_qid"))
            .groupBy("_qid", "vec_id")
            .agg(F.round(F.sum("_qd2"), 4).alias("adc_dist2"))
        )
        shortlist_k = k * rerank_expand if rerank_source is not None else k
        pre = Window.partitionBy(
            "_qid", F.pmod(F.col("vec_id"), F.lit(64))
        ).orderBy(F.col("adc_dist2").asc(), F.col("vec_id").asc())
        final = Window.partitionBy("_qid").orderBy(
            F.col("adc_dist2").asc(), F.col("vec_id").asc()
        )
        shortlist = (
            adc.withColumn("_pr", F.row_number().over(pre))
            .filter(F.col("_pr") <= shortlist_k)
            .drop("_pr")
            .withColumn("rank", F.row_number().over(final))
            .filter(F.col("rank") <= shortlist_k)
            .select(
                F.col("_qid").alias("query_id"),
                "rank",
                F.col("vec_id").alias("neighbor_id"),
                "adc_dist2",
            )
        )
        if rerank_source is None:
            return shortlist
        # exact cosine re-rank: the shortlist (|Q| * k * expand rows)
        # broadcasts into the raw-vector scan; query vectors ride the
        # shortlist rows as plan constants (driver-held, |Q| of them)
        qv_rows = [
            (int(qid), [float(x) for x in qv])
            for qid, qv in zip(query_ids, qmat)
        ]
        qvs = spark.createDataFrame(qv_rows, schema="query_id long, _qv array<double>")
        cand_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        dot = F.aggregate(
            F.zip_with(cand_vec, F.col("_qv"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        norm = F.sqrt(
            F.aggregate(cand_vec, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        qnorm = F.sqrt(
            F.aggregate("_qv", F.lit(0.0), lambda acc, x: acc + x * x)
        )
        scored = (
            rerank_source.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col)
            )
            .join(
                F.broadcast(
                    shortlist.select("query_id", "neighbor_id").join(
                        F.broadcast(qvs), "query_id"
                    )
                ),
                "neighbor_id",
            )
            .select(
                "query_id",
                "neighbor_id",
                (dot / F.nullif(norm * qnorm, F.lit(0.0))).alias("cos"),
            )
            .filter(F.col("cos").isNotNull())
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "rank", "neighbor_id",
                F.round("cos", 3).alias("cosine"),
            )
        )
