"""Similarity search over embedding columns.

- cosine_topk: exact top-k — query matrix broadcast into an Arrow-batched
  ``mapInPandas`` that GEMMs each candidate batch against all queries and
  emits only its local top-k per query (partial top-k pushdown), so the
  final shuffle carries k rows per (query, input-partition), not N·Q.
- cosine_pairs_blocked: exact all-pairs above a threshold — block-matrix
  decomposition: vectors are hashed into B blocks, each of the B(B+1)/2
  block pairs is one ``applyInPandas`` group computing a numpy GEMM.
  Nothing materializes N² pair rows; replication factor is ~B per row, so
  at 100 TB you pick B ≈ (total / executor-memory-budget) and every task
  stays a dense-matrix multiply.
- lsh_bucketed_topk: the approximate path — random-hyperplane LSH buckets
  shrink the candidate set from N to ~N/2^bits per query before the exact
  rerank.

Float note: GEMM accumulates in a different order than an SQL engine's
sequential list fold; cosines agree to ~1e-15 and all public surfaces
round to 3 decimals, which absorbs that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _vec_matrix(series: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64) for v in series])


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidate_filter=None,
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    The tiny query side is collected and closed over (the same role a
    broadcast variable plays); every candidate partition GEMMs its Arrow
    batches against the query matrix and pre-prunes to its local top-k per
    query, so the only shuffle is the final k-per-partition window.

    ``candidate_filter`` (a boolean Column) enables FILTERED vector
    search — "nearest neighbors among rows satisfying a metadata
    predicate", the standard vector-store feature.  Semantics are
    filter-THEN-search (the top-k is computed over the filtered
    candidate set, so low-selectivity filters still return k results if
    k survivors exist — post-search filtering would not).  The
    predicate is applied before the Arrow stage, i.e. it sits in the
    scan projection where Catalyst pushes it into the parquet reader;
    queries are looked up in the UNfiltered relation, so a query vector
    need not satisfy the predicate itself."""
    q_rows = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
        .collect()
    )
    q_ids = np.array([r["qid"] for r in q_rows])
    q_mat = _l2_normalize(np.array([np.asarray(r["qvec"], dtype=np.float64) for r in q_rows]))

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            cand = _l2_normalize(_vec_matrix(pdf[vec_col]))
            scores = cand @ q_mat.T  # (n_cand, n_q)
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = scores[:, j]
                mask = cids != qid
                ids_m, col_m = cids[mask], col[mask]
                if not len(ids_m):
                    continue
                # local top-k: order by (-cos, cid) to mirror the final window
                order = np.lexsort((ids_m, -col_m))[:k]
                out_q.extend([qid] * len(order))
                out_c.extend(ids_m[order])
                out_s.extend(col_m[order])
            yield pd.DataFrame({"qid": out_q, "cid": out_c, "cos": out_s})

    cand = df if candidate_filter is None else df.filter(candidate_filter)
    scored = cand.select(id_col, vec_col).mapInPandas(
        score_batches, schema="qid long, cid long, cos double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rank"),
            F.col("cid").alias("neighbor_id"),
            F.round("cos", 3).alias("cosine"),
        )
    )


def hard_negatives(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query,
    the ``k`` MOST similar candidates whose ``label_col`` DIFFERS from
    the query's — the standard negative-selection step for embedding /
    reranker training (highest-loss negatives are the near-misses, not
    random draws).

    The label predicate is per-query (each query excludes ITS OWN
    class), so it cannot be a static ``candidate_filter``; instead the
    query labels ride along with the broadcast query matrix and the
    mask applies INSIDE the Arrow stage, before the local top-k
    pre-prune — pruning first would under-fill k whenever a query's
    nearest neighbors are dominated by its own class (exactly the
    common case).  Scale shape is identical to :func:`cosine_topk`:
    map-side GEMM + local top-k pushdown, one k-per-partition shuffle.

    Returns ``(query_id, rank, neighbor_id, neighbor_label, cosine)``.
    """
    q_rows = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("qid"),
            F.col(label_col).alias("qlabel"),
            F.col(vec_col).alias("qvec"),
        )
        .collect()
    )
    q_ids = np.array([r["qid"] for r in q_rows])
    q_labels = np.array([r["qlabel"] for r in q_rows])
    q_mat = _l2_normalize(
        np.array([np.asarray(r["qvec"], dtype=np.float64) for r in q_rows])
    )

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            clabels = pdf[label_col].to_numpy()
            cand = _l2_normalize(_vec_matrix(pdf[vec_col]))
            scores = cand @ q_mat.T
            out_q, out_c, out_l, out_s = [], [], [], []
            for j, qid in enumerate(q_ids):
                mask = (cids != qid) & (clabels != q_labels[j])
                ids_m = cids[mask]
                if not len(ids_m):
                    continue
                col_m, lab_m = scores[mask, j], clabels[mask]
                order = np.lexsort((ids_m, -col_m))[:k]
                out_q.extend([qid] * len(order))
                out_c.extend(ids_m[order])
                out_l.extend(lab_m[order])
                out_s.extend(col_m[order])
            yield pd.DataFrame(
                {"qid": out_q, "cid": out_c, "clabel": out_l, "cos": out_s}
            )

    # clabel carries whatever type label_col has (string class labels
    # work, not just ints) — derive the Arrow output field from the
    # input schema instead of hardcoding int
    out_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("clabel", df.schema[label_col].dataType),
            T.StructField("cos", T.DoubleType()),
        ]
    )
    scored = df.select(id_col, label_col, vec_col).mapInPandas(
        score_batches, schema=out_schema
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rank"),
            F.col("cid").alias("neighbor_id"),
            F.col("clabel").alias("neighbor_label"),
            F.round("cos", 3).alias("cosine"),
        )
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine >= threshold, exactly, via block GEMM.

    Each vector lands in block ``crc32(id) % B``; every block pair (i <= j)
    is one applyInPandas group whose task is a dense (|bi| x |bj|) matrix
    multiply. Row replication is <= B+1 copies (vs N copies for a naive
    pair join), and no N² row set ever exists. At cluster scale, B grows
    with data volume so each block fits executor memory.
    """
    spark = df.sparkSession
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "gi int, gj int"
    )
    blocked = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        (F.crc32(F.col(id_col).cast("string")) % n_blocks).cast("int").alias("blk"),
    )
    rep = blocked.join(
        F.broadcast(block_pairs), (F.col("blk") == F.col("gi")) | (F.col("blk") == F.col("gj"))
    )

    def block_cosines(key, pdf):
        gi, gj = key
        ids = pdf["vid"].to_numpy()
        mats = _l2_normalize(_vec_matrix(pdf["vec"]))
        blks = pdf["blk"].to_numpy()
        if gi == gj:
            a_idx = np.arange(len(ids))
            b_idx = a_idx
        else:
            a_idx = np.nonzero(blks == gi)[0]
            b_idx = np.nonzero(blks == gj)[0]
        if not len(a_idx) or not len(b_idx):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        scores = mats[a_idx] @ mats[b_idx].T
        hit_a, hit_b = np.nonzero(scores >= threshold)
        ida, idb = ids[a_idx[hit_a]], ids[b_idx[hit_b]]
        cos = scores[hit_a, hit_b]
        if gi == gj:
            # both (x,y) and (y,x) are present: keep one order, drop diagonal
            keep = ida < idb
            ida, idb, cos = ida[keep], idb[keep], cos[keep]
        else:
            # each unordered pair appears exactly once here — orient, don't drop
            ida, idb = np.minimum(ida, idb), np.maximum(ida, idb)
        return pd.DataFrame({"id_a": ida, "id_b": idb, "cos": cos})

    return (
        rep.groupBy("gi", "gj")
        .applyInPandas(block_cosines, schema="id_a long, id_b long, cos double")
        .select("id_a", "id_b", F.col("cos").alias("cosine"))
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings, then within each cluster drop every vector that has
    a near-duplicate (cosine >= threshold) with a smaller id — the greedy
    keep-one-per-epsilon-ball rule, made deterministic.

    Deterministic + oracle-reproducible design: centroids are the
    embeddings of the ``n_clusters`` rows with the smallest
    ``md5(cast(id))`` (no RNG), assignment is argmax cosine with ties to
    the lowest centroid index — both expressible in plain SQL, so the
    whole operator is verifiable against a DuckDB oracle.

    Scale shape: the centroid matrix is K x dim (broadcast); assignment is
    one Arrow-batched GEMM map over the scan — no shuffle; the only wide op
    is the per-cluster grouping, and clustering bounds the quadratic
    pairwise term to (N/K)^2 per task, with K grown ~ N at 100 TB (and the
    per-cell GEMM swappable for cosine_pairs_blocked inside huge cells).

    Returns (id, cell, keep)."""
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    seeds = (
        base.withColumn("_h", F.md5(F.col("vid").cast("string")))
        .orderBy("_h", "vid")
        .limit(n_clusters)
        .collect()
    )  # K rows on the driver — planning-scale, like a codebook fetch
    cmat = _l2_normalize(
        np.array([np.asarray(r["vec"], dtype=np.float64) for r in seeds])
    )
    bc = spark.sparkContext.broadcast(cmat)

    def assign(batches):
        for pdf in batches:
            m = _l2_normalize(_vec_matrix(pdf["vec"]))
            # argmax keeps the FIRST max on ties -> lowest centroid index,
            # matching the SQL oracle's (cos DESC, cell ASC) tie-break
            cell = (m @ bc.value.T).argmax(axis=1).astype("int32")
            yield pd.DataFrame({"vid": pdf["vid"], "cell": cell, "vec": pdf["vec"]})

    assigned = df.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec")
    ).mapInPandas(assign, schema="vid long, cell int, vec array<double>")

    def cell_pairs(key, pdf):
        ids = pdf["vid"].to_numpy()
        m = _l2_normalize(_vec_matrix(pdf["vec"]))
        scores = m @ m.T
        a, b = np.nonzero(scores >= threshold)
        keep = ids[a] < ids[b]
        return pd.DataFrame({"id_a": ids[a][keep], "id_b": ids[b][keep]})

    pairs = assigned.groupBy("cell").applyInPandas(
        cell_pairs, schema="id_a long, id_b long"
    )
    removed = pairs.select(F.col("id_b").alias("vid")).distinct().withColumn(
        "_rm", F.lit(True)
    )
    return assigned.join(removed, "vid", "left").select(
        F.col("vid").alias(id_col),
        "cell",
        F.coalesce(~F.col("_rm"), F.lit(True)).alias("keep"),
    )


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: ``n_cells`` centroids chosen deterministically (the
    vectors whose ids hash lowest — a fixed, data-dependent codebook without
    an iterative trainer; swap in k-means centroids when a training pass is
    affordable). Every vector is assigned to its nearest centroid with one
    GEMM pass; each query probes its ``n_probe`` nearest cells and reranks
    exactly inside them.

    Scale shape: assignment is a map-only GEMM against a broadcast codebook;
    the probe join shuffles only by cell id, so per-task work is |cell| × Q —
    N²/n_cells total instead of N², and n_cells grows with data volume.
    """
    # distributed top-k by id hash: only the n_cells codebook rows reach the
    # driver, never the id list
    cent_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.crc32(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    cmat = _l2_normalize(
        np.array([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])
    )

    dim = int(cmat.shape[1])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # drop null/odd-length vectors before stacking — the former
            # plan's null semantics dropped them; a ragged np.array raises
            keep = [
                i
                for i, v in enumerate(pdf[vec_col])
                if v is not None and len(v) == dim
            ]
            if not keep:
                continue
            pdf = pdf.iloc[keep]
            vecs = _l2_normalize(_vec_matrix(pdf[vec_col]))
            cells = np.argmax(vecs @ cmat.T, axis=1)
            yield pd.DataFrame(
                {"cid": pdf[id_col].to_numpy(), "cell": cells, "cvec": pdf[vec_col]}
            )

    assigned = df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"cid long, cell int, cvec {df.schema[vec_col].dataType.simpleString()}"
    )

    q_rows = df.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    # per-cell query blocks, driver-held and shipped in the scoring
    # closure (planning-scale: |Q| * n_probe rows) — the same per-query
    # n_probe semantics the former broadcast cell equi-join enforced
    # in-plan, now enforced by the cell lookup
    cell_q: dict[int, list[int]] = {}
    qids_l, qvecs = [], []
    for i, r in enumerate(q_rows):
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qv = qv / (np.linalg.norm(qv) or 1.0)
        qids_l.append(int(r[id_col]))
        qvecs.append(qv)
        for cell in np.argsort(-(cmat @ qv))[:n_probe]:
            cell_q.setdefault(int(cell), []).append(i)
    qid_arr = np.array(qids_l, dtype=np.int64)
    qmat = np.array(qvecs) if qvecs else np.empty((0, cmat.shape[1]))
    cell_blocks = {
        c: (qid_arr[idxs], qmat[idxs]) for c, idxs in cell_q.items()
    }
    k_local = int(k)
    # executor-side broadcast (guide §4.5): the per-cell query blocks
    # deserialize once per executor instead of shipping serialized in
    # every task's closure
    bc_blocks = df.sparkSession.sparkContext.broadcast(cell_blocks)

    # Arrow-batched scoring (one GEMM per (batch, cell) block) instead of
    # the per-pair interpreted zip_with/aggregate fold the probe join
    # evaluated — ~dim lambda steps per (candidate x query) pair.  cosine
    # keeps the exact formula shape dot(raw, qn) / ||raw||; zero-norm
    # candidates drop as the former nullif-null filter did.  The
    # per-batch partial top-k (ordered by (-cos, cid), mirroring the
    # final window's tie-break) bounds the shuffle into the ranking
    # window at k rows per (query, batch).
    def score(batches):
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
                keep = [
                    i
                    for i, v in enumerate(grp["cvec"])
                    if v is not None and len(v) == dim
                ]
                if not keep:
                    continue
                grp = grp.iloc[keep]
                raw = _vec_matrix(grp["cvec"])
                cids = grp["cid"].to_numpy(dtype=np.int64)
                norms = np.linalg.norm(raw, axis=1)
                ok = norms > 0.0
                if not ok.any():
                    continue
                raw, cids, norms = raw[ok], cids[ok], norms[ok]
                cos = (raw @ qmat_c.T) / norms[:, None]
                for j in range(cos.shape[1]):
                    col, ids = cos[:, j], cids
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
                                "cid": ids[order],
                                "cos": col[order],
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = assigned.select("cid", "cell", "cvec").mapInPandas(
        score, schema="qid long, cid long, cos double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("cid").alias("neighbor_id"),
            F.round("cos", 3).alias("cosine"),
        )
    )


def plane_matrix(seed: int, n_planes: int, dim: int) -> np.ndarray:
    """Deterministic hyperplane components in [-1, 1): md5 of
    ``"{seed}:{plane}:{dim_index}"`` — reproducible by any engine with an
    md5 function (the SQL oracle recomputes the identical matrix)."""
    import hashlib

    comps = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
            comps[p, i] = (int(h[:8], 16) / 0x7FFFFFFF) - 1.0
    return comps


def lsh_bucketed_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets, exact rerank
    inside the query's bucket. Deterministic planes from md5(seed:plane:dim)
    — no RNG state, and any engine can recompute them.

    Scale path: signatures come from one Arrow-batched ``mapInPandas`` GEMM
    against a plane matrix materialized per executor from the seed (plan
    size independent of embedding dim — no per-(plane,dim) literals), then
    an equi-join on the signature (shuffle keyed by bucket), then the same
    windowed top-k."""

    def sig_batches(batches):
        planes = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _vec_matrix(pdf[vec_col])
            if planes is None:
                planes = plane_matrix(seed, n_planes, mat.shape[1])
            bits = mat @ planes.T >= 0  # (n, n_planes)
            yield pd.DataFrame(
                {
                    "cid": pdf[id_col].to_numpy(),
                    "cvec": [row.tolist() for row in mat],
                    "bucket": [
                        "".join("1" if b else "0" for b in row) for row in bits
                    ],
                }
            )

    base = df.select(id_col, vec_col).mapInPandas(
        sig_batches, schema="cid long, cvec array<double>, bucket string"
    )
    queries = base.filter(F.col("cid").isin(query_ids)).select(
        F.col("cid").alias("qid"), F.col("cvec").alias("qvec"), "bucket"
    )
    pairs = base.join(F.broadcast(queries), "bucket").filter(F.col("cid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "cid",
        (
            _dot(F.col("qvec"), F.col("cvec"))
            / F.nullif(_norm(F.col("qvec")) * _norm(F.col("cvec")), F.lit(0.0))
        ).alias("cos"),
    ).filter(F.col("cos").isNotNull())
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("cid").alias("neighbor_id"),
            F.round("cos", 3).alias("cosine"),
        )
    )


def _jl_signs(d_in: int, d_out: int) -> list[list[int]]:
    """The deterministic +-1 projection matrix: sign(i, j) = +1 iff the
    first hex digit of md5("i:j") is even.  Driver-side constant
    generation (d_in * d_out md5 calls — planning scale); the md5 spec
    makes it engine-portable, so a SQL oracle re-derives every sign."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def random_projection(
    df: DataFrame,
    d_out: int = 16,
    d_in: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Johnson-Lindenstrauss random sign projection (Achlioptas 2003,
    "Database-friendly random projections"): project each embedding to
    ``d_out`` dimensions with a deterministic +-1 matrix, scaled by
    1/sqrt(d_out) so expected pairwise distances are preserved — the
    standard cheap pre-reduction before clustering / coarse quantizing
    a 100-TB embedding column (4x fewer bytes into every downstream
    shuffle at d_out = d_in/4).

    The sign matrix is an md5-derived constant folded into the plan
    (never a join, never per-row hashing); the projection is a pure
    in-array column expression — ZERO shuffles, a map over the scan.
    Each output component is a fixed-order sequential fold, rounded to
    ``round_to`` decimals (cross-engine sum-order noise absorbed).

    Returns ``(id_col, proj)`` with ``proj: array<double>[d_out]``.
    """
    signs = _jl_signs(d_in, d_out)
    scale = 1.0 / float(d_out) ** 0.5
    rows = ", ".join(
        "array(" + ", ".join(f"{s}D" for s in row) + ")" for row in signs
    )
    # the trailing "+ 0.0d" collapses IEEE negative zero (round can
    # yield -0.0 from a tiny negative sum; engines disagree on its
    # sign bit, and -0.0 != 0.0 under textual value hashing)
    comp = (
        f"transform(array({rows}), r -> "
        f"round(aggregate(sequence(1, {d_in}), cast(0.0 as double),"
        f" (acc, i) -> acc + cast(element_at(_v, i) as double)"
        f" * element_at(r, i)) * {scale!r}D, {int(round_to or 12)}) + 0.0d)"
    )
    return df.select(
        F.col(id_col), F.col(vec_col).alias("_v")
    ).select(F.col(id_col), F.expr(comp).alias("proj"))


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Recall@k of an approximate ANN result against the exact one —
    the index-quality monitor every production vector store runs when
    (re)tuning n_probe / n_planes / PQ bits.  Both inputs are the
    k-bounded ``(query_id, rank, neighbor_id, ...)`` relations the
    search operators emit, so this is planning-scale work: one
    k-row-per-query equi-join and a count.  Queries the approximate
    index missed entirely still appear (n_hits = 0).  Integer output —
    bit-exact across engines."""
    e = exact.select("query_id", F.col("neighbor_id").alias("_nid"))
    a = approx.select("query_id", F.col("neighbor_id").alias("_nid"))
    hits = (
        a.join(e, ["query_id", "_nid"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        e.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(k).alias("k"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )
