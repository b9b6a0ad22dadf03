"""Margin-based bitext mining — the parallel-corpus construction step
for translation / cross-lingual training data (Artetxe & Schwenk 2019,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings"; the recipe behind CCMatrix/NLLB: embed both languages into
one space, pair sentences whose cosine stands out RELATIVE to each
side's neighborhood, not in absolute terms — absolute-threshold mining
drowns in hubness).

Reference parity: outside memiiso/debezium-server-iceberg's CDC scope;
part of the §2.8 training-data surface (the alignment/pairing face of
the similarity family in ``functions/similarity.py``).

For source sentence x and target candidate y:

    margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

where ``avgNN_k(v)`` is the mean cosine of v's k nearest cross-lingual
neighbors.  A pair is emitted when y is x's argmax-margin candidate and
the margin exceeds ``threshold`` (ratio mode; > 1 reads "this pair is
closer than each side's typical neighborhood").

Distributed shape, and why it scales:

- **Cross-lingual kNN via block GEMM with local top-k pushdown**: the
  B×B (src-block, tgt-block) grid makes each task one dense
  (|src_bi| × |tgt_bj|) matrix multiply that emits only its block-local
  top-k per source row AND per target row — the full N·M cosine matrix
  never exists as rows; the global top-k is a k-per-block window.
  Replication is B copies per row, the same budget as
  ``cosine_pairs_blocked``.  (At production scale the candidate
  generator swaps to the IVF/PQ index — ``functions/ann_index.py`` —
  with identical downstream margin algebra.)
- **Neighborhood averages are k-row aggregates** keyed by vector id;
  the margin join touches only the k·N candidate rows.
- **Forward selection is one per-source window** over k candidates.

Float contract: cosines/margins round to 3 decimals on output, the
repo-wide GEMM-vs-SQL tolerance (~1e-15 disagreement absorbed by 1e-3
rounding) — and the ROUNDED margin also drives the threshold filter
and the per-source argmax, because an unrounded float boundary lets
accumulation noise decide when a corpus carries exact-duplicate
vectors (true margin exactly 1.0: the knife-edge the replicated sf1
slice exposed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _l2_normalize, _vec_matrix


def bitext_margin_pairs(
    df: DataFrame,
    lang_col: str = "lang",
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Mine (src, tgt) pairs between ``lang_col == 0`` (source) and
    ``lang_col == 1`` (target) rows of one embedding relation.

    Returns ``(src_id, tgt_id, cosine, margin)`` — one row per source
    whose best candidate clears the margin threshold; ``cosine`` and
    ``margin`` rounded to 3.
    """
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col(lang_col).cast("int").alias("side"),
        (F.crc32(F.col(id_col).cast("string")) % n_blocks).cast("int").alias("blk"),
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(n_blocks)],
        "gi int, gj int",
    )
    # src rows fan out along their row of the grid, tgt rows down their
    # column — every (src-block, tgt-block) cell sees exactly its slice
    rep = pts.join(
        F.broadcast(grid),
        ((F.col("side") == 0) & (F.col("blk") == F.col("gi")))
        | ((F.col("side") == 1) & (F.col("blk") == F.col("gj"))),
    )

    def block_topk(key, pdf):
        src = pdf[pdf["side"] == 0]
        tgt = pdf[pdf["side"] == 1]
        if not len(src) or not len(tgt):
            return pd.DataFrame(
                {"dir": [], "qid": [], "cid": [], "cos": []}
            ).astype({"dir": "int32", "qid": "int64", "cid": "int64", "cos": "float64"})
        sids, tids = src["vid"].to_numpy(), tgt["vid"].to_numpy()
        sm = _l2_normalize(_vec_matrix(src["vec"]))
        tm = _l2_normalize(_vec_matrix(tgt["vec"]))
        scores = sm @ tm.T  # (n_src, n_tgt)
        out = {"dir": [], "qid": [], "cid": [], "cos": []}
        for axis, qids, cids, mat in (
            (0, sids, tids, scores),
            (1, tids, sids, scores.T),
        ):
            for i, qid in enumerate(qids):
                row = mat[i]
                order = np.lexsort((cids, -row))[:k]
                out["dir"].extend([axis] * len(order))
                out["qid"].extend([qid] * len(order))
                out["cid"].extend(cids[order])
                out["cos"].extend(row[order])
        return pd.DataFrame(out)

    local = rep.groupBy("gi", "gj").applyInPandas(
        block_topk, schema="dir int, qid long, cid long, cos double"
    )
    w = Window.partitionBy("dir", "qid").orderBy(
        F.col("cos").desc(), F.col("cid").asc()
    )
    # the kNN relation feeds THREE consumers (forward candidates + both
    # neighborhood averages); materialize it once (memory-and-disk) or
    # Catalyst re-runs the block GEMM per branch.  It is k-bounded:
    # 2k rows per vector, narrow columns.  ``materialize=False`` exists
    # only so plan tests can inspect the pre-checkpoint shape.
    knn = local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if materialize:
        knn = knn.localCheckpoint(eager=False)
    fwd = knn.filter(F.col("dir") == 0).select(
        F.col("qid").alias("src_id"), F.col("cid").alias("tgt_id"), "cos"
    )
    avg_src = (
        knn.filter(F.col("dir") == 0)
        .groupBy("qid")
        .agg(F.avg("cos").alias("avg_s"))
        .withColumnRenamed("qid", "src_id")
    )
    avg_tgt = (
        knn.filter(F.col("dir") == 1)
        .groupBy("qid")
        .agg(F.avg("cos").alias("avg_t"))
        .withColumnRenamed("qid", "tgt_id")
    )
    margin = (
        fwd.join(avg_src, "src_id")
        .join(avg_tgt, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos",
            (F.col("cos") / ((F.col("avg_s") + F.col("avg_t")) / 2)).alias("_m"),
        )
    )
    # argmax and threshold both use the ROUNDED margin: margins are
    # float accumulations, and an unrounded boundary lets ~1e-15 sum
    # noise decide — a corpus with exact-duplicate vectors (top pairs'
    # true margin EXACTLY threshold) flips between engines/runs on the
    # raw value (seen at the replicated-sf1 slice).  At 3 decimals the
    # noise is dead and duplicate ties break deterministically by id.
    pick = Window.partitionBy("src_id").orderBy(
        F.round("_m", 3).desc(), F.col("tgt_id").asc()
    )
    return (
        margin.withColumn("_rn", F.row_number().over(pick))
        .filter((F.col("_rn") == 1) & (F.round("_m", 3) > threshold))
        .select(
            "src_id",
            "tgt_id",
            F.round("cos", 3).alias("cosine"),
            F.round("_m", 3).alias("margin"),
        )
    )
