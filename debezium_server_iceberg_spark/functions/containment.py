"""Asymmetric set-containment join via prefix filtering (PPJoin family).

Near-duplicate detectors built on symmetric Jaccard (MinHash-LSH,
SimHash) systematically miss *subset* relationships: a short document
quoted wholesale inside a much longer one has high containment
``|S(a) ∩ S(b)| / |S(a)|`` but low Jaccard, so no LSH band ever agrees.
Training-data pipelines care about exactly that case (quote extraction,
boilerplate wrapping, partial scrapes), which is why containment joins
are their own operator family.

The scalable plan is the classic prefix filter (Chaudhuri et al.,
"A Primitive Operator for Similarity Joins", ICDE'06 — public):

1. distinct ``shingle_size``-token shingles per doc (set semantics);
2. global shingle frequency; order every doc's shingles rarest-first
   by ``(freq, shingle)`` — a deterministic total order;
3. a doc needs ``m = ceil(tau * |S(a)|)`` matches, so any qualifying
   partner must share one of its first ``|S(a)| - m + 1`` shingles
   (missing all of them leaves at most ``m - 1`` matches) — only those
   *prefix* shingles generate candidates;
4. equi-join prefix(a) against all shingles(b), then verify candidates
   with an exact intersection count and the integer predicate
   ``tau_den * inter >= tau_num * |S(a)|`` (no float boundary).

Scale: the candidate join is keyed on the *rarest* shingles of each doc,
so fanout per key is small by construction on realistic corpora (large
shingle vocabularies); the verify join touches candidate pairs only.
Every step is a hash shuffle — no cross join, no driver materialization.
All arithmetic is integer until the final reported ratio, so a DuckDB
oracle reproduces the result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _doc_shingles


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    tau_num: int = 4,
    tau_den: int = 5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Directed pairs ``(doc_a, doc_b)`` with
    ``|S(a) ∩ S(b)| / |S(a)| >= tau_num/tau_den`` and ``doc_a != doc_b``.

    Asymmetric by design: ``a`` contained in ``b`` does not imply the
    reverse. Returns ``(doc_a, doc_b, inter_size, size_a, containment)``.

    ``max_shingle_freq`` is the skew escape hatch for boilerplate-heavy
    corpora: shingles appearing in more than that many documents are
    treated as stop-shingles and removed from the universe BEFORE sizes
    are computed, so the result is the exact containment join over the
    non-stop shingle sets (a documented, deterministic approximation of
    the unfiltered semantics — not a silently skewed exact join). A
    shingle shared by millions of docs carries no dedup signal but would
    otherwise fan the candidate join out quadratically on one key.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("tau must be a fraction in (0, 1]")
    if max_shingle_freq is not None and max_shingle_freq < 1:
        raise ValueError("max_shingle_freq must be >= 1")
    shingles = _doc_shingles(df, text_col, id_col, shingle_size)
    freq = shingles.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    if max_shingle_freq is not None:
        # drop stop-shingles from the universe itself: sizes, prefixes,
        # candidates, and verification all see the same filtered sets —
        # the inner freq join below applies the filter to every relation
        # (they all derive from ``ranked``)
        freq = freq.filter(F.col("freq") <= max_shingle_freq)
    # EVERY relation in this operator is corpus-sized (shingles explode the
    # text, freq/sizes are one row per distinct shingle/doc, cand is the
    # candidate pair set) — none may EVER be a static broadcast build side.
    # Catalyst's size estimate for an exploded scan is the parquet file
    # size, which lies by the fanout factor: at sf1 that underestimate
    # chose broadcast and OOM'd the driver; at 100 TB it would kill any
    # executor. The merge hints pin shuffled sort-merge joins — the plan
    # whose memory is bounded at every scale (a checkpointed relation's
    # unknown stats default past every broadcast threshold, same effect).
    shingles = shingles.hint("merge")
    freq = freq.hint("merge")
    # rarest-first rank + set size in one window shuffle (both keyed by doc)
    w_rank = Window.partitionBy("doc").orderBy("freq", "tok")
    w_all = Window.partitionBy("doc")
    # materialize ONCE: the interpreted gram construction (regexp split +
    # per-position concat_ws slice + explode) is the operator's dominant
    # per-row cost, and the downstream joins reuse the shingle relation
    # four times (candidate probe, both verify sides, sizes). Without the
    # checkpoint Spark replays the explode lineage for every reuse — five
    # full tokenization passes over the corpus instead of one.
    ranked = (
        shingles.join(freq, "tok")
        .select(
            "doc",
            "tok",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("size"),
        )
        .localCheckpoint(eager=True)
    )
    sh = ranked.select("doc", "tok").hint("merge")
    # m = ceil(tau*size) via integer arithmetic; prefix = size - m + 1
    m = F.expr(f"({tau_num} * size + {tau_den} - 1) div {tau_den}")
    prefix = ranked.filter(F.col("rn") <= F.col("size") - m + 1)
    cand = (
        prefix.select(F.col("doc").alias("doc_a"), "tok")
        .join(sh.select(F.col("doc").alias("doc_b"), "tok"), "tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .hint("merge")
    )
    s_a = sh.select(F.col("doc").alias("doc_a"), "tok")
    s_b = sh.select(F.col("doc").alias("doc_b"), "tok")
    inter = (
        cand.join(s_a, "doc_a")
        .join(s_b, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    # one row per doc already lives in ranked at rn == 1 (every doc with a
    # non-empty shingle set has a rank-1 row) — no extra groupBy shuffle
    sizes = (
        ranked.filter(F.col("rn") == 1)
        .select("doc", F.col("size").alias("size_a"))
        .hint("merge")
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a"), "doc_a")
        .filter(tau_den * F.col("inter_size") >= tau_num * F.col("size_a"))
        .select(
            "doc_a",
            "doc_b",
            "inter_size",
            "size_a",
            (F.col("inter_size") / F.col("size_a")).alias("containment"),
        )
    )
