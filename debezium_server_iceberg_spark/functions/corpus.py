"""Corpus-level analysis operators: cross-source overlap and
distribution-threshold (top-p) selection.

Both operators work at *group* granularity (source, language,
distinct-score), never per-document windows over a whole language —
the partition key spaces stay bounded even when one language holds 80%
of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _doc_shingles
from .text import quality_score, tokens_col as _corpus_tokens


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_size: int = 3,
    sketch_k: int | None = None,
) -> DataFrame:
    """Pairwise n-gram overlap between sources: the corpus contamination
    matrix (which feeds dedup priorities and mixture design).

    For each unordered source pair: distinct-shingle intersection size,
    both set sizes, Jaccard, and both directed containments.

    Scale: one distinct-shuffle to (source, shingle); the pair join fans
    each shingle out to at most ``n_sources - 1`` partners, so the
    intermediate is bounded by ``|distinct shingles| * n_sources`` — the
    exact mode's working set, fine for hundreds of sources.  For
    THOUSANDS of sources pass ``sketch_k``: a KMV/theta sketch per
    source (the k smallest distinct 60-bit md5 hash values) replaces the
    raw-shingle pair join with a join of k-row sketches, bounded by
    ``k * n_sources`` regardless of corpus size; same output schema plus
    ``is_estimate`` (sizes stay exact, intersection-derived columns are
    estimates; exact ``sketch_k=None`` output carries
    ``is_estimate=false`` semantics implicitly by omitting the column).
    """
    grams = (
        _doc_shingles(
            df.select(F.col(group_col).alias("_grp"), F.col(text_col)),
            text_col,
            "_grp",
            shingle_size,
        )
        .distinct()  # (doc=_grp, tok) distinct across the whole source
        # corpus-sized (one row per distinct gram per source): never a
        # static broadcast build side — Catalyst's estimate for the
        # exploded scan is the parquet file size, off by the gram fanout
        .hint("merge")
        # materialize ONCE: every consumer (sizes, both pair-join sides /
        # the sketch hash pass) otherwise replays the interpreted gram
        # explode AND the distinct shuffle — 3 full corpus passes in the
        # exact path, more in the sketch path
        .localCheckpoint(eager=True)
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    if sketch_k is not None:
        return _sketch_overlap(grams, sizes, sketch_k)
    a = grams.select(F.col("doc").alias("source_a"), "tok")
    b = grams.select(F.col("doc").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("doc").alias("source_a"), F.col("n_grams").alias("size_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc").alias("source_b"), F.col("n_grams").alias("size_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "inter_size",
            "size_a",
            "size_b",
            (
                F.col("inter_size")
                / (F.col("size_a") + F.col("size_b") - F.col("inter_size"))
            ).alias("jaccard"),
            (F.col("inter_size") / F.col("size_a")).alias("containment_a"),
            (F.col("inter_size") / F.col("size_b")).alias("containment_b"),
        )
    )


_P60 = float(1 << 60)  # 2^60, exactly representable as a double


def _sketch_overlap(grams: DataFrame, sizes: DataFrame, k: int) -> DataFrame:
    """KMV/theta-sketch source overlap — the thousands-of-sources path.

    Per source: hash every distinct shingle to a 60-bit integer (first 15
    md5 hex digits — identical in Spark and DuckDB, so the oracle replays
    the sketch bit-for-bit), keep the k smallest.  A deterministic
    threshold prefilter bounds the k-min window's partition before it
    runs: a source with n distinct shingles keeps only hashes
    ``h <= min(floor(4k*2^60 / n), 2^60)`` — expected ~4k survivors, so
    the per-source window sorts a few-thousand-row partition even when
    one source holds 10^10 shingles (never a sort-everything hotspot).
    The sketch is DEFINED as "k smallest of the thresholded sample",
    making every downstream number a pure function of the input — no
    with-high-probability caveat in the correctness contract.

    Pair estimates use the standard theta intersection: with
    ``theta = min(theta_a, theta_b)`` (a full sketch's theta is its k-th
    value; a small source's is its threshold bound + 1, since its sketch
    is its entire thresholded sample), ``c = |common hashes < theta|``
    estimates ``inter ~= c * 2^60 / theta``, clamped to the exact-size
    lattice bounds.  Jaccard comes from the below-theta samples
    (``c / (na + nb - c)``).  Set sizes stay exact.

    Scale: after the window, every relation holds at most k rows per
    source — the pair join is sketch-sized (``k * n_sources``), never
    |distinct shingles| x n_sources; the merge hints keep the static
    planner from broadcasting it on a stale estimate, and the only
    broadcasts are the per-source dims (sizes, thetas).
    """
    thr_d = float(4 * k) * _P60
    cap = 1 << 60
    hashed = grams.select(
        "doc",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    ).dropDuplicates(["doc", "h"])
    bound = F.least(F.floor(F.lit(thr_d) / F.col("n_grams")), F.lit(cap)).cast(
        "long"
    )
    surv = (
        hashed.join(F.broadcast(sizes), "doc")
        .filter(F.col("h") <= bound)
        .select("doc", "h")
    )
    w = Window.partitionBy("doc").orderBy("h")
    # k rows per source after the window — planning-small; materialize so
    # the five downstream consumers (theta, both join sides, both
    # below-theta passes) reuse the sketch instead of replaying the
    # hash + threshold + window lineage each time
    kept = (
        surv.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc", "h")
        .localCheckpoint(eager=True)
    )
    theta = (
        kept.groupBy("doc")
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept"))
        .join(F.broadcast(sizes), "doc")
        .select(
            "doc",
            F.when(F.col("n_kept") >= k, F.col("kth"))
            .otherwise(bound + 1)
            .alias("theta"),
        )
    )
    # sketch-sized self-join: bounded by k rows/source, but its Catalyst
    # estimate still derives from the corpus scan — pin merge anyway
    ka = kept.select(F.col("doc").alias("source_a"), "h").hint("merge")
    kb = kept.select(F.col("doc").alias("source_b"), "h").hint("merge")
    th_a = theta.select(F.col("doc").alias("source_a"), F.col("theta").alias("theta_a"))
    th_b = theta.select(F.col("doc").alias("source_b"), F.col("theta").alias("theta_b"))
    cstat = (
        ka.join(kb, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(th_a), "source_a")
        .join(F.broadcast(th_b), "source_b")
        .filter(F.col("h") < F.least("theta_a", "theta_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.least("theta_a", "theta_b")).alias("theta_p"),
        )
    )
    a_below = (
        cstat.select("source_a", "source_b", "theta_p")
        .join(ka, "source_a")
        .filter(F.col("h") < F.col("theta_p"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("na_t"))
    )
    b_below = (
        cstat.select("source_a", "source_b", "theta_p")
        .join(kb, "source_b")
        .filter(F.col("h") < F.col("theta_p"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("nb_t"))
    )
    est_raw = F.floor(
        F.col("c").cast("double") * F.lit(_P60) / F.col("theta_p")
    ).cast("long")
    inter = F.least(est_raw, F.col("size_a"), F.col("size_b"))
    return (
        cstat.join(a_below, ["source_a", "source_b"])
        .join(b_below, ["source_a", "source_b"])
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc").alias("source_a"), F.col("n_grams").alias("size_a")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc").alias("source_b"), F.col("n_grams").alias("size_b")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            inter.alias("inter_size"),
            "size_a",
            "size_b",
            (F.col("c") / (F.col("na_t") + F.col("nb_t") - F.col("c"))).alias(
                "jaccard"
            ),
            (inter / F.col("size_a")).alias("containment_a"),
            (inter / F.col("size_b")).alias("containment_b"),
            F.lit(True).alias("is_estimate"),
        )
    )


def quality_top_p(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    p_num: int = 4,
    p_den: int = 5,
) -> DataFrame:
    """Nucleus (top-p) document selection per language: keep the
    highest-quality documents until they carry ``p`` of the language's
    total quality mass; the score group straddling the boundary is kept
    whole (no per-document tie-breaking inside a score).

    The cutoff is computed on the *distinct-score* distribution —
    ``(lang, milli_score) -> (docs, mass)`` plus one cumulative window
    over scores — so the window partition holds at most one row per
    distinct score (<= 10^4 here), never one per document. A language
    with 10^11 documents costs the same window as one with 10^3; the
    only per-document shuffles are the score aggregation and the final
    semi-join of selected score groups back to the docs.

    Integer arithmetic end-to-end: scores become ``round(q*10^4)``
    millis (the score is already rounded to 4 dp), masses are integer
    sums, and the boundary predicate is
    ``p_den * mass_before < p_num * total`` — no float comparison, so
    the DuckDB oracle matches bit-for-bit.
    """
    if not (0 < p_num <= p_den):
        raise ValueError("p must be a fraction in (0, 1]")
    scored = quality_score(df, text_col, id_col).select(
        id_col, F.round(F.col("quality") * 10000, 0).cast("long").alias("milli")
    )
    # corpus-corpus self-join: neither side may static-broadcast (the
    # projection's size estimate scales with the parquet file, not rows)
    docs = df.select(id_col, F.col(lang_col).alias("lang")).join(
        scored.hint("merge"), id_col
    )
    groups = docs.groupBy("lang", "milli").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("milli").alias("mass"),
    )
    w_cum = Window.partitionBy("lang").orderBy(F.desc("milli"))
    w_tot = Window.partitionBy("lang")
    cum = groups.select(
        "lang",
        "milli",
        "n_docs",
        (F.sum("mass").over(w_cum) - F.col("mass")).alias("mass_before"),
        F.sum("mass").over(w_tot).alias("total_mass"),
    )
    selected = cum.filter(
        p_den * F.col("mass_before") < p_num * F.col("total_mass")
    ).select("lang", "milli")
    # selected is bounded by the distinct-score space (<= 10^4 rows per
    # language), so broadcasting it spares the corpus a second shuffle
    return docs.join(F.broadcast(selected), ["lang", "milli"]).select(
        id_col, "lang", "milli"
    )


def collocation_top_pairs(
    df: DataFrame,
    top_n: int = 50,
    min_count: int = 5,
    scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level collocation extraction: the ``top_n`` adjacent word
    pairs ranked by scaled LIFT — ``floor(scale * c12 * T / (c1 * c2))``
    with ``c12`` = corpus count of the adjacent pair, ``c1``/``c2`` =
    unigram occurrence counts, ``T`` = total token occurrences.  Lift
    is a strictly monotone transform of PMI (Church & Hanks 1990:
    ``PMI = log(c12·T²/(N·c1·c2))``; across pairs T, N are constants, so
    ordering by ``c12/(c1·c2)`` IS the PMI ordering) kept in exact
    integer arithmetic — no libm logs to drift between engines; the
    division runs in DECIMAL(38,0), overflow-safe for
    ``c12·T ≤ 10^32/scale``.

    ``min_count`` floors the pair count (classic PMI degeneracy: a
    pair seen once between two hapax words maximizes lift; collocation
    lists are mined above a support threshold).

    Scale shape: adjacency is built IN-ARRAY inside the scan (zero
    window shuffle, the ``bigram_logprob_score`` idiom); pair and
    unigram tables are partial-agg aggregations bounded by distinct
    bigrams / vocabulary, never corpus rows; the two count joins key on
    a word (vocabulary-sized SMJ or AQE broadcast — data-dependent, not
    pinned); the totals are 1-row broadcasts; the final top-n is the
    salted two-phase window, never a single-partition sort of the pair
    table.  Returns ``(rank, w1, w2, pair_count, lift_scaled)``.
    """
    toks = df.select(
        F.col(id_col), _corpus_tokens(F.col(text_col)).alias("_tk")
    )
    pairs = (
        toks.filter(F.size("_tk") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_tk") - 2),
                    lambda i: F.struct(
                        F.get(F.col("_tk"), i).alias("w1"),
                        F.get(F.col("_tk"), i + 1).alias("w2"),
                    ),
                )
            ).alias("_g")
        )
        .select(F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2"))
    )
    pair_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    uni = toks.select(F.explode("_tk").alias("_w")).groupBy("_w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = uni.agg(F.sum("_c").alias("_t"))
    cand = (
        pair_counts.filter(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("_w").alias("w1"), F.col("_c").alias("_c1")), "w1")
        .join(uni.select(F.col("_w").alias("w2"), F.col("_c").alias("_c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.expr(
                f"CAST((CAST({scale} AS DECIMAL(38,0)) * pair_count * _t)"
                " DIV (CAST(_c1 AS DECIMAL(38,0)) * _c2) AS LONG)"
            ).alias("lift_scaled"),
        )
    )
    pre = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("lift_scaled").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    final = Window.orderBy(
        F.col("lift_scaled").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return (
        cand.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= top_n)
        .drop("_pr")
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= top_n)
        .select("rank", "w1", "w2", "pair_count", "lift_scaled")
    )
