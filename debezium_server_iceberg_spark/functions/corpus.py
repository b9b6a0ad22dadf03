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
from .text import quality_score


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_size: int = 3,
) -> DataFrame:
    """Pairwise n-gram overlap between sources: the corpus contamination
    matrix (which feeds dedup priorities and mixture design).

    For each unordered source pair: distinct-shingle intersection size,
    both set sizes, Jaccard, and both directed containments.

    Scale: one distinct-shuffle to (source, shingle); the pair join fans
    each shingle out to at most ``n_sources - 1`` partners, so the
    intermediate is bounded by ``|distinct shingles| * n_sources`` — for
    thousands of sources swap the exact intersection for a theta/HLL
    sketch per source (same shape, sketch-merge instead of count).
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
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
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
