"""Full-text retrieval over the documents table: a distributed
inverted index + BM25 ranking, the lexical face of the similarity
family (``functions/similarity.py`` is the dense-vector face).

Reference parity: retrieval is outside memiiso/debezium-server-iceberg's
CDC scope (it lands data INTO queryable tables —
``docs/caveats.md`` documents the read side as "any Iceberg-reading
engine"); a training-data platform needs lexical search over the landed
corpus for curation, decontamination forensics, and eval-set mining, so
the engine provides it as a first-class operator.

Scale design (the 100-TB shapes, per function):

``bm25_topk``
    The query workload is small by construction (a handful of query
    strings); its distinct terms broadcast into the corpus scan so the
    posting-list build only ever shuffles (doc, term) rows for terms
    someone asked about — the full-vocabulary inverted index is never
    materialized for a one-shot search.  Document frequencies are exact
    (counted over the term-filtered postings, which see every matching
    doc), corpus length statistics are one scalar aggregate, and the
    ranking arithmetic is pure integer DECIMAL(38,0) so a DuckDB oracle
    reproduces every score bit-for-bit.  The final top-k is two
    window passes: a salted per-(query, doc_id%64) pre-top-k bounds any
    single task's sort at 64·k rows per query before the global
    per-query rank — the standard skew escape for "one query matches
    half the corpus".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

# BM25 constants as exact rationals: k1 = 6/5, b = 3/4 (the classic
# 1.2/0.75 defaults).  The scoring contract below is derived by clearing
# denominators so every intermediate is an integer — see bm25_topk.
_SCALE = 1_000_000
# max distinct query terms inlined as an InSet literal in the tokenize
# pass; larger workloads take the broadcast semi-join (plan-size safety)
_TERM_INSET_MAX = 10_000


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_terms_col: str = "terms",
    exclude_self: bool = False,
) -> DataFrame:
    """BM25 top-k document retrieval for a batch of term-list queries.

    INTEGER SCORE CONTRACT (no libm ``log`` — engine ``ln`` rounding is
    not bit-portable, the same call DSIR made): the Robertson idf
    ``ln((N - df + 0.5) / (df + 0.5))`` is replaced by its argument as an
    exact rational, ``idfR = (2N - 2df + 1) / (2df + 1)`` — a monotone
    transform of the classic idf (documented divergence: scores are not
    on the log scale, rankings for single-term queries are identical and
    multi-term rankings weight rare terms more sharply).  With
    ``k1 = 6/5``, ``b = 3/4``, ``avgdl = T / N`` (T = total corpus
    tokens, N = corpus docs), clearing every denominator gives the
    per-(query, term, doc) partial score

        s = floor( SCALE * (2N - 2df + 1) * 22 * tf * T
                   / ((2df + 1) * (10*T*tf + 3*T + 9*dl*N)) )

    computed in DECIMAL(38,0) (HUGEINT in the DuckDB oracle).  Overflow
    headroom: the numerator is < SCALE * 2N * 22 * tf * T; at a 100-TB
    corpus (N ~ 1e11 docs, T ~ 1e14 tokens, tf <= 1e3) that is ~4e35 <
    1e38.  A document's score is the BIGINT sum of its matched terms'
    partials (bounded by ~8 terms * 1.5e17 at N = 1e11 — inside int64).

    Queries arrive as ``(query_id, terms array<string>)``; duplicate
    terms within a query are collapsed (qtf = 1 — the common
    implementation choice for short queries).  Ties rank by ascending
    ``doc_id``.  Returns ``(query_id, rank, doc_id, score)``.

    ``exclude_self`` drops the document whose id equals the query id
    before ranking — for query batches DERIVED from corpus documents
    (related-document retrieval, fusion gates), where the source doc
    trivially ranking first is noise.
    """
    # distinct (query, term) pairs; workload-sized by contract -> the
    # same budget as the broadcasts below.  The term SET is fetched
    # driver-side so the queried-term filter can run as a codegen'd
    # InSet inside the ONE corpus tokenize pass (no join needed there).
    qterms = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.explode(query_terms_col).alias("_term"),
    ).distinct()
    # Small term sets inline as a codegen'd InSet inside the one tokenize
    # pass; a LARGE workload (tens of thousands of distinct terms) would
    # build a huge literal expression tree and per-row set into the plan —
    # above the threshold, fall back to the broadcast semi-join, which is
    # robust to term-set size.  The bounded limit() keeps the driver fetch
    # threshold-sized either way.
    term_rows = (
        qterms.select("_term")
        .distinct()
        .limit(_TERM_INSET_MAX + 1)
        .collect()
    )
    inline_terms = len(term_rows) <= _TERM_INSET_MAX

    # ONE corpus tokenize pass (formerly two: a stats aggregation and the
    # postings explode each re-ran the regexp tokenizer over every doc).
    # Materialize a NARROW per-doc projection — (id, dl, tokens∩terms) —
    # and derive both stats and postings from it: ~tens of bytes per doc
    # vs re-scanning raw text, the same "decide on a lightweight proxy"
    # trade the postings checkpoint already made.  (On the semi-join
    # fallback the checkpoint carries the full token array instead of
    # the matched subset — the price of not inlining the term set.)
    if inline_terms:
        term_list = [r["_term"] for r in term_rows]
        matched = (
            F.filter(F.col("_tk"), lambda t: t.isin(*term_list))
            if term_list
            else F.array().cast("array<string>")
        )
    else:
        matched = F.col("_tk")
    perdoc = (
        docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_tk"))
        .select(
            F.col(id_col),
            F.size("_tk").alias("_dl"),
            matched.alias("_mt"),
        )
        .localCheckpoint(eager=False)
    )

    # one scalar row: corpus size + total token count
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_t")
    )

    # posting lists ONLY for queried terms, exploded from the pre-filtered
    # token arrays — the groupBy shuffles matching (doc, term, dl) rows
    # only.  Still materialized once: both the dfreq branch and the
    # scoring branch consume it.
    exploded = perdoc.select(
        F.col(id_col), F.col("_dl"), F.explode("_mt").alias("_term")
    )
    if not inline_terms:
        # queried-term filter as a broadcast semi-join (term set too big
        # to inline); the broadcast is workload-sized by contract
        exploded = exploded.join(
            F.broadcast(qterms.select("_term").distinct()), "_term", "leftsemi"
        )
    postings = (
        exploded.groupBy(id_col, "_term")
        .agg(F.count(F.lit(1)).alias("_tf"), F.max("_dl").alias("_dl"))
        .localCheckpoint(eager=False)
    )

    # exact document frequency per queried term (bounded by |terms| rows)
    dfreq = postings.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))

    scored = (
        postings.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("_term"),
            F.expr(
                f"CAST((CAST({_SCALE} AS DECIMAL(38,0))"
                " * (2 * _n - 2 * _df + 1) * (22 * _tf) * _t)"
                " DIV (CAST(2 * _df + 1 AS DECIMAL(38,0))"
                " * (10 * _t * _tf + 3 * _t + 9 * _dl * _n)) AS LONG)"
            ).alias("_s"),
        )
    )

    per_doc = (
        scored.join(F.broadcast(qterms), "_term")
        .groupBy("_qid", id_col)
        .agg(F.sum("_s").alias("score"))
    )
    if exclude_self:
        per_doc = per_doc.filter(F.col("_qid") != F.col(id_col))

    # two-phase exact top-k: salted pre-rank bounds any task at 64*k rows
    # per query, then the global per-query window ranks the survivors
    pre = Window.partitionBy(
        "_qid", F.pmod(F.col(id_col), F.lit(64))
    ).orderBy(F.col("score").desc(), F.col(id_col).asc())
    final = Window.partitionBy("_qid").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_doc.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= k)
        .drop("_pr")
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            "rank",
            F.col(id_col),
            "score",
        )
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of N ranked
    retrieval lists — the standard hybrid-search combiner (lexical BM25
    + dense ANN in production RAG/search stacks), chosen because it
    needs NO score calibration across systems: only ranks fuse.

    INTEGER SCORE CONTRACT: each system contributes
    ``floor(SCALE / (c + rank))`` (SCALE = 1e6, c = 60 — the paper's
    constant) and a document's fused score is the int64 sum over the
    systems that retrieved it.  Sum-of-floors, fixed per-list, is
    engine-portable where float 1/(c+r) sums are not (oracle-parity
    rule).  Ties rank by ascending ``id_col``.

    Scale shape: the inputs are ALREADY top-k'd per query by their
    retrievers (k-bounded per (query, system)), so the union is
    planning-small relative to the corpus; fusion is one groupBy on
    (query, doc) plus the same salted two-phase top-k as
    :func:`bm25_topk`.  Returns ``(query_id, rank, doc_id,
    rrf_score)``.
    """
    contribs = [
        d.select(
            F.col(query_id_col).alias("_qid"),
            F.col(id_col).alias("_did"),
            F.expr(f"CAST({_SCALE} DIV ({c} + {rank_col}) AS LONG)").alias(
                "_c"
            ),
        )
        for d in ranked_lists
    ]
    unioned = contribs[0]
    for d in contribs[1:]:
        unioned = unioned.unionByName(d)
    fused = unioned.groupBy("_qid", "_did").agg(F.sum("_c").alias("rrf_score"))
    pre = Window.partitionBy("_qid", F.pmod(F.col("_did"), F.lit(64))).orderBy(
        F.col("rrf_score").desc(), F.col("_did").asc()
    )
    final = Window.partitionBy("_qid").orderBy(
        F.col("rrf_score").desc(), F.col("_did").asc()
    )
    return (
        fused.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= k)
        .drop("_pr")
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            "rank",
            F.col("_did").alias(id_col),
            "rrf_score",
        )
    )
