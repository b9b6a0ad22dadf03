"""Corpus-curation operators for LLM training-data pipelines:
segment-level exact dedup, Gopher-style quality rules, temperature-based
mixture sampling, equi-width length histograms, and a Lloyd k-means step
over embeddings.

These extend the reference's data-processing surface (the reference stops
at CDC ingest; a training pipeline consumes those tables downstream —
SURVEY.md §2.8). Like functions/text.py and functions/pipeline.py, every
operator is a pure built-in-function transform (JVM-side, codegen'd, no
Python in the row path) designed so an ANSI-SQL oracle reproduces it
exactly:

- segment_dedup: the C4/RefinedWeb "remove repeated boilerplate" pass —
  documents are split into fixed-size token segments, a segment is kept
  only at its globally-first occurrence (ordered by doc, then position),
  and surviving segments are re-joined into the deduplicated text.
- gopher_rules: Gopher-style (Rae et al. 2021, public) document quality
  rules as deterministic integer/ratio features + a composite boolean.
- temperature_mixture: UniMax-style source re-balancing with temperature
  alpha = 1/2. The keep decision `bucket < 1000·sqrt(min_w/w_s)` is
  evaluated as the INTEGER predicate `bucket²·w_s < 10⁶·min_w` in
  decimal/hugeint arithmetic, so it is exact, overflow-safe at corpus
  scale, and bit-identical across engines — no float boundary cases.
- length_histogram: equi-width binning with pure integer bucket math
  (no percentile machinery, no global sort).
- kmeans_lloyd_step: one assignment+update round of Lloyd's algorithm
  with deterministic seeding (lowest ids) and deterministic argmin
  (row_number over (dist, centroid_id)).

100 TB notes: segment_dedup is the only multi-shuffle operator (one
shuffle keyed on segment hash for the keep-first window, one keyed on doc
id for reassembly — both the minimum the semantics allow; the segment
hash shuffle is the same shape as exact doc dedup and scales the same
way). gopher_rules and length_histogram are single-pass projections (the
histogram's min/max pre-pass is a 1-row broadcast). temperature_mixture
aggregates one row per source (broadcast back, then a codegen'd filter).
kmeans_lloyd_step broadcasts k centroid rows and shuffles once per
groupBy — the canonical distributed Lloyd round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .pipeline import _hash_bucket
from .text import STOPWORDS, tokens_col

# Gopher-style bounds (public: Rae et al., "Scaling Language Models", §A1.1)
GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_LEN = 2.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_STOPWORD_HITS = 2
# the shared English lexicon (text.py documents it as oracle-shared);
# one definition keeps gopher_rules and lang_id from drifting apart
GOPHER_STOPWORDS = STOPWORDS["en"]


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 32,
) -> DataFrame:
    """Segment-level exact deduplication: split each document into
    non-overlapping ``seg_tokens``-token segments, keep each distinct
    segment text only at its first occurrence in (doc_id, seg_id) order,
    and reassemble the surviving segments per document.

    Returns one row per input document:
    ``(id_col, n_segments, n_kept, deduped_text)`` — a fully-duplicated
    document survives with ``n_kept = 0`` and empty text, which is what a
    downstream length filter expects to remove.

    Scale: the keep-first decision is a row_number window partitioned by
    the segment hash — a single hash shuffle whose key space is the
    distinct-segment set (same shape as exact document dedup); reassembly
    is one groupBy on the doc id. No sort spans more rows than one
    segment-hash group (bounded by the duplication factor).
    """
    if seg_tokens <= 0:
        raise ValueError("seg_tokens must be positive")
    with_toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(seg_tokens))
    segs = with_toks.select(
        F.col(id_col),
        F.explode(starts).alias("_start"),
        F.col("_toks"),
    ).select(
        F.col(id_col),
        (F.col("_start") / seg_tokens).cast("long").alias("_seg_id"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(seg_tokens)), " "
        ).alias("_seg_text"),
    )
    w = Window.partitionBy(F.md5("_seg_text")).orderBy(id_col, "_seg_id")
    flagged = segs.withColumn("_rn", F.row_number().over(w))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                # sort_array over (seg_id, text) structs keeps document order
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct(F.col("_seg_id"), F.col("_seg_text")),
                            )
                        )
                    ),
                    lambda s: s._seg_text,
                ),
                " ",
            ).alias("deduped_text"),
        )
    )


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style quality rules as deterministic features + verdict.

    - ``n_tokens``: token count (shared tokenizer, functions/text.py);
    - ``mean_token_len``: total token characters / n_tokens, rounded to 4
      (total characters computed as ``length(concat_ws('', tokens))`` —
      pure integer inputs, so the division is the only float op);
    - ``stopword_hits``: tokens (with multiplicity) in the English
      stopword list;
    - ``passes``: all bounds hold.
    """
    toks = tokens_col(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size("_toks")
    tok_chars = F.length(F.concat_ws("", F.col("_toks")))
    mean_len = F.round(tok_chars.cast("double") / n.cast("double"), 4)
    stop_lit = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    hits = F.size(F.filter(F.col("_toks"), lambda x: F.array_contains(stop_lit, x)))
    return d.select(
        F.col(id_col),
        n.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        hits.alias("stopword_hits"),
        (
            (n >= GOPHER_MIN_TOKENS)
            & (n <= GOPHER_MAX_TOKENS)
            & (mean_len >= GOPHER_MIN_MEAN_LEN)
            & (mean_len <= GOPHER_MAX_MEAN_LEN)
            & (hits >= GOPHER_MIN_STOPWORD_HITS)
        ).alias("passes"),
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """UniMax-style temperature (alpha = 1/2) source re-balancing: the
    smallest source keeps everything; a source with total weight ``w_s``
    keeps a ``sqrt(min_w / w_s)`` fraction, flattening the source
    distribution toward uniform without starving the tail.

    The keep decision is the md5 bucket filter from
    :func:`..pipeline.stratified_sample`, but the rate comparison
    ``bucket < 1000·sqrt(min_w/w_s)`` is evaluated as
    ``bucket²·w_s < 10⁶·min_w`` in decimal(38,0) arithmetic — exact
    integer math (no sqrt, no float rounding at the keep boundary), and
    overflow-safe: with per-source weights up to 10¹⁴ (a 100 TB corpus)
    the product is ≤ 10²⁰, far inside decimal(38).

    One tiny aggregate (one row per source) broadcast back onto the fact
    scan; the filter itself is codegen'd — no shuffle of the corpus.
    """
    dec = "decimal(38,0)"
    weights = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col)).cast(dec).alias("_w")
    )
    min_w = weights.agg(F.min("_w").cast(dec).alias("_min_w"))
    rates = weights.crossJoin(F.broadcast(min_w))
    # the cross-engine md5 bucket contract lives in ONE place (pipeline.py)
    docs = df.select(
        F.col(id_col), F.col(source_col), _hash_bucket(id_col).alias("bucket")
    )
    return (
        docs.join(F.broadcast(rates), source_col)
        .filter(
            F.col("bucket").cast(dec) * F.col("bucket").cast(dec) * F.col("_w")
            < F.lit(1_000_000).cast(dec) * F.col("_min_w")
        )
        .select(id_col, source_col, "bucket")
    )


def epoch_plan(
    df: DataFrame,
    budget_frac_num: int = 1,
    budget_frac_den: int = 2,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-recipe epoch planning: given a token budget (a fraction of
    the corpus) and temperature-flattened target shares, how many
    EPOCHS (repeat passes) does each source need?  This is the planning
    table behind LLaMA-style training mixes, where small high-value
    sources are repeated (epochs > 1) while the web crawl is sampled
    once — the "oversampling plan" every data card publishes.

    All arithmetic is exact:

    - per-source token mass ``w_s`` is an integer aggregate;
    - the alpha = 1/2 temperature weight is ``r_s = floor(sqrt(w_s))``
      — IEEE double sqrt is correctly rounded, so floor(sqrt) is exact
      for any ``w_s < 2^52`` (a 100-TB corpus is ~10^14 tokens, three
      orders inside the bound);
    - ``alloc_s = floor(T * r_s / sum(r))`` and
      ``epochs_s = ceil(alloc_s / w_s)`` in decimal(38,0).

    Output: one row per source — planning scale, never corpus scale;
    the whole operator is one partial-agg groupBy plus broadcast
    totals."""
    dec = "decimal(38,0)"
    w = (
        df.select(F.col(source_col), F.size(tokens_col(F.col(text_col))).alias("_n"))
        .groupBy(source_col)
        .agg(F.sum("_n").cast(dec).alias("tokens_available"))
        .withColumn(
            "_r", F.floor(F.sqrt(F.col("tokens_available").cast("double"))).cast(dec)
        )
    )
    tot = w.agg(
        F.sum("tokens_available").cast(dec).alias("_tot"),
        F.sum("_r").cast(dec).alias("_den"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.col("tokens_available").cast("long").alias("tokens_available"),
            F.expr(
                f"CAST(CAST(_tot * {budget_frac_num} DIV {budget_frac_den}"
                f" AS {dec}) * _r DIV _den AS LONG)"
            ).alias("alloc_tokens"),
        )
        .select(
            source_col,
            "tokens_available",
            "alloc_tokens",
            F.expr(
                "CAST((alloc_tokens + tokens_available - 1)"
                " DIV tokens_available AS LONG)"
            ).alias("epochs"),
        )
        .withColumn("oversampled", F.col("epochs") > 1)
    )


def length_histogram(
    df: DataFrame, value_col: str = "n_chars", bins: int = 8
) -> DataFrame:
    """Equi-width histogram over an integer column with pure integer
    bucket math: ``bucket = (v - min) * bins / (max - min + 1)`` (integer
    division) — every value lands in 0..bins-1 with no float boundary
    ambiguity, unlike width_bucket's double arithmetic.

    The min/max pre-pass is a 1-row aggregate broadcast back onto the
    scan; the binning groupBy shuffles ≤ ``bins`` rows per partition
    (partial aggregation). No global sort, no percentile state — the
    100 TB-friendly way to bucket by length.
    """
    bounds = df.agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    v = F.col(value_col).cast("long")
    # explicit floor(): Spark's cast-to-long truncates but DuckDB's cast
    # rounds half-even; floor of the identical IEEE quotient agrees
    bucket = F.floor(
        (v - F.col("_mn")) * bins / (F.col("_mx") - F.col("_mn") + 1)
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), v.alias("_v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
            F.sum("_v").alias("sum_value"),
        )
    )


def kmeans_lloyd_step(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration of k-means over an embedding column, fully
    deterministic so an independent engine reproduces it bit-for-bit:

    - seed centroids = the ``k`` vectors with the lowest ids (no RNG);
    - distances are sequential-fold double sums over ``zip_with`` squared
      differences — the element order fixes the summation order;
    - assignment ties break toward the lower centroid id
      (``row_number over (dist², centroid_id)``).

    Returns per-cluster ``(cluster_id, n_members, avg_dist2,
    centroid_c1)`` with float outputs rounded to 4 decimals (cross-engine
    sum-order noise in the *aggregates* is ~1e-12 relative; rounding
    absorbs it).

    Scale: the k seed rows are broadcast (one small crossJoin — k·N
    distance rows never materialize wider than the projection), the
    argmin is a per-vector window over k rows, and the update is one
    groupBy with map-side partial aggregation. This is the canonical
    distributed Lloyd round; iterate by feeding the new centroids back
    in. The full iterative loop (driver-side convergence check over this
    step) is `semantic_dedup`'s clustering path — here one step is
    exposed as its own operator because one step is what an SQL oracle
    can replay exactly.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pts = embeddings.select(F.col(id_col), vec.alias("_v"))
    cents = (
        pts.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cluster_id"), F.col("_v").alias("_c"))
    )
    dist2 = F.aggregate(
        F.zip_with("_v", "_c", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pts.crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col("cluster_id"), dist2.alias("_d2"), F.col("_v")
    )
    w = Window.partitionBy(id_col).orderBy("_d2", "cluster_id")
    assigned = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("_d2"), 4).alias("avg_dist2"),
        F.round(F.avg(F.element_at("_v", 1)), 4).alias("centroid_c1"),
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Exact global rank over (value, id) WITHOUT a single-partition
    window — the curriculum-ordering primitive (sort a corpus by quality
    and shard it) that Spark's ``row_number() OVER (ORDER BY ...)``
    cannot give you at scale because an un-partitioned window collapses
    every row into one task.

    Two-level decomposition, all JVM-side:

    1. per-VALUE counts (one partial-aggregated groupBy) → a running
       offset per distinct value via a window over the distinct-value
       relation — single-partition, but its row count is the number of
       DISTINCT values (a quality score rounded to 4 decimals has ≤10^4
       of them at any corpus size), not the corpus;
    2. intra-value rank: ``row_number`` partitioned BY the value —
       distributed across values; ties inside one value order by the id.

    ``rank = value_offset + intra_rank`` is exactly the rank the global
    window would produce (1-based, no gaps).  Skew caveat: one massive
    tied value concentrates its intra-rank in few tasks — acceptable for
    score-like columns, wrong tool for constant columns.
    """
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_n"))
    w_vals = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        F.col(value_col),
        F.coalesce(F.sum("_n").over(w_vals), F.lit(0)).alias("_offset"),
    )
    w_intra = Window.partitionBy(value_col).orderBy(F.col(id_col).asc())
    # eqNullSafe join: a plain name-join drops NULL-valued rows while a
    # row_number window would rank them — NULLs group together here and
    # take the window's NULL position (asc_nulls_first / desc_nulls_last).
    offsets = offsets.withColumnRenamed(value_col, "_rank_val")
    return (
        df.join(F.broadcast(offsets), F.col(value_col).eqNullSafe(F.col("_rank_val")))
        .withColumn("rank", F.col("_offset") + F.row_number().over(w_intra))
        .drop("_offset", "_rank_val")
    )


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-proxy quality scoring: each document's mean negative
    log2 probability under the corpus's own unigram distribution — the
    cheap stand-in for LM-perplexity bucketing in data pipelines (low
    score = typical text, high = gibberish/outlier vocabulary).

    ``score = -(1/n) * sum(log2(count(tok) / total_tokens))`` over the
    document's tokens, rounded to 4 (double sum-order noise).

    Scale: one explode + partial-aggregated groupBy builds the unigram
    table (rows = vocabulary size, not corpus size); the per-token join
    back is keyed on the token (AQE broadcasts a small vocabulary); the
    final per-doc aggregation shuffles one row per (doc, partition).
    Everything stays in codegen'd built-ins — the log-prob arithmetic is
    a column expression, not a UDF.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("_tok")
    )
    counts = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    total = counts.agg(F.sum("_cnt").alias("_total"))
    scored = (
        toks.join(counts, "_tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (-F.log2(F.col("_cnt").cast("double") / F.col("_total").cast("double"))
             ).alias("_nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_nll"), 4).alias("mean_neg_log2_prob"),
    )


def bigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram-LM perplexity proxy — the KenLM-style fluency score one
    tier above ``unigram_logprob_score`` (unigram scoring flags alien
    VOCABULARY; bigram scoring flags alien WORD ORDER — shuffled or
    boilerplate-stitched text scores high here while passing the
    unigram filter).

    ``score = -(1/(n-1)) * sum log2((c(w1 w2) + 1) / (ctx(w1) + V))``
    over the document's adjacent bigrams: add-one-smoothed conditional
    probability, ``ctx(w1)`` = number of corpus bigrams starting with
    w1 (so the conditional sums to 1 over the smoothed vocabulary),
    ``V`` = corpus distinct-token count.  Rounded to 4 (double
    sum-order noise), the same float contract as the unigram scorer.

    Scale: the bigram stream is built in-array inside the scan stage
    (no window shuffle for adjacency) and materialized ONCE
    (tokenization and the interpreted in-array gram transform each run
    a single corpus pass; without the checkpoints every consumer
    replayed them — 4 tokenize passes and 3 gram passes for one
    score); the bigram count table is bounded by distinct corpus
    bigrams, and the context table folds out of it (``ctx(w1)`` is the
    sum of ``c12`` over the bigrams starting with ``w1`` — a
    bounded-table re-aggregation, never a second corpus-sized pass);
    the scoring pass joins the stream on the bigram key then the
    context key (AQE picks broadcast when the tables are small, SMJ
    when not — neither is pinned because both genuinely scale with
    corpus text diversity); one final per-doc aggregation.  Docs with
    < 2 tokens have no bigrams and are absent — a bigram LM cannot
    score them.
    """
    # one tokenize pass: vocab AND the gram stream read this relation
    toks0 = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_tk")
    ).localCheckpoint(eager=True)
    toks = toks0.filter(F.size("_tk") >= 2)
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_tk") - 2),
                lambda i: F.struct(
                    F.get(F.col("_tk"), i).alias("w1"),
                    F.concat_ws(" ", F.slice("_tk", i + 1, 2)).alias("pair"),
                ),
            )
        ).alias("_g"),
    ).select(
        F.col(id_col), F.col("_g.w1").alias("w1"), F.col("_g.pair").alias("pair")
    ).localCheckpoint(eager=False)  # one interpreted gram pass, two consumers
    pair_counts = grams.groupBy("w1", "pair").agg(F.count(F.lit(1)).alias("_c12"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab = (
        toks0.select(F.explode("_tk").alias("_t"))
        .agg(F.count_distinct("_t").alias("_v"))
    )
    scored = (
        grams.join(pair_counts.select("pair", "_c12"), "pair")
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log2(
                    (F.col("_c12") + 1).cast("double")
                    / (F.col("_c1") + F.col("_v")).cast("double")
                )
            ).alias("_nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_nll"), 4).alias("mean_neg_log2_prob"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al., "Data
    Selection for Language Models via Importance Resampling", NeurIPS
    2023 — public): score every raw-corpus document by how much its
    hashed n-gram distribution looks like a small TARGET domain, the
    standard recipe for selecting pretraining data toward a downstream
    distribution.

    Integer contract (no float log-likelihoods, whose libm rounding can
    differ between engines): each n-gram OCCURRENCE maps to bucket
    ``b = md5-bucket(gram) % n_buckets``; with add-one smoothing the
    per-bucket score is

        s_b = floor(scale * (t_b + 1) * (R + B) / ((r_b + 1) * (T + B)))

    (t_b / r_b = target / raw occurrence counts in bucket b, T / R their
    totals, B = n_buckets), computed in DECIMAL(38,0)/HUGEINT so a
    DuckDB oracle reproduces every weight bit-for-bit.  s_b is the
    scaled smoothed likelihood ratio p_target(b)/p_raw(b); a document's
    ``weight`` is the sum of its occurrences' scores, and
    ``weight_per_gram ~ scale`` reads "distributed like the target".
    Resampling = rank or threshold on weight_per_gram downstream (e.g.
    with quality_top_p or stratified_sample).

    Scale shape: bucket stats are two bounded aggregations (<= B rows
    each) merged into ONE broadcast score table; the raw corpus is
    scored inside its scan stage (explode -> bucket -> broadcast join)
    with a single per-doc aggregation shuffle.  The raw side is
    tokenized and hashed exactly ONCE: the bucketed-gram relation
    (id, bucket — two narrow ints per gram occurrence, far smaller
    than the text it came from) is materialized via localCheckpoint
    and BOTH the distribution aggregate and the scoring join read the
    materialized blocks, so the dominant cost (scan + tokenize + md5
    over the raw text) is paid once instead of twice (VERDICT r10
    item 5; the pre-r11 shape re-scanned raw per consumer).  Nothing
    corpus-sized is ever collected or broadcast.  Documents with fewer
    than ``n`` tokens produce no grams and are absent from the output.
    """
    from .text import word_gram_hashes

    def bucketed(df: DataFrame) -> DataFrame:
        return word_gram_hashes(df, n, text_col, id_col).select(
            id_col,
            (F.conv(F.substring("_h", 1, 8), 16, 10).cast("long") % n_buckets).alias(
                "_b"
            ),
        )

    # one raw-text scan total: tokenize+hash once, reuse for both the
    # distribution pass and the scoring join (same single-materialization
    # pattern as BM25's postings and bitext's kNN relation)
    raw_b = bucketed(raw).localCheckpoint(eager=True)
    tgt_b = bucketed(target)
    r_counts = raw_b.groupBy("_b").agg(F.count(F.lit(1)).alias("r_b"))
    t_counts = tgt_b.groupBy("_b").agg(F.count(F.lit(1)).alias("t_b"))
    # the merged per-bucket counts (<= n_buckets rows) feed two
    # consumers (totals + score); checkpointing this BOUNDED relation
    # costs ~B rows and makes the target side single-scan as well
    counts = (
        r_counts.join(t_counts, "_b", "full")
        .select(
            "_b",
            F.coalesce("r_b", F.lit(0)).alias("r_b"),
            F.coalesce("t_b", F.lit(0)).alias("t_b"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    score = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.expr(
                f"CAST((CAST({scale} AS DECIMAL(38,0)) * (t_b + 1)"
                f" * (r_tot + {n_buckets}))"
                f" DIV (CAST(r_b + 1 AS DECIMAL(38,0)) * (t_tot + {n_buckets}))"
                " AS LONG)"
            ).alias("s"),
        )
    )
    return (
        raw_b.join(F.broadcast(score), "_b")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("s").alias("weight"))
        .select(
            id_col,
            "n_grams",
            "weight",
            (F.col("weight") / F.col("n_grams")).alias("weight_per_gram"),
        )
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    k: int = 8,
    per_cluster: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced coreset selection (the D4 / SemDeDup-family
    diversity recipe, Abbas et al. 2023 — public): assign every
    embedding to its nearest of ``k`` deterministic centroids, then keep
    a FIXED budget per cluster — balanced coverage of the embedding
    space instead of letting the dominant mode eat the whole sample.

    Determinism contract (assignment is byte-for-byte the
    ``kmeans_lloyd_step`` one the oracle already replays): lowest-id
    seed centroids, sequential-fold squared distances, ties to the
    lower centroid id.  Within a cluster the "random" draw is the
    md5-of-id order (rerun-stable, engine-portable) with the id as
    tiebreak.

    Scale: k seed rows broadcast; the argmin is a ``min_by(cluster_id,
    struct(d2, cluster_id))`` PARTIAL AGGREGATE over the k rows per
    vector — map-side combinable (the ``pq_encode`` idiom), one narrow
    shuffle and NO per-vector window sort (struct ordering compares d2
    then cluster_id: the exact tie contract); the per-cluster pick is
    the salted TWO-PHASE top-k (per-partition pre-prune to
    ``per_cluster``, then the bounded k*per_cluster survivors rank
    globally) — no single-cluster partition ever sees more than its
    per-partition winners, so one hot cluster cannot concentrate the
    corpus in one task.  Returns ``(cluster_id, vec_id, pick_rank)``.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pts = embeddings.select(F.col(id_col), vec.alias("_v"))
    cents = (
        pts.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cluster_id"), F.col("_v").alias("_c"))
    )
    dist2 = F.aggregate(
        F.zip_with("_v", "_c", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pts.crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col("cluster_id"), dist2.alias("_d2")
    )
    assigned = (
        scored.groupBy(id_col)
        .agg(
            F.min_by(
                "cluster_id", F.struct("_d2", "cluster_id")
            ).alias("cluster_id")
        )
        .select(
            "cluster_id",
            F.col(id_col),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
    )
    pre = Window.partitionBy("cluster_id", F.spark_partition_id()).orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    final = Window.partitionBy("cluster_id").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= per_cluster)
        .drop("_pr")
        .withColumn("pick_rank", F.row_number().over(final))
        .filter(F.col("pick_rank") <= per_cluster)
        .select("cluster_id", F.col(id_col), "pick_rank")
    )


def quality_rank_ensemble(
    df: DataFrame,
    top_n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-signal quality selection by RANK aggregation (the
    FineWeb-style ensemble recipe: single thresholds are brittle, so
    combine signals on the rank scale where calibration differences
    between signals cancel).  Signals, all exact integers computed in
    ONE scan of the text:

    - length: ``n_chars``
    - lexical diversity: ``floor(1e6 * distinct_tokens / tokens)``
    - alphabetic purity: ``floor(1e6 * word_pieces / pieces)`` under
      the BPE-ish regex

    Each signal gets an exact global rank via :func:`global_rank`
    (per-value offsets — NO single-partition corpus window), ranks sum,
    and the ``top_n`` docs by (rank_sum asc, doc_id) surface through
    the salted two-phase top-k.

    Scale: the signal projection is one codegen'd map over the scan,
    materialized once (localCheckpoint — three rank consumers);
    each global_rank shuffles the narrow (id, signal) relation once;
    the 3-way rank join keys on the id (SMJ, corpus-sized but narrow).
    Returns ``(doc_id, len_rank, diversity_rank, alpha_rank, rank_sum,
    rank)``.
    """
    from .text import BPE_RE, tokens_col

    toks = tokens_col(F.col(text_col))
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_RE), 0
    )
    n_words = F.size(F.filter(pieces, lambda x: x.rlike("^[a-z]+$")))
    base = df.select(
        F.col(id_col),
        F.length(text_col).alias("_len"),
        F.size(F.array_distinct(toks)).alias("_nd"),
        F.size(toks).alias("_nt"),
        n_words.alias("_nw"),
        F.size(pieces).alias("_np"),
    )
    # exact integer DIV (never float-divide-then-cast: a double quotient
    # one ULP under an integer would floor differently than the oracle)
    sig = base.select(
        F.col(id_col),
        F.col("_len"),
        F.expr("(1000000 * _nd) DIV greatest(_nt, 1)").alias("_div"),
        F.expr("(1000000 * _nw) DIV greatest(_np, 1)").alias("_alpha"),
    ).localCheckpoint(eager=True)
    r_len = global_rank(sig.select(id_col, "_len"), "_len", id_col).select(
        id_col, F.col("rank").alias("len_rank")
    )
    r_div = global_rank(sig.select(id_col, "_div"), "_div", id_col).select(
        id_col, F.col("rank").alias("diversity_rank")
    )
    r_alpha = global_rank(
        sig.select(id_col, "_alpha"), "_alpha", id_col
    ).select(id_col, F.col("rank").alias("alpha_rank"))
    ens = (
        r_len.join(r_div, id_col)
        .join(r_alpha, id_col)
        .withColumn(
            "rank_sum",
            F.col("len_rank") + F.col("diversity_rank") + F.col("alpha_rank"),
        )
    )
    pre = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("rank_sum").asc(), F.col(id_col).asc()
    )
    final = Window.orderBy(F.col("rank_sum").asc(), F.col(id_col).asc())
    return (
        ens.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= top_n)
        .drop("_pr")
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= top_n)
        .select(
            id_col, "len_rank", "diversity_rank", "alpha_rank",
            "rank_sum", "rank",
        )
    )

