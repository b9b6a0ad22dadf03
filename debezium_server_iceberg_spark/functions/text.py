"""Text-analysis operators for training-data pipelines (SURVEY.md §7 phase 6).

All pure built-in-function transforms (JVM-side, whole-stage-codegen'd; no
Python in the row path) designed so an ANSI-SQL oracle can reproduce them
exactly:

- tokenization: lower + split on ``[^a-z0-9]+`` + drop empties
- language-ID: stopword-hit voting over a fixed per-language lexicon
- quality score: distinct-ratio & length features, deterministic arithmetic
- fingerprinting: bottom-k sketch of word-4-gram md5 hashes

At 100 TB these are embarrassingly parallel single-pass projections —
no shuffle except the explicit aggregations; the only wide op in
fingerprinting is a per-doc groupBy that Catalyst executes with partial
aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[^a-z0-9]+"

# tiny deterministic stopword lexicons (shared with the SQL oracle)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
}


def tokens_col(text: Column) -> Column:
    """lower -> split -> drop empty strings. Oracle equivalent:
    ``list_filter(regexp_split_to_array(lower(t), '[^a-z0-9]+'), x -> x <> '')``"""
    return F.array_remove(F.split(F.lower(text), TOKEN_RE), "")


def with_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + composite score.

    score = round(0.5*distinct_ratio + 0.3*min(n_tokens,100)/100
                  + 0.2*alpha_ratio, 4)
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    text = F.col(text_col)
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    total = F.length(text)
    distinct_ratio = nd.cast("double") / n.cast("double")
    len_feat = F.least(n, F.lit(100)).cast("double") / F.lit(100.0)
    alpha_ratio = alpha.cast("double") / total.cast("double")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(
            F.lit(0.5) * distinct_ratio + F.lit(0.3) * len_feat + F.lit(0.2) * alpha_ratio,
            4,
        ).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID. Ties break by language code ascending;
    zero hits -> 'und'."""
    toks = tokens_col(F.col(text_col))
    hit_cols = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        hit_cols.append(hits.alias(f"hits_{lang}"))
    with_hits = df.select(F.col(id_col), F.col(text_col), *hit_cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # ascending tie-break: earlier lang wins
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)).otherwise(pred)
    return with_hits.select(
        F.col(id_col),
        *[F.col(f"hits_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, and single non-space
# symbols — the coarse split GPT-2-style BPE applies before merges.  Plain
# alternation, valid in both Java regex (Spark) and RE2 (DuckDB oracle).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def bpe_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting under a BPE-ish regex: totals plus per-class counts
    (word pieces / digit runs / symbols). One codegen'd projection, no
    shuffle — a pure map at any scale."""
    pieces = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
    df = df.select(F.col(id_col), pieces.alias("_p"))
    n_words = F.size(F.filter(F.col("_p"), lambda x: x.rlike("^[a-z]+$")))
    n_digits = F.size(F.filter(F.col("_p"), lambda x: x.rlike("^[0-9]+$")))
    return df.select(
        F.col(id_col),
        F.size("_p").alias("n_pieces"),
        n_words.alias("n_word_pieces"),
        n_digits.alias("n_digit_pieces"),
        (F.size("_p") - n_words - n_digits).alias("n_symbol_pieces"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """Bottom-k document fingerprint over word 4-gram md5 hashes.

    Rolling-hash-style sketch: the k lexicographically smallest md5s of the
    doc's word 4-grams, concatenated. Robust to local edits like winnowing,
    and exactly reproducible in SQL (min over group / row_number<=k).
    """
    # materialize the token array once per row BEFORE gram construction:
    # inlining the regexp split into the transform lambda re-evaluates it per
    # sequence element (measured 6x slower at sf0.1)
    with_toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_tk"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_tk") - 4, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, 4)),
    )
    exploded = (
        with_toks.select(F.col(id_col), F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .select(F.col(id_col), F.md5(F.col("gram")).alias("h"))
        .groupBy(id_col)
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("hs"))
    )
    return exploded.select(
        F.col(id_col),
        F.concat_ws("", F.col("hs")).alias("fingerprint"),
        F.size("hs").alias("k_actual"),
    )


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
    max_top_frac: float = 0.20,
    max_dup_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, public),
    deterministic word-level variant:

    - ``top{top_n}_frac``: occurrences of the single most frequent word
      ``top_n``-gram divided by the total number of ``top_n``-grams;
    - ``dup{dup_n}_frac``: fraction of ``dup_n``-gram occurrences whose gram
      appears more than once in the doc;
    - ``keep``: both fractions under their thresholds.

    Plan shape: everything is computed IN-ROW from the doc's own sorted
    gram array (max frequency == longest run in the sorted array; duplicate
    occurrences == occurrences whose sorted neighbor matches), so the whole
    operator is one codegen'd projection with ZERO shuffle — at 100 TB it is
    a pure map over the corpus scan, unlike the naive explode + per-(doc,
    gram) groupBy which shuffles one row per gram occurrence.  The SQL
    oracle computes the same numbers the naive way, so the run-length
    identity is verified, not assumed.
    """

    def _sorted_grams(n: int) -> Column:
        g = F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.size("_tk") - n),
                lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, n)),
            )
        )
        return F.when(F.size("_tk") >= n, g).otherwise(
            F.array().cast("array<string>")
        )

    def _max_run(col: Column) -> Column:
        # longest run of equal elements in a sorted array == max gram count.
        # "" is never a gram (grams are non-empty token joins), so it is a
        # safe initial sentinel.
        run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.aggregate(
            col,
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                run(acc, x).alias("run"),
                F.greatest(acc["best"], run(acc, x)).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    def _dup_occurrences(col: Column) -> Column:
        # occurrences whose sorted neighbor (either side) equals them.
        # Sentinel-pad both ends so every element_at index is in bounds
        # (ANSI mode: no speculative out-of-range evaluation).
        m = F.size(col)
        padded = F.concat(F.array(F.lit("")), col, F.array(F.lit("")))
        singles = F.size(
            F.filter(
                F.sequence(F.lit(1), m),
                lambda j: (F.element_at(padded, j + 1) != F.element_at(padded, j))
                & (F.element_at(padded, j + 1) != F.element_at(padded, j + 2)),
            )
        )
        return F.when(m > 0, m - singles).otherwise(F.lit(0))

    def _frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)),
            4,
        )

    staged = df.select(
        F.col(id_col),
        tokens_col(F.col(text_col)).alias("_tk"),
    ).select(
        F.col(id_col),
        F.size("_tk").alias("n_tokens"),
        _sorted_grams(top_n).alias("_gt"),
        _sorted_grams(dup_n).alias("_gd"),
    )
    top_frac = _frac(_max_run(F.col("_gt")), F.size("_gt"))
    dup_frac = _frac(_dup_occurrences(F.col("_gd")), F.size("_gd"))
    return staged.select(
        F.col(id_col),
        F.col("n_tokens"),
        top_frac.alias(f"top{top_n}_frac"),
        dup_frac.alias(f"dup{dup_n}_frac"),
        (
            (top_frac <= F.lit(max_top_frac)) & (dup_frac <= F.lit(max_dup_frac))
        ).alias("keep"),
    )


def word_gram_hashes(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str | None = "doc_id",
) -> DataFrame:
    """(id?, md5(word n-gram)) pairs — the shared scan-stage projection of
    the decontamination / exact-substring operators.  Grams are md5-hashed
    in the same projection so downstream shuffles and broadcasts carry 16
    bytes, never n-word strings."""
    ids = [F.col(id_col)] if id_col else []
    with_toks = df.select(
        *ids, tokens_col(F.col(text_col)).alias("_tk")
    ).filter(F.size("_tk") >= n)
    g = F.transform(
        F.sequence(F.lit(0), F.size("_tk") - n),
        lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, n)),
    )
    return with_toks.select(*ids, F.explode(g).alias("_gram")).select(
        *ids, F.md5(F.col("_gram")).alias("_h")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    ``n``-gram with a benchmark/eval set (the standard leakage filter a
    training-data pipeline runs before every corpus release).

    Plan shape for 100 TB: the benchmark side is tiny by construction —
    its distinct gram hashes broadcast; the corpus side is one narrow
    projection (id, md5(gram)) exploded in the scan stage, so the only
    wide operation is a broadcast semi-ish inner join + per-doc count.
    Grams are md5-hashed before the join so shuffle/broadcast rows carry
    16 bytes, not n-word strings.

    Returns (id_col, n_hits) for CONTAMINATED docs only — n_hits = number
    of distinct shared n-grams."""
    bench_grams = word_gram_hashes(benchmark, n, text_col, None).distinct()
    doc_grams = word_gram_hashes(docs, n, text_col, id_col)
    hits = doc_grams.join(F.broadcast(bench_grams), "_h")
    return hits.groupBy(id_col).agg(
        F.count_distinct(F.col("_h")).alias("n_hits")
    )


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-prefiltered decontamination — identical RESULT to
    :func:`decontaminate`, different 100-TB plan.

    The exact operator's broadcast join still streams EVERY corpus gram
    into the join operator.  Here a bloom filter over the benchmark's
    gram hashes is shipped as a scalar and applied IN the corpus
    projection — the overwhelming majority of corpus grams die in the
    scan stage's codegen, and only bloom candidates reach the verifying
    broadcast join, whose exactness removes the false positives.  Output
    is therefore bit-identical to the exact operator at any
    false-positive rate.

    The bloom itself is hand-rolled from built-ins (Spark's internal
    ``bloom_filter_agg`` is not in the public function registry): k=4 bit
    positions per gram via seeded ``xxhash64``, OR-folded into a byte
    array by a ``bit_or`` aggregation, shipped as ONE binary literal, and
    probed with ``substring``/``conv`` byte tests — every membership test
    is O(1) JVM-side work inside the scan projection.

    Reference parity: leakage filtering is outside the reference's CDC
    scope; this is the standard corpus-release pattern (bloom prefilter +
    exact verify)."""
    K = 4
    # materialized once: both the sparse bloom build (collect below) and
    # the verifying broadcast join consume it — without the checkpoint the
    # benchmark gram explode+distinct runs twice
    bench_grams = (
        word_gram_hashes(benchmark, n, text_col, None)
        .distinct()
        .localCheckpoint(eager=False)
    )
    # fixed 4M-bit filter (a 512 KiB literal): ≥8 bits/gram up to 500k
    # benchmark grams ≈ ≤2.4% false positives with 4 probes, all removed
    # by the verifying join — sizing needs no extra counting action, and
    # a benchmark big enough to saturate it only degrades the PREFILTER
    # rate, never the result
    m_bits = 1 << 22

    def _bit(i):
        return F.pmod(F.xxhash64(F.col("_h"), F.lit(i)), F.lit(m_bits))

    # 1 << (bit % 8) with a COLUMN shift (F.shiftleft takes only int
    # shifts): an 8-element literal lookup, exact and codegen-friendly
    masks = F.array(*[F.lit(1 << j) for j in range(8)])

    def _mask(b):
        return F.element_at(masks, (b % 8).cast("int") + 1)

    # sparse build: (byte index, OR of masks) — rows bounded by
    # min(m_bits/8, K * n_grams); the collect is planning-scale, the same
    # budget as an IVF codebook fetch
    sparse = (
        bench_grams.select(
            F.explode(F.array(*[_bit(i) for i in range(K)])).alias("_b")
        )
        .select(
            (F.col("_b") / 8).cast("int").alias("_byte"),
            _mask(F.col("_b")).alias("_m"),
        )
        .groupBy("_byte")
        .agg(F.bit_or("_m").alias("_mask"))
        .collect()
    )
    bits = bytearray(m_bits // 8)
    for r in sparse:
        bits[r["_byte"]] |= r["_mask"]
    bloom = F.lit(bytes(bits))

    def _probe_hit(i):
        b = _bit(i)
        byte_val = F.conv(
            F.hex(F.substring(bloom, (b / 8).cast("int") + 1, F.lit(1))), 16, 10
        ).cast("int")
        return byte_val.bitwiseAND(_mask(b)) != 0

    might = _probe_hit(0)
    for i in range(1, K):
        might = might & _probe_hit(i)
    doc_grams = word_gram_hashes(docs, n, text_col, id_col)
    candidates = doc_grams.filter(might)
    hits = candidates.join(F.broadcast(bench_grams), "_h")
    return hits.groupBy(id_col).agg(
        F.count_distinct(F.col("_h")).alias("n_hits")
    )

def contamination_fraction(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    flag_num: int = 2,
    flag_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuzzy decontamination: score every training doc by the FRACTION
    of its distinct word ``n``-grams that appear in the benchmark set,
    and flag docs at or above ``flag_num/flag_den`` (default 20%).

    :func:`decontaminate` is the zero-tolerance face (any shared gram =
    contaminated); production pipelines usually use a graded overlap
    threshold instead — GPT-3's appendix documents 13-gram overlap
    filtering and PaLM/LLaMA-era pipelines flag docs whose high-order
    n-gram overlap fraction crosses a cutoff, because a single common
    boilerplate gram should not nuke a long document.  The flag
    predicate is INTEGER (``flag_den * n_hits >= flag_num * n_grams``)
    so an oracle reproduces every verdict exactly — never a float
    ratio compared against a float literal (oracle-parity rule).

    Output: ``(id, n_grams, n_hits, flagged)`` for every doc with at
    least one gram (docs shorter than ``n`` tokens have no grams and
    are absent — same convention as the other gram operators).

    Scale shape: identical to :func:`decontaminate` — benchmark grams
    broadcast, corpus grams die or survive inside the scan-side join,
    ONE corpus-keyed shuffle (the per-doc aggregate).  The left join
    keeps zero-hit docs so the fraction is a score, not a filter.
    """
    bench_grams = (
        word_gram_hashes(benchmark, n, text_col, None)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = word_gram_hashes(docs, n, text_col, id_col).distinct()
    joined = doc_grams.join(F.broadcast(bench_grams), "_h", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (
                F.lit(flag_den) * F.col("n_hits")
                >= F.lit(flag_num) * F.col("n_grams")
            ).alias("flagged"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every char ``k``-gram of
    the normalized text, slide a window of ``w`` consecutive gram
    hashes, and select each window's minimum (rightmost occurrence on
    ties).  Unlike the bottom-k sketch (``doc_fingerprint``), winnowing
    carries a LOCAL guarantee — any shared substring of length
    ``k + w - 1`` is caught by at least one shared fingerprint — which
    is what plagiarism/clone detection needs.

    Everything runs in-array inside the scan projection (gram hashing,
    the window-min fold with rightmost-tie argmin, the distinct): ZERO
    shuffles before the final per-doc row — each document's work is a
    pure column expression.  Selected fingerprints are deduped on
    (hash, position) per the paper, then summarized per doc as
    ``(id_col, n_fingerprints, fp_checksum)`` (checksum = exact BIGINT
    sum of selected 32-bit hashes, so any selection drift is visible).
    Docs whose normalized text is shorter than ``k + w - 1`` have no
    full window and are absent.
    """
    s = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = df.select(F.col(id_col), s.alias("_s")).filter(
        F.length("_s") >= k + w - 1
    )
    grams = F.expr(
        f"transform(sequence(1, length(_s) - {k} + 1),"
        f" i -> cast(conv(substring(md5(substring(_s, i, {k})), 1, 8), 16, 10)"
        " as bigint))"
    )
    sel = F.expr(
        f"transform(sequence(1, size(_h) - {w} + 1),"
        f" i -> aggregate(sequence(i, i + {w} - 1),"
        " named_struct('h', cast(4294967296 as bigint), 'p', -1),"
        " (acc, j) -> if(element_at(_h, j) <= acc.h,"
        " named_struct('h', element_at(_h, j), 'p', j), acc)))"
    )
    return (
        base.select(F.col(id_col), grams.alias("_h"))
        .select(F.col(id_col), F.array_distinct(sel).alias("_fp"))
        .select(
            F.col(id_col),
            F.size("_fp").alias("n_fingerprints"),
            F.expr("aggregate(_fp, cast(0 as bigint), (acc, x) -> acc + x.h)").alias(
                "fp_checksum"
            ),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility per language: pieces-per-word under the
    BPE-ish regex tokenizer — the standard multilingual-tokenizer
    efficiency report (a language whose fertility is 2x English's pays
    2x the context window for the same content; data cards publish this
    per-language table when choosing vocab size / allocation).

    ``fertility_permille = floor(1000 * total_pieces / total_words)``
    — exact integer contract (no float ratio to drift).  One codegen'd
    projection + ONE partial-agg groupBy on the language key (bounded
    cardinality); nothing else shuffles at any corpus size.

    Returns ``(lang, n_docs, n_pieces, n_words, fertility_permille)``.
    """
    pieces = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
    )
    words = F.size(tokens_col(F.col(text_col)))
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        pieces.alias("_p"),
        words.alias("_w"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_p").alias("n_pieces"),
        F.sum("_w").alias("n_words"),
        F.expr("(1000 * sum(_p)) DIV greatest(sum(_w), 1)").alias(
            "fertility_permille"
        ),
    )
