"""Training-data pipeline operators: chunking, deterministic sampling,
PII redaction (SURVEY.md §7 training-data extensions).

Like functions/text.py these are pure built-in-function transforms —
JVM-side, whole-stage-codegen'd, no Python in the row path — each designed
so an ANSI-SQL oracle reproduces it exactly:

- chunk_documents: fixed-size token windows with overlap (explode over a
  ``sequence`` of chunk starts; one narrow pass, no shuffle);
- stratified_sample: per-stratum deterministic hash sampling — the md5 of
  the id mapped to a 0..999 bucket compared against a per-stratum rate.
  Pure filter: no shuffle, no RNG state, reproducible across engines,
  runs, and partitionings (the property that matters when a 100 TB corpus
  is resampled incrementally);
- pii_redact: regex redaction of emails/phone numbers with match counts.

At 100 TB all three are embarrassingly parallel single-pass projections;
chunking's output explosion (~n_tokens/stride rows per doc) is the only
data-volume change, and it fans out within partitions without shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col

# shared with the SQL oracles (RE2/Java-regex-compatible subset)
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "555-[0-9]{4}"


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Split each document into ``chunk_size``-token windows every
    ``stride`` tokens (``chunk_size - stride`` tokens of overlap) — the
    standard pre-tokenization shaping for LLM training corpora.

    Chunk starts are ``0, stride, 2·stride, …`` while ``start < n_tokens``
    (an empty doc yields one empty chunk), generated with ``sequence`` +
    ``explode`` so the fan-out happens inside the scan stage."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    # materialize tokens ONCE, then derive starts from the materialized
    # column — referencing tokens_col in both the projection and the
    # explode puts the regex split in two operators Spark cannot merge
    # (the _doc_shingles 6x lesson, functions/dedup.py)
    with_toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        with_toks.select(F.col(id_col), F.col("_toks"), F.explode(starts).alias("start"))
        .select(
            F.col(id_col),
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("start") + 1, F.lit(chunk_size)), " "
            ).alias("chunk_text"),
            F.greatest(
                F.least(F.lit(chunk_size), F.size("_toks") - F.col("start")),
                F.lit(0),
            ).alias("chunk_tokens"),
        )
    )


def _hash_bucket(id_col: str) -> F.Column:
    """Deterministic 0..999 bucket: first 8 md5 hex digits of the id as an
    integer, mod 1000. Identical in Spark (conv(…,16,10)) and DuckDB
    (CAST('0x'||… AS UBIGINT)); no RNG, no seed plumbing."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a per-stratum fraction of rows: bucket(id) < rate‰ for the
    row's stratum. Down-weighting over-represented strata (e.g. English)
    this way is a single codegen'd filter — at 100 TB there is no shuffle,
    no sort, and re-running over a grown corpus keeps every previously
    sampled row (hash stability), which makes downstream caches valid."""
    rate = F.lit(default_permille)
    for k, v in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return (
        df.withColumn("bucket", _hash_bucket(id_col))
        .filter(F.col("bucket") < rate)
        .select(F.col(id_col), F.col(strata_col), "bucket")
    )


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_expr: F.Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Data mixing: draw documents per source until that source's TOKEN
    budget is reached — the step that turns raw corpora into a training
    mixture with chosen proportions.

    Deterministic greedy draw: docs are ordered by md5(id) within each
    source (a uniform shuffle without RNG state) and taken while the
    running token total BEFORE the doc is under the budget — so the draw
    is stable under reruns and the first doc of a source is always
    admitted even if it alone exceeds the budget (no empty mixtures).

    One window pass per source partition — a single shuffle on the source
    key; no iteration, no driver state. At 100 TB the per-source running
    sums are the same windowed cumsum Spark executes for sessionization."""
    toks = tokens_expr if tokens_expr is not None else F.size(tokens_col(F.col(text_col)))
    budget = F.lit(default_budget)
    for k, v in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == k, F.lit(v)).otherwise(budget)
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("n_tokens", toks)
        .withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(F.col(id_col), F.col(source_col), "n_tokens", "cum_tokens")
    )


def pack_sequences(
    chunks: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    order_col: str = "chunk_id",
    tokens_col_name: str = "chunk_tokens",
) -> DataFrame:
    """Sequence packing: assign consecutive chunks of a document to
    fixed-capacity training sequences — pack p of doc d holds the chunks
    whose running token total lands in [p·seq_len, (p+1)·seq_len).

    Per-document first-fit in chunk order (the standard packing used when
    document continuity matters more than absolute bin utilization):
    a windowed cumsum inside the doc partition, then an integer divide.
    One shuffle on the doc key, no iteration; packs never mix documents,
    so the assignment is embarrassingly parallel across docs."""
    w = Window.partitionBy(id_col).orderBy(F.col(order_col).asc())
    cum = F.sum(tokens_col_name).over(w.rowsBetween(Window.unboundedPreceding, 0))
    before = cum - F.col(tokens_col_name)
    return chunks.select(
        F.col(id_col),
        F.col(order_col),
        F.col(tokens_col_name),
        F.floor(before / seq_len).cast("long").alias("pack_id"),
        (before - F.floor(before / seq_len) * seq_len).cast("long").alias("pack_offset"),
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact email addresses and phone numbers, reporting match counts and
    the redacted text's md5 (count + content check in one row per doc).

    Matching and replacement are single-pass codegen'd regexes — the shape
    of any rule-based scrubber at scale. The testdata corpus carries no
    real PII, so a deterministic synthetic tail (``doc_id % 3`` emails and
    one 555-phone derived from the id) is appended before redaction; both
    engines construct the identical input, making the whole
    match-count/replacement path oracle-checkable rather than trivially
    zero."""
    idc = F.col(id_col)
    email = F.concat(F.lit(" user"), idc.cast("string"), F.lit("@example.com"))
    synth = F.concat(
        F.col(text_col),
        F.repeat(email, (idc % 3).cast("int")),
        F.lit(" call 555-"),
        F.lpad((idc % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(synth, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        idc,
        F.size(F.regexp_extract_all(synth, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(synth, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).alias("redacted_len"),
    )
