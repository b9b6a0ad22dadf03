"""BPE tokenizer training: the byte-pair-merge inner loop at corpus
scale (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units" — the algorithm behind GPT-2/LLaMA-family
tokenizers).

Reference parity: tokenizer training is outside
memiiso/debezium-server-iceberg's CDC scope; it belongs to the §2.8
training-data surface this engine adds (``functions/text.py`` already
APPLIES a BPE-ish tokenizer — ``token_count_bpe``; this module TRAINS
merge rules from the corpus).

Why this shape scales: classic BPE trainers operate on the word-type
frequency table, not the raw corpus — the corpus is touched exactly
once (tokenize + one groupBy building ``word -> count``), and every
merge iteration runs over the VOCABULARY relation (distinct word types
x their symbol positions), which is bounded by language statistics
(~1e7-1e8 types at web scale) regardless of corpus bytes.  Each
iteration costs: one pair-count aggregate (shuffle keyed by symbol
pair, partial-agg combinable), one 1-row argmax collect (planning
scale — same class as the k-means centroid fetch), and one windowed
merge pass whose window partitions are single words (max |word| rows —
no skew possible).  The symbol table is ``localCheckpoint``ed per
iteration so plan depth stays constant across merges (the iterative
pattern shared with ``functions/graph.pagerank``).

GREEDY MERGE SEMANTICS, exactly and engine-portably: applying merge
(A, B) to a word scans left to right; an occurrence at position i
merges iff it is not consumed by a previous merge.  Overlaps only occur
when A == B (runs like "aaa" -> "aa" + "a"): candidate positions are
consecutive, and greedy keeps the 1st, 3rd, 5th ... of each consecutive
run.  That parity rule is computed with integer window functions
(running candidate count -> run group id -> row number within run), so
ANY engine with standard window semantics reproduces byte-identical
merges — no string ``replace`` tricks (a fixpoint of non-overlapping
string replacement diverges from greedy on odd runs: "aaaaa" would pair
positions 0-1 and 3-4 instead of 0-1 and 2-3), and no per-row UDF.  All
arithmetic is integer; ties in pair selection break by (count DESC,
left ASC, right ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import tokens_col


def _word_symbols(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> word-type frequency table -> one row per (word, char
    position).  The ONLY corpus-sized pass; everything after is
    vocabulary-bounded."""
    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    return words.select(
        "w", "cnt", F.posexplode(chars).alias("pos", "sym")
    )


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """One greedy merge pass over the symbol table (see module
    docstring for the parity rule).  Window partitions are single
    words; the chain of windows shares the (w, pos) sort."""
    w_ord = Window.partitionBy("w").orderBy("pos")
    cand = (F.col("sym") == a) & (F.col("nxt") == b)
    stage = (
        syms.withColumn("nxt", F.lead("sym").over(w_ord))
        .withColumn("c", cand)
        # running candidate count: consecutive candidates (only possible
        # when a == b) keep pos - crn constant -> run group id
        .withColumn("crn", F.sum(F.col("c").cast("int")).over(w_ord))
        .withColumn("grp", F.when(F.col("c"), F.col("pos") - F.col("crn")))
        .withColumn(
            "rn2",
            F.row_number().over(Window.partitionBy("w", "grp").orderBy("pos")),
        )
        .withColumn("chosen", F.col("c") & (F.col("rn2") % 2 == 1))
        .withColumn(
            "dropped",
            F.coalesce(F.lag("chosen").over(w_ord), F.lit(False)),
        )
    )
    return (
        stage.filter(~F.col("dropped"))
        .select(
            "w",
            "cnt",
            (F.row_number().over(w_ord) - 1).alias("pos"),
            F.when(F.col("chosen"), F.lit(a + b)).otherwise(F.col("sym")).alias("sym"),
        )
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    w_ord = Window.partitionBy("w").orderBy("pos")
    return (
        syms.withColumn("nxt", F.lead("sym").over(w_ord))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("cnt").alias("tot"))
    )


def _bpe_train_driver(
    spark: SparkSession, words_pdf, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """Driver-side merge loop over a COLLECTED word-type frequency table
    (the adaptive small path — same two-path pattern as
    ``incremental.ClusterIndex``).  Byte-identical to the distributed
    loop: the argmax tie-break (count DESC, left ASC, right ASC) compares
    ASCII-only tokens (``tokens_col`` lowercases and splits on
    ``[^a-z0-9]+``), where Python string order == Spark's UTF8 binary
    order, and the left-to-right greedy scan IS the window-parity rule
    (keep the 1st, 3rd, ... candidate of each run).  O(types × avg_len)
    per merge — planning-scale for a vocabulary-bounded table."""
    import pandas as pd

    wlist = words_pdf["w"].tolist()
    cnts = [int(c) for c in words_pdf["cnt"].tolist()]
    symtab = [list(w) for w in wlist]
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(symtab, cnts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), tot = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, int(tot)))
        ab = a + b
        for k, syms in enumerate(symtab):
            i, n, out = 0, len(syms), []
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            if len(out) != n:
                symtab[k] = out
    merges_df = spark.createDataFrame(
        merges, schema="step int, left_sym string, right_sym string, pair_count bigint"
    )
    sym_pdf = pd.DataFrame(
        {
            "w": [w for w, syms in zip(wlist, symtab) for _ in syms],
            "cnt": [c for c, syms in zip(cnts, symtab) for _ in syms],
            "pos": [i for syms in symtab for i in range(len(syms))],
            "sym": [s for syms in symtab for s in syms],
        }
    )
    symbols_df = spark.createDataFrame(
        sym_pdf, schema="w string, cnt bigint, pos int, sym string"
    )
    return merges_df, symbols_df


def bpe_train(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    driver_vocab_threshold: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns ``(merges, symbols)``:

    - ``merges``: ``(step, left_sym, right_sym, pair_count)`` — the rule
      learned at each step (1-based) and the weighted adjacent-pair
      count that won the argmax, under (count DESC, left, right)
      tie-breaking;
    - ``symbols``: the post-training symbol table
      ``(w, cnt, pos, sym)`` — every word type decomposed into its
      subword symbols after all merges apply (feed it a frequency
      aggregate for the learned vocabulary).

    Each argmax is a 1-row collect (planning scale); the symbol table is
    checkpointed per iteration so the iterative plan stays bounded.

    ADAPTIVE: the merge loop runs over the word-TYPE frequency table,
    which is vocabulary-bounded regardless of corpus bytes — when it has
    at most ``driver_vocab_threshold`` types (one count over the cached
    aggregate), the whole loop runs driver-side on ONE Arrow fetch
    (``_bpe_train_driver``): n_merges × 3 Spark jobs collapse to 2.
    Web-scale vocabularies (1e7-1e8 types) exceed the threshold and take
    the distributed loop below, unchanged."""
    spark: SparkSession = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    try:
        if words.count() <= driver_vocab_threshold:
            return _bpe_train_driver(spark, words.toPandas(), n_merges)
        chars = F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        )
        syms = words.select(
            "w", "cnt", F.posexplode(chars).alias("pos", "sym")
        ).localCheckpoint(eager=True)
    finally:
        words.unpersist()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("tot").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, tot = top[0]["a"], top[0]["b"], int(top[0]["tot"])
        merges.append((step, a, b, tot))
        syms = _apply_merge(syms, a, b).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(
        merges, schema="step int, left_sym string, right_sym string, pair_count bigint"
    )
    return merges_df, syms


def bpe_encode(
    docs: DataFrame,
    symbols: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus under a trained BPE model — the inference
    side of ``bpe_train`` (what every training-data pipeline runs to
    budget tokens: "how many sequences is this corpus under OUR
    tokenizer?", not under whitespace splitting).

    ``symbols`` is a post-training symbol table (from ``bpe_train``);
    it is reduced to one ``(word, n_subtokens)`` row per word TYPE, so
    the expensive merge application is paid once per vocabulary entry
    — never once per corpus occurrence.  The corpus pass is then a
    token explode joined to that vocabulary relation (AQE broadcasts a
    small vocabulary; web-scale vocabularies of 1e7-1e8 types go SMJ —
    not pinned, both are correct) and one per-doc partial aggregation.

    Returns ``(id_col, n_words, n_subtokens, n_chars)`` per document —
    ``n_subtokens / n_words`` is tokenizer fertility, ``n_chars /
    n_subtokens`` the compression ratio pipelines report per language.
    Docs with zero tokens are absent (nothing to encode).
    """
    word_len = symbols.groupBy("w").agg(
        F.count(F.lit(1)).alias("_nsub"),
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("w")
    )
    return (
        toks.join(word_len, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_nsub").alias("n_subtokens"),
            F.sum(F.length("w")).alias("n_chars"),
        )
    )


def bpe_vocab(symbols: DataFrame, top_n: int = 30) -> DataFrame:
    """Weighted symbol frequencies of a post-training symbol table:
    ``(rank, sym, total)`` for the ``top_n`` most frequent subword
    symbols (count DESC, sym ASC ties) — the learned-vocabulary head.
    One partial-agg shuffle + a bounded global sort."""
    counts = symbols.groupBy("sym").agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.col("total").desc(), F.col("sym").asc())
    # two-phase exact top-n: per-partition pre-prune caps the single-task
    # global sort at (#partitions * top_n) rows
    pre = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("total").desc(), F.col("sym").asc()
    )
    return (
        counts.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= top_n)
        .drop("_pr")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("rank", "sym", "total")
    )
