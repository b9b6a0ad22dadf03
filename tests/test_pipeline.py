"""functions/pipeline.py: chunking, stratified sampling, PII redaction."""

import pytest

from debezium_server_iceberg_spark.functions.pipeline import (
    chunk_documents,
    pii_redact,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_chunking_boundaries(spark):
    # 10 tokens, chunk 4 / stride 3 -> starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text, "en")]), chunk_size=4, stride=3
    ).collect()
    by_id = {r.chunk_id: r for r in sorted(out, key=lambda r: r.chunk_id)}
    assert list(by_id) == [0, 1, 2, 3]
    assert by_id[0].chunk_text == "t0 t1 t2 t3"
    assert by_id[1].chunk_text == "t3 t4 t5 t6"
    assert by_id[3].chunk_text == "t9"          # tail shorter than chunk_size
    assert by_id[3].chunk_tokens == 1
    assert all(r.chunk_tokens == 4 for r in out[:3] if r.chunk_id < 3)


def test_chunking_empty_doc(spark):
    out = chunk_documents(_docs(spark, [(7, "", "en")])).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0
    assert out[0].chunk_text == ""
    assert out[0].chunk_tokens == 0


def test_chunking_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a", "en")]), stride=0)


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "x", "en" if i % 2 else "de") for i in range(2000)]
    df = _docs(spark, rows)
    out1 = stratified_sample(df, {"en": 100}, 900).collect()
    out2 = stratified_sample(df, {"en": 100}, 900).collect()
    assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
    en = [r for r in out1 if r.lang == "en"]
    de = [r for r in out1 if r.lang == "de"]
    # md5 buckets are ~uniform: 10% of 1000 en docs, 90% of 1000 de docs
    assert 50 < len(en) < 150
    assert 850 < len(de) < 950
    assert all(r.bucket < 100 for r in en)
    assert all(r.bucket < 900 for r in de)


def test_stratified_sample_is_prefix_stable(spark):
    # growing the corpus never drops a previously sampled row
    small = stratified_sample(
        _docs(spark, [(i, "x", "en") for i in range(500)]), {}, 300
    ).collect()
    big = stratified_sample(
        _docs(spark, [(i, "x", "en") for i in range(1000)]), {}, 300
    ).collect()
    assert {r.doc_id for r in small} <= {r.doc_id for r in big}


def test_pii_redact_counts_and_content(spark):
    out = {
        r.doc_id: r
        for r in pii_redact(
            _docs(
                spark,
                [
                    (0, "reach me at bob@corp.io", "en"),   # 1 real + 0 synth
                    (1, "no pii here", "en"),               # 1 synth email
                    (2, "two a@b.co c@d.org", "en"),        # 2 real + 2 synth
                ],
            )
        ).collect()
    }
    assert out[0].n_emails == 1 and out[1].n_emails == 1 and out[2].n_emails == 4
    assert all(r.n_phones == 1 for r in out.values())
    # the redacted text must contain no residual matches
    assert out[2].redacted_len > 0


def test_chunking_reconstructs_every_doc(spark):
    """Coverage property: chunk0 plus the non-overlap tail of each later
    chunk reconstructs the exact token sequence, for many doc lengths
    around the boundary cases (one Spark job for all)."""
    chunk_size, stride = 5, 3
    lengths = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 14, 15, 16, 31]
    rows = [
        (n, " ".join(f"w{n}x{i}" for i in range(n)), "en") for n in lengths
    ]
    out = chunk_documents(
        _docs(spark, rows), chunk_size=chunk_size, stride=stride
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(lengths)
    for n in lengths:
        chunks = sorted(by_doc[n], key=lambda r: r.chunk_id)
        # chunk ids are dense 0..len-1
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        rebuilt = []
        for c in chunks:
            toks = c.chunk_text.split() if c.chunk_text else []
            assert len(toks) == c.chunk_tokens
            start = c.chunk_id * stride
            overlap = len(rebuilt) - start
            rebuilt.extend(toks[overlap:])
        assert rebuilt == [f"w{n}x{i}" for i in range(n)], f"n={n}"


def test_mixture_sample_budget_semantics(spark):
    from debezium_server_iceberg_spark.functions.pipeline import mixture_sample
    from pyspark.sql import functions as F

    rows = [
        (i, "w " * 10, "a") for i in range(50)       # 10 tokens each
    ] + [
        (100, "w " * 500, "b"),                      # single huge doc
        (101, "w " * 10, "b"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("text", F.rtrim("text"))
    out = mixture_sample(df, budgets={"a": 95}, default_budget=50).collect()
    a = sorted(r.cum_tokens for r in out if r.source == "a")
    # docs admitted while running total BEFORE them < 95: 10,20,...,100
    assert a == [10 * i for i in range(1, 11)]
    b = sorted((r for r in out if r.source == "b"), key=lambda r: r.cum_tokens)
    # md5 order puts the 10-token doc first (cum-before 0 < 50), and the
    # 500-token doc still lands because cum-before is 10 < 50 — the draw
    # that CROSSES the budget is included (start-before-budget rule)
    assert [(r.n_tokens, r.cum_tokens) for r in b] == [(10, 10), (500, 510)]


def test_pack_sequences_fills_and_splits(spark):
    from debezium_server_iceberg_spark.functions.pipeline import pack_sequences

    rows = [
        (1, 0, 30), (1, 1, 30), (1, 2, 30),  # cum-before: 0, 30, 60
        (2, 0, 100),                         # oversized chunk -> pack 0
        (2, 1, 10),                          # before=100 -> pack 1
    ]
    out = {
        (r.doc_id, r.chunk_id): (r.pack_id, r.pack_offset)
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, chunk_id long, chunk_tokens long"),
            seq_len=64,
        ).collect()
    }
    assert out == {
        (1, 0): (0, 0), (1, 1): (0, 30), (1, 2): (0, 60),
        (2, 0): (0, 0), (2, 1): (1, 36),
    }


def test_decontaminate_flags_planted_leak(spark):
    from debezium_server_iceberg_spark.functions.text import decontaminate

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta extra words"),
            (11, "completely unrelated text with enough tokens to form grams here"),
            (12, "short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(train, bench, n=8).collect()}
    # doc 10 shares exactly one 8-gram (tokens 1-8 of the benchmark doc)
    assert got == {10: 1}


def test_repetition_metrics_hand_computed(spark):
    from debezium_server_iceberg_spark.functions.text import repetition_metrics

    # doc 1: "a b a b a b" -> 2-grams: [a b, b a, a b, b a, a b]
    #   max count = 3 ("a b"), total 5 -> top2_frac = 0.6
    #   5-grams: [a b a b a, b a b a b] both unique -> dup5_frac = 0.0
    # doc 2: "x x x x x x" -> 2-grams: 5x "x x" -> top2_frac = 1.0
    #   5-grams: "x x x x x" twice -> dup5_frac = 1.0
    # doc 3: all-distinct tokens -> top2_frac = 1/6 (every gram count 1,
    #   max run 1), dup5_frac = 0.0
    # doc 4: too short for any gram -> both 0.0, keep = true
    rows = [
        (1, "a b a b a b"),
        (2, "x x x x x x"),
        (3, "q w e r t y u"),
        (4, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.top2_frac, r.dup5_frac, r.keep)
        for r in repetition_metrics(
            df, max_top_frac=0.5, max_dup_frac=0.5
        ).collect()
    }
    assert out[1] == (6, 0.6, 0.0, False)
    assert out[2] == (6, 1.0, 1.0, False)
    assert out[3] == (7, round(1 / 6, 4), 0.0, True)
    assert out[4] == (1, 0.0, 0.0, True)


def test_repetition_metrics_matches_naive_groupby(spark):
    """The in-row sorted-run implementation must equal the naive
    explode + per-(doc, gram) groupBy definition on arbitrary word-soup."""
    import random

    from pyspark.sql import functions as F

    from debezium_server_iceberg_spark.functions.text import (
        repetition_metrics,
        tokens_col,
    )

    rng = random.Random(7)
    vocab = ["ab", "cd", "ef", "gh"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.top2_frac, r.dup5_frac)
        for r in repetition_metrics(df).collect()
    }

    def naive(n, agg_fn):
        toks = df.select("doc_id", tokens_col(F.col("text")).alias("tk")).filter(
            F.size("tk") >= n
        )
        grams = toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - n),
                    lambda i: F.concat_ws(" ", F.slice("tk", i + 1, n)),
                )
            ).alias("gram"),
        )
        counts = grams.groupBy("doc_id", "gram").count()
        return {
            r.doc_id: r.frac
            for r in counts.groupBy("doc_id")
            .agg(F.round(agg_fn, 4).alias("frac"))
            .collect()
        }

    top_naive = naive(
        2, F.max("count").cast("double") / F.sum("count").cast("double")
    )
    dup_naive = naive(
        5,
        F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).cast("double")
        / F.sum("count").cast("double"),
    )
    for doc_id, (top, dup) in got.items():
        assert top == top_naive.get(doc_id, 0.0), doc_id
        assert dup == dup_naive.get(doc_id, 0.0), doc_id


def test_decontaminate_bloom_equals_exact(spark):
    """The bloom prefilter must change the PLAN, never the result: on the
    same planted-leak corpus the bloom variant returns exactly the exact
    operator's rows (false positives die in the verifying join)."""
    from debezium_server_iceberg_spark.functions.text import (
        decontaminate, decontaminate_bloom,
    )

    bench = spark.createDataFrame(
        [(i, f"tok{i} " + " ".join(f"w{i}_{j}" for j in range(12)))
         for i in range(20)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(100 + i, f"tok{i} " + " ".join(f"w{i}_{j}" for j in range(12)))
         for i in range(0, 20, 3)]
        + [(999, "clean document with its own distinct vocabulary entirely "
                 "free of benchmark grams in every window")],
        "doc_id long, text string",
    )
    exact = {(r["doc_id"], r["n_hits"])
             for r in decontaminate(train, bench, n=8).collect()}
    bloom = {(r["doc_id"], r["n_hits"])
             for r in decontaminate_bloom(train, bench, n=8).collect()}
    assert bloom == exact and exact  # non-vacuous


def test_exact_substring_profile_hand_computed(spark):
    """Two docs sharing a verbatim 8-token run, one clean doc, one with a
    partial (7-token) overlap that must NOT count."""
    from debezium_server_iceberg_spark.functions.dedup import (
        exact_substring_profile,
    )

    shared = "one two three four five six seven eight"           # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),       # grams: 3 windows, 1 shared
            (2, "head0 " + shared),             # grams: 2 windows, 1 shared
            (3, "totally different words here that never repeat anything"),
            # 7-token prefix of the shared run + a divergent 8th token:
            # no full 8-token window matches
            (4, "one two three four five six seven DIFFERENT x y"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_shared"], r["keep"])
           for r in exact_substring_profile(docs, k=8).collect()}
    assert got[1] == (3, 1, False)   # 1/3 > 0.3 -> dropped
    assert got[2] == (2, 1, False)
    assert got[3][1] == 0 and got[3][2] is True
    assert got[4][1] == 0 and got[4][2] is True
    # a low shared fraction keeps (integer predicate, not float)
    docs2 = spark.createDataFrame(
        [(1, shared + " " + " ".join(f"a{j}" for j in range(15))),
         (2, shared + " " + " ".join(f"b{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r for r in exact_substring_profile(docs2, k=8).collect()}
    # 23 tokens -> 16 windows each; only the leading window is shared
    assert prof[1]["n_grams"] == 16 and prof[1]["n_shared"] == 1
    assert prof[1]["keep"] is True  # 1/16 <= 0.3
