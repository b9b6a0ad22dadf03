"""functions/curation.py: segment dedup, Gopher rules, temperature mixing,
length histogram, Lloyd k-means step."""

import pytest

from debezium_server_iceberg_spark.functions.curation import (
    gopher_rules,
    kmeans_lloyd_step,
    length_histogram,
    segment_dedup,
    temperature_mixture,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _d(i, text, source="web"):
    return (i, text, "en", source, len(text))


def test_segment_dedup_keeps_first_occurrence(spark):
    boiler = " ".join(f"b{i}" for i in range(4))
    uniq1 = " ".join(f"u{i}" for i in range(4))
    uniq2 = " ".join(f"v{i}" for i in range(4))
    # doc 1: boiler + uniq1 ; doc 2: boiler + uniq2 — doc 2 loses the boiler
    df = _docs(spark, [_d(1, f"{boiler} {uniq1}"), _d(2, f"{boiler} {uniq2}")])
    out = {r.doc_id: r for r in segment_dedup(df, seg_tokens=4).collect()}
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[1].deduped_text == f"{boiler} {uniq1}"
    assert out[2].n_segments == 2 and out[2].n_kept == 1
    assert out[2].deduped_text == uniq2


def test_segment_dedup_fully_duplicated_doc_survives_empty(spark):
    text = " ".join(f"w{i}" for i in range(8))
    df = _docs(spark, [_d(1, text), _d(2, text)])
    out = {r.doc_id: r for r in segment_dedup(df, seg_tokens=4).collect()}
    assert out[2].n_kept == 0
    assert out[2].deduped_text == ""


def test_segment_dedup_within_doc_repeat(spark):
    seg = " ".join(f"r{i}" for i in range(4))
    df = _docs(spark, [_d(1, f"{seg} {seg}")])
    out = segment_dedup(df, seg_tokens=4).collect()[0]
    assert out.n_segments == 2 and out.n_kept == 1
    assert out.deduped_text == seg


def test_segment_dedup_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        segment_dedup(_docs(spark, [_d(1, "a")]), seg_tokens=0)


def test_gopher_rules_bounds(spark):
    good = "the cat sat of the mat and it is a fine mat indeed today"
    short = "too short"
    weird = "zzzzzzzzzzzzzzzzzzzzzz " * 20  # mean token len 22, no stopwords
    df = _docs(spark, [_d(1, good), _d(2, short), _d(3, weird.strip())])
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].passes is True
    assert out[2].passes is False          # n_tokens < 10
    assert out[3].passes is False          # mean_token_len > 10, no stopwords
    assert out[1].stopword_hits >= 2
    assert out[2].n_tokens == 2


def test_temperature_mixture_small_source_keeps_everything(spark):
    rows = [_d(i, "x" * 100, "big") for i in range(500)]
    rows += [_d(1000 + i, "x" * 100, "small") for i in range(5)]
    out = temperature_mixture(_docs(spark, rows)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # min_w == small's weight -> bucket^2*w_small < 10^6*w_small for every
    # bucket <= 999 -> the smallest source is kept in full
    assert len(by_src["small"]) == 5
    # big keeps ~sqrt(5/500)=10% -> bucket < 100
    frac = len(by_src.get("big", [])) / 500
    assert 0.04 < frac < 0.2


def test_temperature_mixture_deterministic(spark):
    rows = [_d(i, "y" * (10 + i % 50), ["a", "b", "c"][i % 3]) for i in range(300)]
    df = _docs(spark, rows)
    a = sorted(r.doc_id for r in temperature_mixture(df).collect())
    b = sorted(r.doc_id for r in temperature_mixture(df).collect())
    assert a == b


def test_length_histogram_integer_binning(spark):
    # values 0..79 with bins=8 -> exact deciles of width 10
    rows = [_d(i, "t" * i) for i in range(80)]
    out = {r.bucket: r for r in length_histogram(_docs(spark, rows), bins=8).collect()}
    assert sorted(out) == list(range(8))
    for b, r in out.items():
        assert r.n_docs == 10
        assert r.min_value == b * 10 and r.max_value == b * 10 + 9


def test_length_histogram_constant_column_single_bucket(spark):
    rows = [_d(i, "tttt") for i in range(10)]
    out = length_histogram(_docs(spark, rows), bins=8).collect()
    assert len(out) == 1 and out[0].bucket == 0 and out[0].n_docs == 10


def test_kmeans_step_separable_clusters(spark):
    # two tight blobs; k=2 seeds = vec_ids 0 (blob A) and 1 (blob B)
    rows = [(0, [0.0, 0.0], 0), (1, [10.0, 10.0], 1)]
    rows += [(i, [0.0 + i * 1e-3, 0.0], 0) for i in range(2, 12)]
    rows += [(i, [10.0, 10.0 + i * 1e-3], 1) for i in range(12, 22)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.cluster_id: r for r in kmeans_lloyd_step(df, k=2).collect()}
    assert out[0].n_members == 11
    assert out[1].n_members == 11
    assert out[0].avg_dist2 < 1.0 and out[1].avg_dist2 < 1.0
    assert abs(out[0].centroid_c1 - 0.006) < 0.01
    assert abs(out[1].centroid_c1 - 10.0) < 0.01


def test_kmeans_step_tie_breaks_to_lower_centroid(spark):
    # a point equidistant from both seeds joins the lower cluster_id
    rows = [(0, [0.0, 0.0], 0), (1, [2.0, 0.0], 0), (2, [1.0, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.cluster_id: r for r in kmeans_lloyd_step(df, k=2).collect()}
    assert out[0].n_members == 2  # seeds 0 and the tied point 2
    assert out[1].n_members == 1


def test_global_rank_matches_window(spark):
    from debezium_server_iceberg_spark.functions.curation import global_rank
    from pyspark.sql import Window, functions as F

    rows = [(i, "x", "en", "web", (i * 7) % 5 + 10) for i in range(200)]
    df = _docs(spark, rows).select("doc_id", "n_chars")
    got = {
        r.doc_id: r.rank for r in global_rank(df, "n_chars").collect()
    }
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    want = {
        r.doc_id: r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_ascending_and_dense(spark):
    from debezium_server_iceberg_spark.functions.curation import global_rank

    rows = [(i, "x", "en", "web", v) for i, v in enumerate([5, 3, 5, 1])]
    df = _docs(spark, rows).select("doc_id", "n_chars")
    got = sorted(
        (r.rank, r.doc_id) for r in global_rank(df, "n_chars", descending=False).collect()
    )
    # value 1 -> rank 1 (doc 3); value 3 -> rank 2 (doc 1); ties on 5 by id
    assert got == [(1, 3), (2, 1), (3, 0), (4, 2)]


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from debezium_server_iceberg_spark.functions.curation import (
        unigram_logprob_score,
    )

    common = " ".join(["the"] * 20)
    rare = "zyzzyva qwertyuiop"
    df = _docs(spark, [_d(1, common), _d(2, common), _d(3, rare)])
    out = {r.doc_id: r for r in unigram_logprob_score(df).collect()}
    assert out[3].mean_neg_log2_prob > out[1].mean_neg_log2_prob
    assert out[1].mean_neg_log2_prob == out[2].mean_neg_log2_prob
    assert out[3].n_tokens == 2


def test_dsir_target_like_docs_score_higher(spark):
    """A raw doc written in the target domain's vocabulary must out-score
    a raw doc from a disjoint vocabulary; weight_per_gram ~ scale means
    'distributed like the target'."""
    from debezium_server_iceberg_spark.functions.curation import dsir_weights

    legal = "the party of the first part hereby agrees to the terms set forth"
    web = "click here to win a free prize now subscribe like and share today"
    target = _docs(spark, [_d(100, legal), _d(101, legal + " in witness whereof")])
    raw = _docs(spark, [_d(1, legal), _d(2, web)])
    out = {r.doc_id: r for r in dsir_weights(raw, target, n=2).collect()}
    assert out[1].weight_per_gram > out[2].weight_per_gram
    assert out[1].n_grams == len(legal.split()) - 1
    # in-domain grams sit near scale; off-domain ones collapse toward 0
    assert out[1].weight_per_gram > 100_000
    assert out[2].weight_per_gram < out[1].weight_per_gram / 2


def test_dsir_short_docs_absent_and_deterministic(spark):
    from debezium_server_iceberg_spark.functions.curation import dsir_weights

    target = _docs(spark, [_d(9, "alpha beta gamma")])
    raw = _docs(spark, [_d(1, "alpha beta"), _d(2, "solo")])
    out1 = {(r.doc_id, r.weight) for r in dsir_weights(raw, target).collect()}
    out2 = {(r.doc_id, r.weight) for r in dsir_weights(raw, target).collect()}
    assert out1 == out2
    assert {d for d, _ in out1} == {1}  # the 1-token doc has no bigrams


def test_bigram_logprob_hand_computed(spark):
    """Tiny closed-form corpus: docs 'a b', 'a b', 'a c'.
    Bigrams: (a b) x2, (a c) x1; ctx(a) = 3; V = 3.
    p(b|a) = (2+1)/(3+3) = 1/2 -> nll 1.0
    p(c|a) = (1+1)/(3+3) = 1/3 -> nll log2(3) ~ 1.585."""
    from debezium_server_iceberg_spark.functions.curation import (
        bigram_logprob_score,
    )

    df = _docs(spark, [_d(1, "a b"), _d(2, "a b"), _d(3, "a c")])
    out = {r.doc_id: r for r in bigram_logprob_score(df).collect()}
    assert out[1].n_bigrams == 1
    assert out[1].mean_neg_log2_prob == pytest.approx(1.0, abs=1e-4)
    assert out[2].mean_neg_log2_prob == out[1].mean_neg_log2_prob
    assert out[3].mean_neg_log2_prob == pytest.approx(1.585, abs=1e-3)


def test_bigram_logprob_flags_alien_word_order(spark):
    """Same vocabulary, scrambled order: the bigram scorer separates
    them while a unigram model cannot."""
    from debezium_server_iceberg_spark.functions.curation import (
        bigram_logprob_score,
    )

    fluent = "the cat sat on the mat"
    background = [_d(i, fluent) for i in range(10)]
    scrambled = _d(99, "mat the on sat cat the")
    out = {
        r.doc_id: r
        for r in bigram_logprob_score(
            _docs(spark, background + [scrambled])
        ).collect()
    }
    assert out[99].mean_neg_log2_prob > out[0].mean_neg_log2_prob
    # single-token / empty docs are absent
    out2 = bigram_logprob_score(_docs(spark, [_d(1, "word"), _d(2, "")])).collect()
    assert out2 == []


def test_epoch_plan_hand_computed_oversampling(spark):
    """A: 16 tokens, B: 10000 -> r = (4, 100), den = 104, budget
    T = 5008; alloc_A = floor(5008*4/104) = 192 -> epochs 12."""
    from debezium_server_iceberg_spark.functions.curation import epoch_plan

    rows = [(1, " ".join(["w"] * 16), "A")] + [
        (100 + i, " ".join(["x"] * 100), "B") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in epoch_plan(df).collect()}
    assert out["A"]["tokens_available"] == 16
    assert out["B"]["tokens_available"] == 10000
    assert out["A"]["alloc_tokens"] == (10016 // 2) * 4 // 104  # 192
    assert out["A"]["epochs"] == 12 and out["A"]["oversampled"]
    assert out["B"]["epochs"] == 1 and not out["B"]["oversampled"]
    # allocations never exceed the budget
    assert sum(r["alloc_tokens"] for r in out.values()) <= 10016 // 2


def test_cluster_balanced_sample_budget_and_determinism(spark):
    from debezium_server_iceberg_spark.functions.curation import (
        cluster_balanced_sample,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = cluster_balanced_sample(emb, k=8, per_cluster=10)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster_id"], []).append(r["pick_rank"])
    # every cluster respects the budget and ranks are 1..n contiguous
    for cid, ranks in per.items():
        assert len(ranks) <= 10
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # rerun-stable (md5 order, no RNG)
    again = sorted(map(tuple, cluster_balanced_sample(emb, k=8, per_cluster=10).collect()))
    assert again == sorted(map(tuple, rows))
    # balanced: with budget << cluster sizes, most clusters fill
    full = [cid for cid, ranks in per.items() if len(ranks) == 10]
    assert len(full) >= 4  # most of the 8 clusters fill their budget


def test_quality_rank_ensemble_rank_math(spark):
    from debezium_server_iceberg_spark.functions.curation import (
        quality_rank_ensemble,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = quality_rank_ensemble(docs, top_n=20).collect()
    assert len(out) == 20
    # final ranking is (rank_sum asc, doc_id asc) with contiguous ranks
    ordered = sorted(out, key=lambda r: (r["rank_sum"], r["doc_id"]))
    assert [r["rank"] for r in ordered] == list(range(1, 21))
    for r in out:
        assert r["rank_sum"] == r["len_rank"] + r["diversity_rank"] + r["alpha_rank"]
        assert min(r["len_rank"], r["diversity_rank"], r["alpha_rank"]) >= 1
