"""functions/containment.py + functions/corpus.py: asymmetric containment
join (prefix filter), cross-source overlap matrix, quality top-p selection."""

import pytest

from debezium_server_iceberg_spark.functions.containment import containment_pairs
from debezium_server_iceberg_spark.functions.corpus import quality_top_p, source_overlap


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


# ---------------------------------------------------------------- containment


def test_containment_detects_subset_pairs_directed(spark):
    # A's 4 shingles all appear in B; B has 7 shingles, only 4 in A —
    # the pair must appear as (A contained-in B), never the reverse.
    df = _docs(
        spark,
        [
            (1, "a b c d e", "en", "web"),
            (2, "a b c d e x y z", "en", "web"),
            (3, "p q r s t", "en", "web"),
        ],
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(df, shingle_size=2).collect()
    }
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r.inter_size == 4 and r.size_a == 4 and r.containment == 1.0
    assert (2, 1) not in out  # 4/7 < 0.8: asymmetric by design
    assert all(3 not in pair for pair in out)  # disjoint doc never pairs


def test_containment_threshold_boundary_inclusive(spark):
    # D has 5 shingles, exactly 4 shared with B -> 4/5 == tau, must pass;
    # E shares only 2/5 -> excluded.
    df = _docs(
        spark,
        [
            (2, "a b c d e x y z", "en", "web"),
            (4, "a b c d e f", "en", "web"),
            (5, "a b c q r s", "en", "web"),
        ],
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs(df, shingle_size=2).collect()
    }
    assert (4, 2) in pairs
    assert all(p[0] != 5 for p in pairs)


def test_containment_rejects_bad_tau(spark):
    df = _docs(spark, [(1, "a b c", "en", "web")])
    with pytest.raises(ValueError):
        containment_pairs(df, tau_num=0, tau_den=5)
    with pytest.raises(ValueError):
        containment_pairs(df, tau_num=6, tau_den=5)


# -------------------------------------------------------------- source overlap


def test_source_overlap_counts_and_ratios(spark):
    # unigram grams: X = {a,b,c,d}, Y = {c,d,e,f} -> inter 2, jaccard 2/6
    df = _docs(
        spark,
        [
            (1, "a b", "en", "X"),
            (2, "c d", "en", "X"),
            (3, "c d", "en", "Y"),
            (4, "e f", "en", "Y"),
        ],
    )
    rows = source_overlap(df, shingle_size=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("X", "Y")  # unordered, a < b
    assert r.inter_size == 2 and r.size_a == 4 and r.size_b == 4
    assert r.jaccard == pytest.approx(2 / 6)
    assert r.containment_a == pytest.approx(0.5)
    assert r.containment_b == pytest.approx(0.5)


def test_source_overlap_disjoint_sources_absent(spark):
    df = _docs(
        spark,
        [(1, "a b c", "en", "X"), (2, "x y z", "en", "Y")],
    )
    assert source_overlap(df, shingle_size=1).count() == 0


def test_source_overlap_shingles_distinct_within_source(spark):
    # the same gram repeated inside one source counts once
    df = _docs(
        spark,
        [(1, "a a a", "en", "X"), (2, "a", "en", "Y")],
    )
    r = source_overlap(df, shingle_size=1).collect()[0]
    assert r.inter_size == 1 and r.size_a == 1 and r.size_b == 1
    assert r.jaccard == 1.0


def test_source_overlap_sketch_small_sources_exact(spark):
    """Sources smaller than k keep their ENTIRE (thresholded) hash set, so
    with a generous k the sampled jaccard is the true jaccard and the
    below-theta counting machinery is checked against closed-form sets."""
    df = _docs(
        spark,
        [
            (1, "a b", "en", "X"),
            (2, "c d", "en", "X"),
            (3, "c d", "en", "Y"),
            (4, "e f", "en", "Y"),
        ],
    )
    rows = source_overlap(df, shingle_size=1, sketch_k=64).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("X", "Y")
    assert r.is_estimate is True
    assert r.size_a == 4 and r.size_b == 4  # sizes stay exact
    # full sketches of full sets: sampled jaccard == true jaccard
    assert r.jaccard == pytest.approx(2 / 6)
    # the theta estimator is an estimate, but clamping keeps it in-lattice
    assert 0 <= r.inter_size <= 4


def test_source_overlap_sketch_error_bound(spark):
    """KMV with k=256 over ~1k-gram sources: the sampled jaccard must land
    within the canonical ~1/sqrt(k) band of the exact value on every pair
    (deterministic — the sketch is a pure function of the corpus)."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(3000)]
    rows = []
    doc_id = 0
    picks = {
        "A": rng.sample(vocab, 1200),
        "B": rng.sample(vocab, 1200),
        "C": rng.sample(vocab, 800),
    }
    for src, words in picks.items():
        for lo in range(0, len(words), 100):
            doc_id += 1
            rows.append((doc_id, " ".join(words[lo : lo + 100]), "en", src))
    df = _docs(spark, rows)
    exact = {
        (r.source_a, r.source_b): r.jaccard
        for r in source_overlap(df, shingle_size=1).collect()
    }
    est = {
        (r.source_a, r.source_b): r.jaccard
        for r in source_overlap(df, shingle_size=1, sketch_k=256).collect()
    }
    assert set(est) == set(exact)
    for pair, j in exact.items():
        assert abs(est[pair] - j) <= 3.0 / (256 ** 0.5) + 0.01, (pair, j, est[pair])


# -------------------------------------------------------------- quality top-p


def _reference_top_p(df, p_num, p_den):
    """Pure-python reimplementation over the collected score distribution."""
    from debezium_server_iceberg_spark.functions.text import quality_score

    scored = {
        r.doc_id: int(round(r.quality * 10000))
        for r in quality_score(df).collect()
    }
    docs = [(r.doc_id, r.lang, scored[r.doc_id]) for r in df.collect()]
    keep = set()
    for lang in {d[1] for d in docs}:
        groups = {}
        for did, lg, m in docs:
            if lg == lang:
                groups.setdefault(m, []).append(did)
        total = sum(m * len(ids) for m, ids in groups.items())
        before = 0
        for m in sorted(groups, reverse=True):
            if p_den * before < p_num * total:
                keep.update((did, lang, m) for did in groups[m])
            before += m * len(groups[m])
    return keep


def test_quality_top_p_matches_reference_and_keeps_groups_whole(spark):
    # three quality tiers per lang via distinct-token ratio differences
    rows = []
    i = 0
    for lang in ("en", "de"):
        for text, n in [
            ("alpha beta gamma delta epsilon", 4),  # all distinct: high
            ("alpha alpha beta gamma delta", 3),    # one repeat: mid
            ("alpha alpha alpha alpha beta", 2),    # mostly repeats: low
        ]:
            for _ in range(n):
                rows.append((i, text, lang, "web"))
                i += 1
    df = _docs(spark, rows)
    got = {(r.doc_id, r.lang, r.milli) for r in quality_top_p(df).collect()}
    assert got == _reference_top_p(df, 4, 5)
    # group-whole invariant: selection never splits a (lang, milli) group
    selected_groups = {(lg, m) for _, lg, m in got}
    all_docs = _reference_top_p(df, 5, 5)  # p=1 keeps everything
    for did, lg, m in all_docs:
        assert ((did, lg, m) in got) == ((lg, m) in selected_groups)


def test_quality_top_p_p_equals_one_keeps_all(spark):
    df = _docs(spark, [(1, "a b c", "en", "w"), (2, "a a a", "en", "w")])
    assert quality_top_p(df, p_num=1, p_den=1).count() == 2


def test_quality_top_p_rejects_bad_p(spark):
    df = _docs(spark, [(1, "a b", "en", "w")])
    with pytest.raises(ValueError):
        quality_top_p(df, p_num=0, p_den=5)
    with pytest.raises(ValueError):
        quality_top_p(df, p_num=7, p_den=5)


def test_containment_stop_shingle_cap(spark):
    # "boil plate" appears in every doc; doc 6 consists of ONLY that
    # shingle, so uncapped it is "contained" in everything — pure
    # boilerplate signal. The cap removes it from the universe: doc 6
    # has no shingles left and emits nothing, while real subset pairs
    # (1 in 2) survive on their filtered sets.
    df = _docs(
        spark,
        [
            (1, "boil plate u1 u2 u3", "en", "web"),
            (2, "boil plate u1 u2 u3 x y", "en", "web"),
            (3, "boil plate a b c", "en", "web"),
            (4, "boil plate d e f", "en", "web"),
            (6, "boil plate", "en", "web"),
        ],
    )
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs(df, shingle_size=2).collect()
    }
    assert any(p[0] == 6 for p in uncapped)  # boilerplate-only false positive
    capped = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(
            df, shingle_size=2, max_shingle_freq=4
        ).collect()
    }
    assert all(p[0] != 6 and p[1] != 6 for p in capped)
    r = capped[(1, 2)]  # real subset survives, sizes exclude the stop shingle
    assert r.size_a == 3 and r.inter_size == 3 and r.containment == 1.0


def test_containment_cap_validation(spark):
    df = _docs(spark, [(1, "a b", "en", "w")])
    with pytest.raises(ValueError):
        containment_pairs(df, max_shingle_freq=0)


def test_collocation_lift_hand_computed(spark):
    """Tiny corpus with a known collocation: 'new york' always adjacent,
    'the' everywhere — lift of the exclusive pair dominates, and the
    integer contract matches the hand computation."""
    from debezium_server_iceberg_spark.functions.corpus import (
        collocation_top_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat near new york") for i in range(5)],
        "doc_id long, text string",
    )
    rows = collocation_top_pairs(docs, top_n=10, min_count=5).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    # every pair occurs exactly 5 times (once per doc); T = 45 tokens
    # lift(new, york) = 1e6 * 5 * 45 / (5 * 5) = 9_000_000
    assert by_pair[("new", "york")]["lift_scaled"] == 9_000_000
    # lift(the, cat) = 1e6 * 5 * 45 / (10 * 5) = 4_500_000  ('the' x10)
    assert by_pair[("the", "cat")]["lift_scaled"] == 4_500_000
    # exclusive pair ranks strictly above the stopword-anchored one
    assert by_pair[("new", "york")]["rank"] < by_pair[("the", "cat")]["rank"]
    # support floor: nothing below min_count survives
    assert all(r["pair_count"] >= 5 for r in rows)


def test_collocation_support_floor_excludes_rare_pairs(spark):
    from debezium_server_iceberg_spark.functions.corpus import (
        collocation_top_pairs,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta gamma delta gamma delta "
                               "gamma delta gamma delta")],
        "doc_id long, text string",
    )
    rows = collocation_top_pairs(docs, top_n=10, min_count=5).collect()
    pairs = {(r["w1"], r["w2"]) for r in rows}
    assert ("alpha", "beta") not in pairs  # count 1 < 5
    assert ("gamma", "delta") in pairs     # count 5


def test_tokenizer_fertility_hand_computed(spark):
    from debezium_server_iceberg_spark.functions.text import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [(0, "don't stop", "en"), (1, "abc def", "xx")],
        "doc_id long, text string, lang string",
    )
    rows = {r["lang"]: r for r in tokenizer_fertility(docs).collect()}
    # "don't stop" -> pieces [don, ', t, stop] = 4, words [don, t, stop] = 3
    assert rows["en"]["n_pieces"] == 4 and rows["en"]["n_words"] == 3
    assert rows["en"]["fertility_permille"] == 1333  # floor(4000/3)
    assert rows["xx"]["fertility_permille"] == 1000  # 2 pieces / 2 words
