"""BPE trainer: greedy-merge semantics vs a pure-Python reference,
determinism, and the vocabulary head."""

import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.bpe import (
    _apply_merge,
    _word_symbols,
    bpe_train,
    bpe_vocab,
)


def _py_merge(symbols, a, b):
    """Reference greedy left-to-right merge of pair (a, b)."""
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _py_train(word_counts, n_merges):
    """Reference BPE trainer over a word->count dict."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + word_counts[w]
        if not pairs:
            break
        (a, b), tot = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, tot))
        vocab = {w: _py_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_apply_merge_matches_greedy_on_odd_runs(spark):
    """The overlap case that breaks string-replace fixpoints: runs of a
    repeated symbol must pair leftmost-first (aaaaa -> aa aa a, never
    aa a aa)."""
    docs = _docs(spark, ["aaaaa aaa aaaa baab aba"])
    syms = _word_symbols(docs, "text")
    merged = _apply_merge(syms, "a", "a")
    got = {
        w: [r["sym"] for r in sorted(rows, key=lambda r: r["pos"])]
        for w, rows in _group(merged.collect()).items()
    }
    for w in got:
        assert got[w] == _py_merge(list(w), "a", "a"), w
    assert got["aaaaa"] == ["aa", "aa", "a"]
    assert got["aaa"] == ["aa", "a"]
    assert got["baab"] == ["b", "aa", "b"]


def _group(rows):
    by_w = {}
    for r in rows:
        by_w.setdefault(r["w"], []).append(r)
    return by_w


def test_train_matches_python_reference(spark):
    texts = [
        "low lower lowest newer new newest wider wide widest",
        "low low lower newer newer newest",
        "the thee then than that this",
    ]
    docs = _docs(spark, texts)
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_vocab = _py_train(wc, 5)

    merges, symbols = bpe_train(docs, n_merges=5)
    got_merges = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in merges.orderBy("step").collect()
    ]
    assert got_merges == ref_merges

    got_vocab = {
        w: [r["sym"] for r in sorted(rows, key=lambda r: r["pos"])]
        for w, rows in _group(symbols.collect()).items()
    }
    assert got_vocab == {w: s for w, s in ref_vocab.items()}


def test_train_deterministic_and_positions_dense(spark):
    docs = _docs(spark, ["banana bandana cabana", "banana banana band"])
    m1, s1 = bpe_train(docs, n_merges=3)
    m2, s2 = bpe_train(docs, n_merges=3)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
    for w, rows in _group(s1.collect()).items():
        poss = sorted(r["pos"] for r in rows)
        assert poss == list(range(len(poss))), w


def test_vocab_head_ranks_by_weighted_count(spark):
    docs = _docs(spark, ["aa aa aa bb cc"])
    _, symbols = bpe_train(docs, n_merges=1)  # merges (a, a) first
    head = bpe_vocab(symbols, top_n=10).collect()
    assert [r["rank"] for r in head] == list(range(1, len(head) + 1))
    assert head[0]["sym"] == "aa" and head[0]["total"] == 3
    totals = [r["total"] for r in head]
    assert totals == sorted(totals, reverse=True)


def test_merge_exhaustion_stops_early(spark):
    # single-char words -> no pairs at all
    docs = _docs(spark, ["a b c d"])
    merges, symbols = bpe_train(docs, n_merges=4)
    assert merges.count() == 0
    assert symbols.count() == 4


def test_encode_counts_words_subtokens_chars(spark):
    docs = _docs(spark, ["aa aa bcd", "aa xyz"])
    _, symbols = bpe_train(docs, n_merges=1)  # merges (a, a): "aa" -> 1 sym
    from debezium_server_iceberg_spark.functions.bpe import bpe_encode

    rows = {r["doc_id"]: r for r in bpe_encode(docs, symbols).collect()}
    # doc 0: aa(1) aa(1) bcd(3 chars, 0 merges apply -> 3 syms)
    assert rows[0]["n_words"] == 3
    assert rows[0]["n_subtokens"] == 1 + 1 + 3
    assert rows[0]["n_chars"] == 2 + 2 + 3
    # doc 1: aa(1) xyz(3)
    assert rows[1]["n_words"] == 2
    assert rows[1]["n_subtokens"] == 4
    assert rows[1]["n_chars"] == 5


def test_encode_zero_merges_is_char_count(spark):
    docs = _docs(spark, ["hello to you"])
    from debezium_server_iceberg_spark.functions.bpe import bpe_encode

    _, symbols = bpe_train(docs, n_merges=0)
    row = bpe_encode(docs, symbols).collect()[0]
    assert row["n_subtokens"] == row["n_chars"] == 10
