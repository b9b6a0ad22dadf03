"""Bitext margin mining (functions/bitext.py) and winnowing
fingerprints (functions/text.py) vs pure-Python references."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.bitext import bitext_margin_pairs
from debezium_server_iceberg_spark.functions.text import winnowing_fingerprints


# --------------------------------------------------------------- bitext

def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], s) for i, v, s in rows],
        "vec_id long, embedding array<float>, lang int",
    )


def test_planted_parallel_pair_is_mined_with_top_margin(spark):
    """One src vector nearly equal to one tgt vector inside a noise
    cloud must be mined, and with the largest margin of the output."""
    rng = np.random.RandomState(7)
    rows = []
    for i in range(20):
        rows.append((i, rng.randn(16), 0))
    for i in range(100, 120):
        rows.append((i, rng.randn(16), 1))
    planted = rng.randn(16)
    rows.append((50, planted, 0))
    rows.append((150, planted + 0.01 * rng.randn(16), 1))
    out = bitext_margin_pairs(_emb_df(spark, rows), k=4, threshold=1.0).collect()
    mined = {(r["src_id"], r["tgt_id"]): r for r in out}
    assert (50, 150) in mined
    assert mined[(50, 150)]["cosine"] > 0.99
    assert mined[(50, 150)]["margin"] == max(r["margin"] for r in out)


def test_forward_selection_one_row_per_source_and_sides_disjoint(spark):
    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(8), 0) for i in range(15)] + [
        (100 + i, rng.randn(8), 1) for i in range(15)
    ]
    out = bitext_margin_pairs(_emb_df(spark, rows), k=3, threshold=0.0).collect()
    srcs = [r["src_id"] for r in out]
    assert len(srcs) == len(set(srcs))  # argmax per source
    assert all(r["src_id"] < 100 <= r["tgt_id"] for r in out)


def test_empty_side_yields_no_pairs(spark):
    rows = [(i, np.ones(4) * (i + 1), 0) for i in range(5)]
    assert bitext_margin_pairs(_emb_df(spark, rows), k=2).collect() == []


# ------------------------------------------------------------ winnowing

def _py_winnow(text, k=5, w=4):
    """Reference implementation straight from the SIGMOD'03 paper."""
    s = "".join(c for c in text.lower() if c.isalnum() and c.isascii())
    if len(s) < k + w - 1:
        return None
    hs = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(s) - k + 1)
    ]
    picks = set()
    for i in range(len(hs) - w + 1):
        win = hs[i : i + w]
        m = min(win)
        # rightmost occurrence of the min
        p = i + max(j for j, h in enumerate(win) if h == m)
        picks.add((hs[p], p + 1))  # 1-based like the Spark side
    return len(picks), sum(h for h, _ in picks)


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",  # all-equal hashes exercise the tie rule
        "abcabcabcabcabc",  # periodic text: repeated selections dedupe
    ],
)
def test_winnowing_matches_python_reference(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = winnowing_fingerprints(df).collect()[0]
    n, chk = _py_winnow(text)
    assert (row["n_fingerprints"], row["fp_checksum"]) == (n, chk)


def test_winnowing_local_guarantee(spark):
    """Two docs sharing a >= k+w-1 char substring share a fingerprint
    hash (checked via the reference's pick sets)."""
    shared = "xylophonequartz"
    a, b = "aaa " + shared + " bbb", "ccc ddd " + shared
    for t in (a, b):
        got = winnowing_fingerprints(
            spark.createDataFrame([(1, t)], "doc_id long, text string")
        ).collect()[0]
        assert (got["n_fingerprints"], got["fp_checksum"]) == _py_winnow(t)

    def picks(t, k=5, w=4):
        s = "".join(c for c in t.lower() if c.isalnum())
        hs = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(s) - k + 1)
        ]
        out = set()
        for i in range(len(hs) - w + 1):
            win = hs[i : i + w]
            m = min(win)
            out.add(m)
        return out

    assert picks(a) & picks(b)


def test_winnowing_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "ab c d"), (2, "this one is long enough")],
        "doc_id long, text string",
    )
    rows = winnowing_fingerprints(df).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_exact_duplicate_corpus_margin_knife_edge_is_deterministic(spark):
    """A corpus of exact-duplicate vectors puts every top pair's TRUE
    margin exactly at the 1.0 threshold — the sf1-replication shape.
    With the threshold and argmax on the ROUNDED margin, accumulation
    noise cannot push a 1.0-margin pair over the line: the output must
    be EMPTY and stable across runs (an unrounded boundary returned 0
    or 20 rows depending on ~1e-15 sum order)."""
    rng = np.random.RandomState(11)
    base = [rng.randn(8) for _ in range(5)]
    rows = []
    vid = 0
    for copy in range(4):  # 4 exact copies of each vector on EACH side
        for b in base:
            rows.append((vid, b, 0)); vid += 1
            rows.append((vid, b, 1)); vid += 1
    df = _emb_df(spark, rows)
    for _ in range(2):
        got = bitext_margin_pairs(df, lang_col="lang", k=4, threshold=1.0)
        assert got.count() == 0
    # and a genuinely-above-threshold pair still mines in the same corpus
    planted_s = 10_000
    planted_t = 10_001
    v = rng.randn(8)
    df2 = _emb_df(
        spark, rows + [(planted_s, v, 0), (planted_t, v * 1.0 + 1e-6, 1)]
    )
    mined = {
        (r.src_id, r.tgt_id)
        for r in bitext_margin_pairs(
            df2, lang_col="lang", k=4, threshold=1.0
        ).collect()
    }
    assert (planted_s, planted_t) in mined
