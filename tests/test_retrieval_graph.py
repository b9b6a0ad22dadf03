"""Behavior tests for the retrieval (BM25), link-graph (PageRank),
graded-decontamination, and filtered-ANN operators."""

import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.graph import derived_link_graph, pagerank
from debezium_server_iceberg_spark.functions.retrieval import bm25_topk
from debezium_server_iceberg_spark.functions.similarity import cosine_topk
from debezium_server_iceberg_spark.functions.text import contamination_fraction

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25


def test_bm25_hand_computed_scores(spark):
    """Tiny corpus with scores derivable by hand from the integer
    contract: s = floor(SCALE*(2N-2df+1)*22*tf*T / ((2df+1)*(10*T*tf
    + 3*T + 9*dl*N))).  N=3 docs, T=6 tokens, query = ["a"], df(a)=2:
    d1 (tf=2, dl=3) -> 723287; d0 (tf=1, dl=2) -> 600000; d2 absent."""
    docs = _docs(spark, [(0, "a b"), (1, "a a b"), (2, "c")])
    queries = spark.createDataFrame(
        [(100, ["a"])], "query_id long, terms array<string>"
    )
    out = bm25_topk(docs, queries, k=5).collect()
    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in out}
    assert got == {(100, 1): (1, 723287), (100, 2): (0, 600000)}


def test_bm25_large_term_set_semijoin_fallback_matches_inline(spark, monkeypatch):
    # above _TERM_INSET_MAX the queried-term filter switches from an
    # inlined InSet literal to a broadcast semi-join; results must be
    # identical
    from debezium_server_iceberg_spark.functions import retrieval

    docs = _docs(spark, [(0, "a b"), (1, "a a b"), (2, "c d e")])
    queries = spark.createDataFrame(
        [(100, ["a", "b"]), (101, ["c", "e", "zzz"])],
        "query_id long, terms array<string>",
    )
    inline = sorted(
        tuple(r) for r in bm25_topk(docs, queries, k=5).collect()
    )
    monkeypatch.setattr(retrieval, "_TERM_INSET_MAX", 2)
    fallback = sorted(
        tuple(r) for r in bm25_topk(docs, queries, k=5).collect()
    )
    assert fallback == inline


def test_bm25_rare_term_outweighs_common(spark):
    """A doc matching only the rare query term must outrank a doc
    matching only the ubiquitous one (idfR monotone in df)."""
    docs = _docs(
        spark,
        [(0, "common rare"), (1, "common common"), (2, "common x"), (3, "common y")],
    )
    queries = spark.createDataFrame(
        [(0, ["rare"]), (1, ["common"])], "query_id long, terms array<string>"
    )
    out = bm25_topk(docs, queries, k=1)
    top = {r["query_id"]: r["doc_id"] for r in out.collect()}
    assert top[0] == 0  # only doc containing "rare"
    rare_score = [r["score"] for r in out.collect() if r["query_id"] == 0][0]
    common_score = [r["score"] for r in out.collect() if r["query_id"] == 1][0]
    assert rare_score > common_score


def test_bm25_duplicate_query_terms_collapse(spark):
    docs = _docs(spark, [(0, "a b"), (1, "b c")])
    q1 = spark.createDataFrame([(0, ["a", "a"])], "query_id long, terms array<string>")
    q2 = spark.createDataFrame([(0, ["a"])], "query_id long, terms array<string>")
    assert (
        bm25_topk(docs, q1, k=2).collect() == bm25_topk(docs, q2, k=2).collect()
    )


# ------------------------------------------------------------ PageRank


def test_pagerank_mass_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pr = pagerank(docs, iterations=4)
    rows = pr.collect()
    n = len(rows)
    assert n == docs.count()
    scale, teleport = 10**12, (10**12 * 3) // 20
    total = sum(r["pr_scaled"] for r in rows)
    # floors only ever LEAK mass; teleport is every node's floor
    assert n * teleport <= total <= n * scale
    assert min(r["pr_scaled"] for r in rows) >= teleport
    again = {r["doc_id"]: r["pr_scaled"] for r in pagerank(docs, 4).collect()}
    assert again == {r["doc_id"]: r["pr_scaled"] for r in rows}


def test_pagerank_in_degree_drives_rank(spark):
    """Nodes with more in-edges in the derived graph must (on average)
    out-rank nodes with fewer — the point of link centrality."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges, _ = derived_link_graph(docs)
    indeg = {r["dst"]: r["c"] for r in edges.groupBy("dst").agg(F.count(F.lit(1)).alias("c")).collect()}
    pr = {r["doc_id"]: r["pr_scaled"] for r in pagerank(docs, 4).collect()}
    zero_in = [pr[d] for d in pr if d not in indeg]
    hub = [pr[d] for d, c in indeg.items() if c >= 6]
    assert hub and zero_in
    assert min(hub) > max(zero_in)


def test_pagerank_scale_guard(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    try:
        pagerank(docs, 1, scale=1 << 62)
    except ValueError as e:
        assert "overflows int64" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected overflow guard to fire")


# ---------------------------------------------- graded decontamination


def test_contamination_fraction_thresholds(spark):
    bench = _docs(spark, [(0, "t1 t2 t3 t4 t5 t6 t7 t8")])
    train = _docs(
        spark,
        [
            # exact copy: 1 gram, 1 hit -> 100%, flagged
            (1, "t1 t2 t3 t4 t5 t6 t7 t8"),
            # leading 8-gram + 4 fresh tokens: 5 grams, 1 hit = exactly
            # 20% -> flagged at the inclusive boundary
            (2, "t1 t2 t3 t4 t5 t6 t7 t8 x1 x2 x3 x4"),
            # 6 grams, 1 hit < 20% -> scored but NOT flagged
            (3, "t1 t2 t3 t4 t5 t6 t7 t8 x1 x2 x3 x4 x5"),
            # no overlap at all -> present with zero hits
            (4, "y1 y2 y3 y4 y5 y6 y7 y8 y9"),
            # too short for any 8-gram -> absent
            (5, "z1 z2"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["flagged"])
        for r in contamination_fraction(train, bench).collect()
    }
    assert out == {
        1: (1, 1, True),
        2: (5, 1, True),
        3: (6, 1, False),
        4: (2, 0, False),
    }


# ------------------------------------------------------- filtered ANN


def test_filtered_ann_candidates_respect_predicate(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_topk(
        emb, query_ids=list(range(10)), k=5, candidate_filter=F.col("label") % 3 == 1
    )
    rows = out.collect()
    assert len(rows) == 50  # k filled from survivors for every query
    allowed = {
        r["vec_id"] for r in emb.filter(F.col("label") % 3 == 1).select("vec_id").collect()
    }
    assert all(r["neighbor_id"] in allowed for r in rows)
    # filter-then-search: results differ from the unfiltered search
    plain = cosine_topk(emb, query_ids=list(range(10)), k=5).collect()
    assert rows != plain


def test_rrf_fuse_integer_contract_and_union_semantics(spark):
    """Known two-system fusion: doc in both lists sums both floors; doc
    in one list keeps one term; ties rank by ascending id."""
    from debezium_server_iceberg_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 200), (1, 3, 300)],
        "query_id long, rank int, doc_id long",
    )
    dense = spark.createDataFrame(
        [(1, 1, 200), (1, 2, 400)],
        "query_id long, rank int, doc_id long",
    )
    out = {r["doc_id"]: (r["rank"], r["rrf_score"])
           for r in rrf_fuse([lex, dense], k=10).collect()}
    s = lambda r: 1_000_000 // (60 + r)
    assert out[200] == (1, s(2) + s(1))   # both systems
    assert out[100] == (2, s(1))          # lexical only
    assert out[400] == (3, s(2))          # dense only; ties none
    assert out[300] == (4, s(3))


def test_bm25_exclude_self_drops_query_doc(spark):
    from debezium_server_iceberg_spark.functions.retrieval import bm25_topk
    from debezium_server_iceberg_spark.functions.text import tokens_col
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qdf = (
        docs.filter(F.col("doc_id") % 101 == 7)
        .select(
            F.col("doc_id").alias("query_id"),
            F.slice(tokens_col(F.col("text")), 1, 8).alias("terms"),
        )
        .filter(F.size("terms") >= 1)
    )
    with_self = bm25_topk(docs, qdf, k=5).collect()
    no_self = bm25_topk(docs, qdf, k=5, exclude_self=True).collect()
    assert any(r["query_id"] == r["doc_id"] for r in with_self)
    assert all(r["query_id"] != r["doc_id"] for r in no_self)


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge = exactly 2 triangles; corner credits check
    out (shared-edge nodes sit in both)."""
    from debezium_server_iceberg_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame(
        # 1-2,1-3,1-4,2-3,3-4  (missing 2-4): triangles {1,2,3}, {1,3,4}
        [(1, 2), (3, 1), (1, 4), (2, 3), (4, 3), (2, 1)],  # dup + reversed ok
        "src long, dst long",
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {1: 2, 2: 1, 3: 2, 4: 1}


def test_triangle_counts_ignores_loops_and_triangle_free(spark):
    from debezium_server_iceberg_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    assert triangle_counts(edges).collect() == []


def test_derived_link_graph_rejects_sparse_ids(spark):
    """ADVICE r10: sparse ids would silently vanish PageRank mass (hash
    targets land on nonexistent nodes); the precondition is now
    enforced in the same planning-scale job that fetches N."""
    from debezium_server_iceberg_spark.functions.graph import (
        derived_link_graph,
    )

    sparse = spark.createDataFrame(
        [(0,), (1,), (5,)], "doc_id long"
    )
    with pytest.raises(ValueError, match=r"dense in \[0, N\)"):
        derived_link_graph(sparse)
    shifted = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    with pytest.raises(ValueError, match=r"dense in \[0, N\)"):
        derived_link_graph(shifted)
