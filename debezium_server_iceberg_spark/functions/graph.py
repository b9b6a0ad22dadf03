"""Link-graph analytics: iterative PageRank over a document link graph.

Web-corpus curation uses link centrality as a document-quality prior
(the original PageRank use case; centrality features appear in Common
Crawl-derived corpus pipelines), complementing the content-based
quality scores in ``functions/curation.py``.  The iterative-join shape
is the same family as ``kmeans_lloyd_step`` (fixed small iteration
count, one shuffle per iteration) and the pointer-doubling connected
components in ``functions/dedup.py``.

Reference parity: graph analytics is outside
memiiso/debezium-server-iceberg's scope (it is a CDC lander); this is
part of the §2.8 training-data surface the engine adds on top.

INTEGER FIXED-POINT CONTRACT (same rationale as DSIR / BM25: no float
sums whose order differs between engines): every rank is an int64 in
units of ``1/scale``.  Each node starts at ``scale``; one iteration
distributes ``floor(rank * 17 / (20 * outdeg))`` along each out-edge
(damping 0.85 = 17/20) and every node restarts with the constant
teleport ``floor(scale * 3 / 20)``.  All nodes have the same fixed
out-degree by construction of the derived graph, so there is no
dangling-mass term; the floor-truncation leak is deterministic and
identical in any engine that floors.  Everything stays in int64: the
hard bound on any node's rank is the total mass ``N * scale``, so the
constructor asserts ``N * scale * 17 < 2^63`` — at the default
scale=1e12 that admits ~5e5 nodes; a 100-TB corpus (N ~ 1e11) runs
with ``scale=1e7`` (mass 1e18), trading rank resolution for the same
overflow-free arithmetic.  The adaptive scale is the honest design:
rank is a probability times ``N * scale``, so resolution in units of
the total mass is constant regardless of N.

Scale shape: the edge relation is corpus-sized and reused every
iteration — it is materialized once (``localCheckpoint``) instead of
re-derived K times, the Spark analog of caching the adjacency list.
Every rank/edge join is pinned to shuffle-merge (``hint("merge")``)
because both sides are corpus-sized: Catalyst's size estimate for the
rank relation collapses after a few self-joins, and a static broadcast
of a corpus-sized relation is exactly the estimate-lies OOM class the
containment and SimHash fixes guard against.  One shuffle per
iteration (the groupBy on dst); the left join back to the node list
reuses the same key.  K is a fixed small constant — plan depth stays
bounded and there is no driver-side loop over data, only over
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000_000_000  # 1e12: default rank unit (fits N up to ~5e5)


def derived_link_graph(
    docs: DataFrame, out_degree: int = 3, id_col: str = "doc_id"
) -> tuple[DataFrame, int]:
    """Deterministic md5-derived link graph over a dense-id corpus:
    node ``i`` links to ``first8hex(md5(concat(i, ':', j))) % N`` for
    ``j in 0..out_degree-1`` (self-links and parallel edges permitted —
    they carry mass like any edge).  Requires ids dense in ``[0, N)``
    so every hash target is an existing node; returns ``(edges, n)``
    where edges has columns (src, dst).

    The md5-prefix integer contract is the repo-wide one
    (``functions/pipeline._hash_bucket`` family): first 8 md5 hex
    digits as an integer, here taken modulo N."""
    # one planning-scale job validates the dense-[0, N) precondition
    # alongside fetching N: with sparse ids, hash targets land on
    # nonexistent nodes and their rank mass would silently vanish in
    # the left join back to the node list — fail loudly instead
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
    ).collect()[0]
    n = stats["n"]
    if n and (stats["lo"] != 0 or stats["hi"] != n - 1):
        raise ValueError(
            f"derived_link_graph requires {id_col} dense in [0, N): got "
            f"min={stats['lo']}, max={stats['hi']} for N={n}"
        )
    targets = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col(id_col), F.lit(j))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % n
            )
            for j in range(out_degree)
        ]
    )
    edges = docs.select(
        F.col(id_col).alias("src"), F.explode(targets).alias("dst")
    )
    return edges, n


def pagerank(
    docs: DataFrame,
    iterations: int = 4,
    out_degree: int = 3,
    id_col: str = "doc_id",
    scale: int = _SCALE,
) -> DataFrame:
    """Fixed-point PageRank over the derived link graph (see module
    docstring for the integer contract).  Returns every node's rank
    after ``iterations`` rounds: ``(doc_id, pr_scaled)`` with
    ``pr_scaled`` in units of ``1/scale``.
    """
    nodes = docs.select(F.col(id_col).alias("node"))
    edges, n = derived_link_graph(docs, out_degree, id_col)
    if n * scale * 17 >= 1 << 63:
        raise ValueError(
            f"n*scale*17 = {n * scale * 17} overflows int64; lower `scale` "
            f"(total graph mass n*scale must stay under 2^63/17)"
        )
    # materialize once: reused every iteration (adjacency-cache analog);
    # also keeps the iterative plan from re-deriving the hash explode K times
    edges = edges.localCheckpoint(eager=True)

    teleport = (scale * 3) // 20  # floor(0.15 * scale), exact
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for _ in range(iterations):
        incoming = (
            edges.hint("merge")
            .join(ranks.hint("merge"), edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(r * 17) DIV {20 * out_degree}").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.hint("merge")
            .join(incoming.hint("merge"), "node", "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select(
        F.col("node").alias(id_col), F.col("r").alias("pr_scaled")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the UNDIRECTED
    simple graph induced by a directed edge relation — the classic
    link-spam / community-density feature (a page whose neighborhood
    is a clique is a link farm; triangle density also drives cluster
    coefficients in corpus link analysis).

    Algorithm: canonicalize to (lo < hi) edges, dedupe, drop loops;
    enumerate wedges by joining (a, b) with (b, c) on the middle node
    (a < b < c by construction, so each triangle is generated exactly
    once); close the wedge against the edge set; credit all three
    corners.  Every join is between corpus-sized relations built from
    EXPLODED scans — Catalyst's size estimate lies by the fanout
    factor there (the SimHash/containment OOM class), so both sides of
    every join pin ``hint("merge")``.  Three narrow shuffles total
    (wedge join, closure join, corner aggregate); no broadcast of
    anything unbounded; the wedge relation is the only super-linear
    intermediate — sum of deg^2, the exact pre-materialization bound
    every distributed triangle counter carries (node-degree salting
    splits hub wedges if a real graph needs it; the derived graph's
    degrees are ~2x out_degree).

    Returns ``(node, n_triangles)`` for nodes in at least one
    triangle."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    wedges = (
        und.select(F.col("a"), F.col("b").alias("m"))
        .hint("merge")
        .join(
            und.select(F.col("a").alias("m"), F.col("b").alias("c")).hint("merge"),
            "m",
        )
    )
    tri = wedges.hint("merge").join(
        und.select(F.col("a"), F.col("b").alias("c")).hint("merge"),
        ["a", "c"],
    )
    # corner credit via ONE in-row explode — a union of three selects
    # would make tri a three-consumer relation and Catalyst re-runs the
    # whole join cascade per branch (the multi-consumer recomputation
    # class the bitext kNN checkpoint guards against; here a single
    # consumer avoids even the checkpoint)
    corners = tri.select(F.explode(F.array("a", "m", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
