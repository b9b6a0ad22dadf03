"""Deduplication operator family for training-data pipelines.

- exact_dedup: content-hash groupBy (one shuffle on the hash)
- minhash_signatures / minhash_near_dup_pairs: MinHash + LSH banding
  (shingle -> md5 minhash -> band -> bucket join) — candidate generation is
  an equi-join on band values, never an O(n^2) cross join, so it scales to
  100 TB (shuffle keyed on band hashes; hot bands are bounded by band width).
- simhash32: 32-bit SimHash from md5 hex-digit parity (each of the 32 hex
  digits contributes one bit), reproducible in ANSI SQL.

All hashing is md5-based so a DuckDB oracle computes identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per identical content; report group size.
    Single hash-shuffle; survivors = one row per distinct content."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"))
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, size: int) -> DataFrame:
    """Distinct ``size``-token shingles per doc (word n-grams joined by a
    space). Far more discriminative than unigrams on small vocabularies —
    keeps LSH candidate sets sparse at scale."""
    # tokens materialized first — see doc_fingerprint for why (6x at sf0.1)
    with_toks = df.select(
        F.col(id_col).alias("doc"), tokens_col(F.col(text_col)).alias("_tk")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_tk") - size, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, size)),
    )
    return (
        with_toks.select("doc", F.explode(F.array_distinct(grams)).alias("tok"))
        .filter(F.col("tok") != "")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(doc, seed, minhash) rows: minhash for seed s = min over shingles of
    the 16-hex-char window of md5(shingle) starting at position 2s+1.

    One md5 per shingle (not per shingle*seed) and all seed minima in a
    single groupBy — the per-seed orderings come from different digest
    offsets, which is as independent as LSH candidate generation needs.
    Long form (doc, seed, minhash) so band construction, agreement, and the
    SQL oracle (``min(substr(md5(tok), 2*seed+1, 16))``) all derive from it
    verbatim.
    """
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_size)
    seed_structs = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"m{s}").alias("minhash"))
            for s in range(num_hashes)
        ]
    )
    return wide.select("doc", F.explode(seed_structs).alias("sm")).select(
        "doc", F.col("sm.seed").alias("seed"), F.col("sm.minhash").alias("minhash")
    )


def _minhash_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_size: int,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """One row per doc: (doc, m0..m{num_hashes-1}) — all seed minima in a
    single partial-aggregating groupBy over one md5 per shingle.
    ``shingles``: optional precomputed (doc, tok) DF (e.g. cached and shared
    with an exact-Jaccard pass)."""
    if num_hashes > 8:
        raise ValueError("num_hashes > 8 would slide windows past the 32-hex digest")
    toks = (
        shingles
        if shingles is not None
        else _doc_shingles(df, text_col, id_col, shingle_size)
    )
    hashed = toks.select("doc", F.md5("tok").alias("h"))
    return hashed.groupBy("doc").agg(
        *[
            F.min(F.substring("h", 2 * s + 1, 16)).alias(f"m{s}")
            for s in range(num_hashes)
        ]
    )


def band_structs_expr(num_hashes: int, band_size: int):
    """LSH band array over the wide signature columns ``m0..m{H-1}``:
    one struct(band, band_val) per band, band_val = '|'-joined sort_array
    of the band's minhashes. THE canonical band formula — shared by the
    one-shot pair generator and the incremental lakehouse index
    (functions/incremental.py); their candidate-generation equivalence
    (asserted in tests/test_incremental.py) depends on both deriving band
    values from this one expression."""
    n_bands = (num_hashes + band_size - 1) // band_size
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.array(
                            *[
                                F.col(f"m{s}")
                                for s in range(
                                    b * band_size, min((b + 1) * band_size, num_hashes)
                                )
                            ]
                        )
                    ),
                ).alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    shingle_size: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via LSH banding.

    bands of ``band_size`` consecutive seeds; candidates share >=1 band;
    agreement = matching signature positions / num_hashes >= threshold.
    Returns (doc_a, doc_b, agreement) with doc_a < doc_b.

    Everything derives from the one-row-per-doc wide signature: bands are
    in-row concats (an explode of num_bands structs, not a seed-level
    shuffle), and agreement is computed by joining the candidate pairs back
    to the wide row once per side — position-wise equality is a row-local
    expression, so no (doc, seed)-grained join ever happens.
    """
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_size, shingles).cache()
    band_structs = band_structs_expr(num_hashes, band_size)
    bands = wide.select("doc", F.explode(band_structs).alias("bv")).select(
        "doc", F.col("bv.band").alias("band"), F.col("bv.band_val").alias("band_val")
    )
    b2 = bands.select(F.col("doc").alias("doc_b"), "band", "band_val")
    cand = (
        bands.join(b2, on=["band", "band_val"])
        .filter(F.col("doc") < F.col("doc_b"))
        .select(F.col("doc").alias("doc_a"), "doc_b")
        .distinct()
    )
    w_a = wide.select(
        F.col("doc").alias("doc_a"), *[F.col(f"m{s}").alias(f"a{s}") for s in range(num_hashes)]
    )
    w_b = wide.select(
        F.col("doc").alias("doc_b"), *[F.col(f"m{s}").alias(f"b{s}") for s in range(num_hashes)]
    )
    matches = sum(
        (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(num_hashes)
    )
    return (
        cand.join(w_a, "doc_a")
        .join(w_b, "doc_b")
        .withColumn("agreement", matches / F.lit(float(num_hashes)))
        .filter(F.col("agreement") >= F.lit(threshold))
        .select("doc_a", "doc_b", "agreement")
    )


def near_dup_clusters(
    pairs: DataFrame,
    max_rounds: int | None = None,
    small_edge_threshold: int = 500_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair list -> one cluster
    id (the minimum member) per doc, plus the canonical flag.

    Adaptive two-path execution, the same runtime size-switch a broadcast
    join makes:

    - **Small graphs** (≤ ``small_edge_threshold`` undirected edges — the
      count is known for free when the edge list is cached): fetch the
      EDGE LIST (never the corpus) to the driver as Arrow-backed numpy
      int arrays (no Row objects) and run union-find there, then rejoin
      labels distributed.  Near-dup graphs are usually a sparse residue of
      the corpus — at sf0.1 the LSH pairs are a few hundred rows, where a
      distributed iteration pays multiple all-but-empty shuffle rounds for
      nothing.  Driver memory is ~16 B/edge for the arrays plus the Python
      parent/label dicts (~100 B/touched node), so 500k edges stays in the
      low hundreds of MB worst-case — the same memory class as a large
      broadcast side; raise the threshold only with driver headroom to
      match.

    - **Large graphs**: min-label propagation WITH pointer doubling (the
      hash-join form of the large-star/small-star CC algorithm, Kiveris et
      al., "Connected Components in MapReduce and Beyond", SoCC'14): each
      round first takes the min over neighbors' labels (small-star), then
      contracts label chains by substituting every label with its label's
      label, twice (pointer doubling / large-star). Propagation distance
      roughly doubles per round, so convergence is O(log diameter)
      shuffles instead of O(diameter) — a 10k-node path converges in ~a
      dozen rounds. The driver only evaluates the single-int "did anything
      change" aggregate per round — no data is collected.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .cache()
    )
    # ONE bounded Arrow fetch decides the path AND delivers the small
    # path's edge list (formerly a count job + a separate toPandas job):
    # at most threshold+1 undirected edges come back (~16 B/edge, the
    # same driver budget as before); an overflowing fetch routes to the
    # distributed rounds, whose first job materializes the cache.
    pdf = (
        edges.filter(F.col("u") < F.col("v"))
        .limit(small_edge_threshold + 1)
        .toPandas()
    )
    if len(pdf) <= small_edge_threshold:
        us, vs = pdf["u"].to_numpy(), pdf["v"].to_numpy()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for u, v in zip(us.tolist(), vs.tolist()):
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min so the root IS the cluster id
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        import numpy as np
        import pandas as pd

        # labels go back Arrow-batched too: a list-of-tuples
        # createDataFrame serializes row-at-a-time on the driver and at
        # ~500k labels THAT becomes the bottleneck (single-core minutes)
        # while every executor idles — measured at sf1, where the
        # pickle path turned a seconds-sized union-find into the
        # slowest stage of the whole bench
        touched = np.unique(np.concatenate([us, vs])) if len(us) else us
        labels_np = np.fromiter(
            (find(int(d)) for d in touched), dtype="int64", count=len(touched)
        )
        spark = pairs.sparkSession
        id_type = edges.schema["u"].dataType.simpleString()
        if len(touched):
            dtype = "int32" if id_type in ("int", "integer") else "int64"
            out = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "doc": touched.astype(dtype),
                        "label": labels_np.astype(dtype),
                    }
                ),
                f"doc {id_type}, label {id_type}",
            )
        else:
            out = spark.createDataFrame([], f"doc {id_type}, label {id_type}")
        edges.unpersist()
        return out.select(
            "doc",
            F.col("label").alias("cluster_id"),
            (F.col("doc") == F.col("label")).alias("is_canonical"),
        )
    # localCheckpoint (not cache) every round: each round's plan references
    # the previous one 4x (two nested _shorten self-joins), so without
    # lineage truncation the analyzed plan grows ~4^rounds and the driver
    # OOMs on plan analysis long before data size matters
    labels = edges.select(F.col("u").alias("doc")).distinct().withColumn(
        "label", F.col("doc")
    ).localCheckpoint(eager=True)

    def _shorten(lab: DataFrame) -> DataFrame:
        """Pointer doubling: label <- label[label] (labels form a forest
        rooted at component minima, so the parent lookup is a self-join)."""
        parent = lab.select(
            F.col("doc").alias("p_doc"), F.col("label").alias("p_label")
        )
        return lab.join(
            parent, lab.label == parent.p_doc, "left"
        ).select(
            *[c for c in lab.columns if c != "label"],  # carries prev through
            F.coalesce(F.col("p_label"), F.col("label")).alias("label"),
        )

    rounds = 0
    while True:
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(f"did not converge within {max_rounds} rounds")
        neighbor_min = (
            edges.join(labels, edges.v == labels.doc)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc == neighbor_min.u, "left")
            .select(
                "doc",
                F.col("label").alias("prev"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # the previous label rides along as a column, so convergence is a
        # plain scan of the checkpointed output — no extra join per round
        new_labels = _shorten(_shorten(new_labels)).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("label") != F.col("prev")).limit(1).count()
        labels = new_labels.drop("prev")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("doc"),
        F.col("label").alias("cluster_id"),
        (F.col("doc") == F.col("label")).alias("is_canonical"),
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash as a '0'/'1' string: 32 bit-votes from md5(token) hex
    parities + 32 from md5('x:' || token). 32 bits is too coarse for corpora
    with heavy shared vocabulary (every same-language pair looks close); 64
    keeps unrelated docs apart while true near-dups stay within a few bits."""
    toks = _doc_tokens(df, text_col, id_col).select(
        "doc", F.md5("tok").alias("h1"), F.md5(F.concat(F.lit("x:"), F.col("tok"))).alias("h2")
    )
    # bit-vote extraction done with integer ops, not 64 substring+isin string
    # scans per token: each md5 splits into 4 conv()'d 8-hex-digit chunks
    # (32-bit longs); hex digit j of a chunk is >= '8' iff bit 4*(7-j)+3 is
    # set. Results are bit-identical to the string form (same md5 parity the
    # DuckDB oracle computes) at ~3x less per-token work.
    chunks = toks.select(
        "doc",
        *[
            F.conv(F.substring(h, 8 * k + 1, 8), 16, 10)
            .cast("long")
            .alias(f"c{j * 4 + k}")
            for j, h in enumerate(("h1", "h2"))
            for k in range(4)
        ],
    )
    votes = [
        F.sum(
            F.shiftright(F.col(f"c{i // 8}"), 4 * (7 - i % 8) + 3).bitwiseAND(1) * 2 - 1
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = chunks.groupBy("doc").agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(64)]
    )
    return agg.select(F.col("doc"), bits.alias("simhash"))


def banded_hamming_pairs(sigi: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs ``(doc_a, doc_b, hamming)`` with Hamming distance at most
    ``max_hamming`` over a 64-bit signature carried as four 16-bit band
    integers (input columns ``doc, sb0..sb3``) — exact for
    ``max_hamming <= 3``: by pigeonhole any pair differing in at most 3
    bits shares at least one untouched band, so the band equi-join loses
    no true pair; the exact popcount (4 ``bit_count(XOR)`` ops) then
    decides.  Candidate generation is an equi-join on (band, band_bits) —
    the same shuffle shape as MinHash LSH, never O(n²).  Shared by the
    text (SimHash) and visual (aHash) near-dup detectors."""
    if max_hamming > 3:
        raise ValueError("banding is exact only for max_hamming <= 3")
    sigi = sigi.cache()
    # BOTH sides of the band self-join are corpus-sized (4 rows per doc) —
    # neither may ever be a static broadcast build side.  Catalyst's size
    # estimate for the signature relation derives from the upstream
    # id-column scan (tiny), not the per-doc fanout, so the static planner
    # would happily broadcast the whole corpus's bands: driver OOM at
    # scale.  The merge hint pins a shuffled sort-merge join — memory-
    # bounded at every scale (same failure class as the containment-join
    # sf1 OOM caught in round 9).
    bands = sigi.select(
        "doc", "sb0", "sb1", "sb2", "sb3",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"sb{b}").alias("bits"))
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", "sb0", "sb1", "sb2", "sb3", F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits")).hint("merge")
    right = bands.select(
        F.col("doc").alias("doc_b"), "band", "bits",
        *[F.col(f"sb{b}").alias(f"tb{b}") for b in range(4)],
    ).hint("merge")
    cand = (
        bands.join(right, on=["band", "bits"])
        .filter(F.col("doc") < F.col("doc_b"))
        .select(
            F.col("doc").alias("doc_a"), "doc_b",
            "sb0", "sb1", "sb2", "sb3", "tb0", "tb1", "tb2", "tb3",
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    diff = sum(
        F.bit_count(F.col(f"sb{b}").bitwiseXOR(F.col(f"tb{b}"))) for b in range(4)
    )
    return (
        cand.withColumn("hamming", diff.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs under 64-bit SimHash Hamming distance — the
    banded join machinery in :func:`banded_hamming_pairs` over the text
    signature."""
    # signature bands as 16-bit INTEGERS, not 16-char substrings: the band
    # self-join shuffles (long, long) keys instead of strings, and the exact
    # Hamming distance collapses to 4 bit_count(XOR) ops instead of 64
    # positional string compares — results bit-identical to the string form
    # (the DuckDB oracle keeps comparing the '0'/'1' signature).
    sig = simhash64(df, text_col, id_col)
    sigi = sig.select(
        "doc",
        *[
            F.conv(F.substring("simhash", 16 * b + 1, 16), 2, 10)
            .cast("long")
            .alias(f"sb{b}")
            for b in range(4)
        ],
    )
    return banded_hamming_pairs(sigi, max_hamming)


def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash: bit i set iff sum over distinct tokens of
    (+1 if hex digit i of md5(token) >= '8' else -1) > 0.

    Returned as a 32-char '0'/'1' string (bit 1 = first md5 hex digit) —
    cross-engine-stable without any bigint bit twiddling.
    """
    toks = _doc_tokens(df, text_col, id_col).withColumn("h", F.md5("tok"))
    digit_votes = [
        F.sum(
            F.when(F.substring("h", i + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(32)
    ]
    votes = toks.groupBy("doc").agg(*digit_votes)
    bits = F.concat(
        *[F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(32)]
    )
    return votes.select(F.col("doc"), bits.alias("simhash"))


def exact_substring_profile(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shared_frac_tenths: int = 3,
) -> DataFrame:
    """Exact-substring duplication profile — the word-window re-expression
    of suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): for every document, how many of
    its distinct k-token windows also appear VERBATIM in another document,
    and a keep decision at ``max_shared_frac_tenths/10`` shared fraction.

    The sequential formulation is a corpus-wide suffix array; the
    distributed one is k-gram inversion, all narrow rows:
      1. scan-stage explode to per-doc DISTINCT (id, md5(window)) pairs
         (one shuffle),
      2. windows occurring in >1 doc via a partial-aggregated groupBy on
         the 16-byte hash (second shuffle),
      3. left join back (AQE-planned; the shared side holds only
         duplicated windows) + per-doc count (third shuffle).
    No step carries document text past the scan, and a window shared by
    millions of docs is an aggregation row, not a window-function
    partition — skew-safe at corpus scale.

    keep = (10 * n_shared <= max_shared_frac_tenths * n_grams): an exact
    integer predicate, never a float boundary.
    """
    from .text import word_gram_hashes

    grams = word_gram_hashes(df, k, text_col, id_col).dropDuplicates(
        [id_col, "_h"]
    )
    shared = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("_h", F.lit(1).alias("_hit"))
    )
    joined = grams.join(shared, "_h", "left")
    n_grams = F.count(F.lit(1))
    n_shared = F.count("_hit")  # non-null only
    return joined.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        n_shared.alias("n_shared"),
        F.round(n_shared.cast("double") / n_grams.cast("double"), 4).alias(
            "shared_frac"
        ),
        (
            n_shared * F.lit(10) <= n_grams * F.lit(max_shared_frac_tenths)
        ).alias("keep"),
    )
