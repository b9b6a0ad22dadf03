"""Streaming window operators (extension beyond the reference — T6 row of
SURVEY.md §2.6, marked ⊘ there; first-class here).

Each helper returns a streaming-ready DataFrame transform usable in both
batch (tests, backfills) and ``readStream`` pipelines — same Catalyst plan
either way. Watermarks bound state for late data; session windows use
Spark's native session_window; running per-key state uses
``applyInPandasWithState`` (Arrow-batched, partitioned by key — state lives
in the state store, not the driver).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _rmtree_quiet(path: str) -> None:
    """Best-effort cleanup of a local staging directory (underscore-
    prefixed, so Spark readers ignore it even if cleanup is skipped)."""
    import shutil

    shutil.rmtree(path.removeprefix("file:"), ignore_errors=True)


def tumbling_counts(
    events: DataFrame,
    window_len: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation with a watermark for late data."""
    keys = keys or ["event_type"]
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(F.window(ts_col, window_len), *keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window_len/slide overlapping windows. Same plan batch or streaming."""
    keys = keys or ["event_type"]
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(F.window(ts_col, window_len, slide), *keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Native session windows (gap-based), the streaming twin of the batch
    sessionize_events query."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(F.session_window(ts_col, gap), key).agg(
        F.count(F.lit(1)).alias("session_events"),
        F.sum("value").alias("session_value"),
    )


RUNNING_STATE_SCHEMA = "total_count bigint, total_value double"
RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("batch_count", T.LongType(), True),
        T.StructField("total_count", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: running per-user event count/value across
    micro-batches (the kind of cross-batch state the reference never keeps —
    its dedup is strictly in-batch)."""
    (user_id,) = key
    if state.exists:
        total_count, total_value = state.get
    else:
        total_count, total_value = 0, 0.0
    batch_count = 0
    for pdf in pdfs:
        batch_count += len(pdf)
        total_count += len(pdf)
        total_value += float(pdf["value"].fillna(0.0).sum())
    state.update((total_count, total_value))
    yield pd.DataFrame(
        [(user_id, batch_count, total_count, total_value)],
        columns=["user_id", "batch_count", "total_count", "total_value"],
    )


def stream_exact_dedup(
    docs: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    content_col: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit each key (or content hash) once.

    The streaming twin of functions/dedup.exact_dedup for continuously
    ingested corpora: with ``content_col`` set, identity is md5(content) —
    re-crawled bytes dedup regardless of id.  Streaming inputs use
    ``dropDuplicatesWithinWatermark`` so the seen-keys state is BOUNDED by
    the watermark horizon (the unbounded-state trap of plain
    dropDuplicates on streams); batch inputs take the plain distinct path,
    so the same transform backfills historical corpora.  State is
    partitioned by the dedup key — scales with distinct keys in the
    watermark window, not stream volume."""
    cols = list(key_cols or ["doc_id"])
    src = docs
    if content_col is not None:
        # NULL content must NOT collapse into one group (dropDuplicates
        # treats NULL keys as equal): null-content rows fall back to a
        # per-key identity so each stays distinct
        key_fallback = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        src = src.withColumn(
            "content_md5",
            F.coalesce(
                F.md5(F.col(content_col)), F.concat(F.lit("key:"), key_fallback)
            ),
        )
        cols = ["content_md5"]
    if src.isStreaming:
        return src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    return src.dropDuplicates(cols)


def running_user_totals(events: DataFrame) -> DataFrame:
    """applyInPandasWithState wrapper: per-user running totals with
    processing-time semantics (state partitioned by user -> scales with
    distinct keys, not event volume)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "click_ts",
    right_ts: str = "purchase_ts",
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (Structured Streaming's watermarked
    join): pair each right-side event with left-side events of the same
    key that happened within ``max_gap`` BEFORE it — the attribution-join
    shape (click -> purchase within N minutes).

    Both sides get a watermark so the join state is bounded: a buffered
    left row can be dropped once the right watermark passes
    ``left_ts + max_gap`` (Spark derives the state-cleanup horizon from
    the inequality bounds — an unbounded-time-condition stream join
    would accumulate state forever and is the canonical streaming OOM).
    ``how='left_outer'`` emits unmatched left rows null-extended once
    their watermark expires — same semantics as the batch left join, just
    latency-deferred.  On batch inputs the identical expression runs as a
    plain range join, so backfills reuse this exact operator.

    At 100 TB/day the state size is (events per key within the gap
    horizon), not stream volume: keys partition the state store, and the
    watermark bounds the per-key buffer."""
    gap = F.expr(f"INTERVAL {max_gap}")
    l, r = left.alias("l"), right.alias("r")
    if left.isStreaming:
        l = left.withWatermark(left_ts, watermark).alias("l")
    if right.isStreaming:
        r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + gap)
    )
    return l.join(r, cond, how)


CMS_STREAM_OUTPUT_SCHEMA = (
    "row INT, shard INT, batch_adds LONG, total_mass LONG, "
    "counters ARRAY<LONG>"
)
CMS_STREAM_STATE_SCHEMA = "counters ARRAY<LONG>"


def streaming_cms_counts(
    docs: DataFrame,
    w: int = 1024,
    d: int = 3,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Continuously-maintained count-min sketch: the streaming face of
    ``functions/cms.cms_build`` for corpora that arrive as a stream
    (crawl ingestion, CDC-fed document tables) — the sketch is the
    canonical fixed-memory stream summary (Cormode & Muthukrishnan
    2005 define it over a stream of updates).

    Identical hash contract to the batch sketch (md5-prefix of
    ``"j:token"`` mod w, computed IN-PLAN before the stateful stage),
    so after any number of micro-batches the assembled state equals
    ``cms_build`` over the union of all batches — pytest pins the
    equivalence.

    Layout: a streaming AGGREGATION cannot legally precede
    ``applyInPandasWithState`` (chained stateful operators), so the
    in-batch combine happens INSIDE the Arrow function (numpy bincount
    per pandas chunk).  To keep one sketch row from funneling a whole
    stream through one task, the group key is ``(row, shard)`` with
    ``shard = bucket % n_shards`` — d * n_shards groups, each owning
    the ``w / n_shards`` counters of its residue class
    (``counters[i]`` is bucket ``shard + i * n_shards``).  State is
    FIXED at d*w longs total regardless of stream volume; parallelism
    is d * n_shards.  Emits one row per touched (row, shard) per
    batch: ``(row, shard, batch_adds, total_mass, counters)``.

    Batch inputs (tests, backfills) take the same plan through plain
    ``applyInPandas`` (Spark rejects applyInPandasWithState in batch
    queries): one group = one whole-history accumulation from zero —
    definitionally the N=1-batch stream, so the equivalence tests
    compare both faces against ``cms_build``.
    """
    import numpy as np

    from ..functions.cms import _bucket
    from ..functions.text import tokens_col

    if w % n_shards:
        raise ValueError(f"w {w} not divisible by n_shards {n_shards}")
    seg = w // n_shards
    toks = docs.select(F.explode(tokens_col(F.col(text_col))).alias("_t"))
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(F.col("_t"), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    addressed = toks.select(F.explode(cells).alias("_c")).select(
        F.col("_c.row").alias("row"),
        (F.col("_c.bucket") % n_shards).cast("int").alias("shard"),
        # index within this shard's counter segment
        (F.col("_c.bucket") / n_shards).cast("long").alias("idx"),
    )

    def update(key, pdfs, state):
        row, shard = key
        counters = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(seg, dtype=np.int64)
        )
        adds = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            counters += np.bincount(
                pdf["idx"].to_numpy(), minlength=seg
            ).astype(np.int64)
            adds += len(pdf)
        state.update((counters.tolist(),))
        yield pd.DataFrame(
            [(row, shard, adds, int(counters.sum()), counters.tolist())],
            columns=["row", "shard", "batch_adds", "total_mass", "counters"],
        )

    if addressed.isStreaming:
        return addressed.groupBy("row", "shard").applyInPandasWithState(
            update,
            outputStructType=CMS_STREAM_OUTPUT_SCHEMA,
            stateStructType=CMS_STREAM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_update(key, pdf):
        row, shard = key
        counters = np.bincount(
            pdf["idx"].to_numpy(), minlength=seg
        ).astype(np.int64)
        return pd.DataFrame(
            [(row, shard, len(pdf), int(counters.sum()), counters.tolist())],
            columns=["row", "shard", "batch_adds", "total_mass", "counters"],
        )

    return addressed.groupBy("row", "shard").applyInPandas(
        batch_update, schema=CMS_STREAM_OUTPUT_SCHEMA
    )


SAMPLE_STREAM_OUTPUT_SCHEMA = "shard INT, hashes ARRAY<STRING>, ids ARRAY<LONG>"
SAMPLE_STREAM_STATE_SCHEMA = "hashes ARRAY<STRING>, ids ARRAY<LONG>"


def streaming_bottom_k_sample(
    docs: DataFrame,
    k: int = 64,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming deterministic uniform sample: keep the ``k`` ids with
    the smallest md5(id) EVER SEEN — the bottom-k (KMV-style) sample,
    the rerun-stable stream twin of ``pipeline.stratified_sample``'s
    md5-order draws.  Because membership depends only on each id's own
    hash, the sample after N micro-batches equals the batch bottom-k
    over the union — no RNG state, no order sensitivity (a true
    reservoir sample is order-dependent and unverifiable).

    Sharded like the streaming CMS: group key = first hex nibble of
    the hash (``n_shards`` in {1..16} groups), each shard's state holds
    ITS k smallest (hash, id) pairs — the global bottom-k is the
    k smallest of the per-shard unions, a trivial bounded merge the
    caller (or a downstream batch op) applies.  State is at most
    n_shards * k pairs no matter how much streams through.  Emits each
    shard's full sorted bottom-k per batch.

    Batch inputs take the same plan through plain ``applyInPandas``
    (one whole-history accumulation per shard == the N=1-batch stream).
    """
    hashed = docs.select(
        F.md5(F.col(id_col).cast("string")).alias("h"),
        F.col(id_col).alias("_id"),
    ).select(
        (F.conv(F.substring("h", 1, 1), 16, 10).cast("int") % n_shards)
        .alias("shard"),
        "h",
        "_id",
    )

    def update(key, pdfs, state):
        (shard,) = key
        hs, ids = (state.get if state.exists else ([], []))
        pairs = set(zip(hs, ids))
        for pdf in pdfs:
            pairs |= set(zip(pdf["h"], (int(i) for i in pdf["_id"])))
        merged = sorted(pairs)[:k]
        hs = [h for h, _ in merged]
        ids = [i for _, i in merged]
        state.update((hs, ids))
        yield pd.DataFrame(
            [(shard, hs, ids)], columns=["shard", "hashes", "ids"]
        )

    if hashed.isStreaming:
        return hashed.groupBy("shard").applyInPandasWithState(
            update,
            outputStructType=SAMPLE_STREAM_OUTPUT_SCHEMA,
            stateStructType=SAMPLE_STREAM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_update(key, pdf):
        (shard,) = key
        merged = sorted(set(zip(pdf["h"], (int(i) for i in pdf["_id"]))))[:k]
        return pd.DataFrame(
            [(shard, [h for h, _ in merged], [i for _, i in merged])],
            columns=["shard", "hashes", "ids"],
        )

    return hashed.groupBy("shard").applyInPandas(
        batch_update, schema=SAMPLE_STREAM_OUTPUT_SCHEMA
    )


def run_minhash_index_stream(
    docs_stream: DataFrame,
    index,
    pairs_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    maintain_every: int | None = None,
    cluster_index=None,
    op_col: str | None = None,
    ts_col: str | None = None,
    before_col: str | None = None,
    counters=None,
    pairs_log=None,
):
    """Continuously-maintained near-dup index: each micro-batch of
    documents is admitted into the persistent MinHash band index
    (``functions/incremental.MinHashIndex``) and the batch's VERIFIED
    near-dup pairs — new-vs-history and new-vs-new — land in a
    partitioned parquet sink.

    Exactly-once on BOTH effects of a micro-batch (foreachBatch is
    at-least-once), with a strict effect ORDER inside ``add_batch``:

    - the pairs land in ``pairs_dir/epoch=N`` (mode=overwrite) via the
      ``on_result`` hook, BEFORE the index append commits;
    - the index append is epoch-stamped into the lakehouse snapshot
      summary (the ``ChangeConsumer`` idempotence contract, reused).

    Crash matrix: stamp present ⇒ pairs already durable ⇒ the replay
    skips both effects (``add_batch`` returns None without invoking the
    hook — it never overwrites the first attempt's pairs with an empty
    frame); stamp absent ⇒ the replay recomputes deterministically,
    overwriting ``epoch=N`` with identical rows, then appends.

    ``maintain_every=N`` runs the index's small-file compaction
    (``index.maintain``) every N epochs inside the same foreachBatch —
    long-running feeds otherwise accumulate one file per trigger (the
    consumer's ``compact_every_commits`` pattern).  Compaction is an
    atomic snapshot swap; a crash-induced re-run is harmless (bin-pack
    is idempotent on an already-compacted table).

    ``cluster_index`` (a ``functions/incremental.ClusterIndex``) chains
    the epoch's verified pairs into a persistent connected-components
    index inside the same hook — the FULL continuous-dedup loop:
    documents stream in, near-dup pairs stream out, and cluster
    assignments stay queryable without ever re-clustering history.  The
    chain keeps exactly once: cluster admission runs inside
    ``on_result`` (before the band-index stamp) and carries its own
    epoch stamp, so every crash window replays to the identical state
    — if the band index committed, the cluster index had already
    committed; if neither committed, the pairs recompute
    deterministically and the cluster admission's own guard skips any
    half-applied epoch.

    ``op_col`` makes the feed CDC-aware (the reference's
    delete-key-then-write shape, BaseDeltaTaskWriter.java:60-71):
    events first collapse to one survivor per doc (``dedup_batch`` —
    max by ``ts_col``/op-priority, the consumer's own comparator), then
    docs whose batch carried an update or delete have their OLD band
    rows equality-deleted (``MinHashIndex.remove_docs``), and the
    non-deleted survivors are re-admitted.  An updated doc therefore
    probes and pairs with its NEW text only; a deleted doc stops
    matching.  Exactly-once extends over the extra effect because the
    epoch guard moves in FRONT of everything: the epoch stamp still
    rides the LAST commit (the band append), so "stamp present" ⇒ all
    effects durable ⇒ a replay skips removals too — critical, since a
    replayed removal (a higher-sequence delete) would otherwise erase
    the first attempt's re-added rows.

    ``MinHashIndex`` removal is id-keyed and idempotent.
    ``SubstringIndex`` removal is ARITHMETIC (negative gram counts) and
    needs the delete events' before-image text: pass ``before_col``
    (the Debezium ``before`` payload — d and u events carry the
    previously-committed row).  Two rules make the arithmetic exact:

    - only docs whose EARLIEST event in the batch is d/u are removed —
      a doc first created in this batch has no admitted prior state,
      and un-counting its (never-counted) before-image would corrupt
      totals; per-key event order is a CDC integrity guarantee, so
      "earliest is d/u" ⇔ "admitted by an earlier epoch";
    - the negative append itself is epoch-stamped
      (``removal_epoch_id``), so a crash between the removal commit and
      the epoch-stamped re-admitting append replays the removal exactly
      once (the front guard covers full-epoch replays; this covers the
      half-applied window an idempotent removal doesn't need).

    Events with a NULL before-image are skipped for removal (the
    tombstone-skip precedent: raising would poison-pill the replayed
    batch) — conservative for the index (old counts persist until a
    fold/rebuild), but a source without full before images (e.g.
    Postgres without REPLICA IDENTITY FULL) under-removes; route such
    feeds to ``MinHashIndex`` (id-keyed removal) instead.  Pass
    ``counters`` (a ``streaming/progress.RemovalCounters``) to make that
    drift OBSERVABLE: per-epoch ``removed`` / ``skipped_null_before``
    counts, with a warning logged the moment an epoch skips — in-memory
    at-least-once observability, not exactly-once state.

    ``cluster_index`` removal stays a maintenance concern
    (``maintain(removed_docs=)`` on the operator's cadence): cluster
    state keeps no per-doc text and re-election is the explicit heavy
    op.

    ``pairs_log`` (a ``functions/incremental.PairsLog``) gives the
    pairs sink its LIFECYCLE: every ``maintain_every`` epochs the raw
    ``epoch=N`` directories fold into the bucket-partitioned live-pairs
    table and are deleted — without it a long-lived feed accumulates
    one directory per trigger forever, and strict-split maintains scan
    all of it.  Requires ``maintain_every`` (the fold runs on that
    cadence).

    Scale: per-trigger work is the documented ``add_batch`` shape —
    the batch's band rows probe the stored index with the scan PRUNED
    to the batch's bucket set (byte-estimated broadcast, shuffle above
    the limit); history is never re-banded and never full-scanned; the
    per-trigger removal is one zero-read equality-delete commit.

    Returns the started StreamingQuery."""
    if pairs_log is not None and not maintain_every:
        raise ValueError(
            "pairs_log compacts the pairs sink on the maintain cadence: "
            "pass maintain_every"
        )
    if op_col is not None:
        from ..functions.incremental import MinHashIndex, SubstringIndex

        if isinstance(index, SubstringIndex):
            if before_col is None or ts_col is None:
                raise ValueError(
                    "SubstringIndex removal is arithmetic and needs the "
                    "delete events' before-image text AND event order: "
                    "pass before_col (the Debezium `before` payload) and "
                    "ts_col (to pick each doc's earliest event)"
                )
        elif not isinstance(index, MinHashIndex):
            raise ValueError(
                "op_col routing requires MinHashIndex (id-keyed idempotent "
                "remove_docs) or SubstringIndex with before_col (stamped "
                "arithmetic removal)"
            )

    def process(batch_df, epoch_id):
        def sink(res):
            res.write.mode("overwrite").parquet(f"{pairs_dir}/epoch={epoch_id}")
            if cluster_index is not None:
                cluster_index.add_batch(res, epoch_id=epoch_id)

        batch = batch_df
        if op_col is not None and op_col in batch.columns:
            from ..functions.incremental import epoch_already_applied
            from ..operators.dedup import dedup_batch

            # guard FIRST: on a replayed epoch even the (idempotent)
            # removal must not run — its replay commit would carry a
            # higher sequence and erase the first attempt's re-adds
            if epoch_already_applied(index.table, epoch_id):
                return
            from ..functions.incremental import SubstringIndex

            final = dedup_batch(
                batch, [id_col], dedup_column=ts_col, op_col=op_col
            )
            if isinstance(index, SubstringIndex):
                # arithmetic removal: un-count the EARLIEST event's
                # before-image, and only for docs that pre-existed the
                # batch (earliest event d/u — a doc first created here
                # was never counted; see docstring).  Per-key window:
                # bounded by a key's events in ONE micro-batch.
                from pyspark.sql import Window

                w = Window.partitionBy(id_col).orderBy(F.col(ts_col).asc())
                candidates = (
                    batch.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .filter(F.col(op_col).isin("d", "u"))
                )
                earliest = candidates.filter(
                    F.col(before_col).isNotNull()
                ).select(id_col, F.col(before_col).alias(text_col))
                if counters is not None:
                    # one batch-sized agg: removal vs skipped-for-null
                    # counts per epoch — the documented under-removal
                    # bias made operator-visible (a nonzero skip warns
                    # with the routing fix)
                    c = candidates.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.count(before_col).alias("with_before"),
                    ).collect()[0]
                if earliest.limit(1).count():
                    index.remove_docs(
                        earliest,
                        text_col=text_col,
                        id_col=id_col,
                        epoch_id=epoch_id,
                    )
                if counters is not None:
                    # record AFTER the removal commit: a failed removal
                    # raises above and must not count as removed
                    counters.record(
                        epoch_id,
                        removed=int(c["with_before"]),
                        skipped_null_before=int(c["n"]) - int(c["with_before"]),
                    )
            else:
                # remove by ANY d/u event in the RAW batch (not the
                # survivor's op): a delete-then-recreate doc survives as
                # 'c' but its old band rows from earlier epochs must
                # still go; id-keyed equality delete of a never-admitted
                # doc is a no-op, so no pre-existence rule is needed
                touched = (
                    batch.filter(F.col(op_col).isin("d", "u"))
                    .select(F.col(id_col).cast("long").alias("doc"))
                    .distinct()
                )
                # full distinct count only when someone reads it; the
                # plain path keeps the cheaper existence probe
                n_touched = (
                    touched.count()
                    if counters is not None
                    else touched.limit(1).count()
                )
                if n_touched:
                    index.remove_docs(batch.sparkSession, touched)
                if counters is not None:
                    # id-keyed removal needs no before image: never
                    # skips; recorded AFTER the removal commit
                    counters.record(epoch_id, removed=n_touched)
            batch = final.filter(F.col(op_col) != "d").drop(
                op_col,
                *([ts_col] if ts_col and ts_col in final.columns else []),
                *([before_col] if before_col and before_col in final.columns else []),
            )
        index.add_batch(
            batch,
            text_col=text_col,
            id_col=id_col,
            epoch_id=epoch_id,
            on_result=sink,
        )
        if maintain_every and (epoch_id + 1) % maintain_every == 0:
            index.maintain(batch_df.sparkSession)
            if cluster_index is not None:
                cluster_index.maintain(batch_df.sparkSession)
            if pairs_log is not None:
                # pairs-log lifecycle (r15): fold the raw epoch
                # directories into the bucket-partitioned live-pairs
                # table on the same cadence — the raw log never grows
                # past one maintain interval, and strict-split
                # maintains read the compacted table with pruned
                # scans.  Safe here: every durable effect of this
                # epoch has committed (a replay is skipped by the
                # epoch stamp before it would miss the folded dirs),
                # and compaction itself is idempotent across a crash
                # between the table commit and the dir cleanup.
                pairs_log.compact(batch_df.sparkSession, pairs_dir)

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process)
        .start()
    )


# the wrapper is index-agnostic: any persistent index exposing
# add_batch(docs, text_col, id_col, epoch_id, on_result) -> DataFrame|None
# plugs in (SubstringIndex shares the exactly-once contract)
run_dedup_index_stream = run_minhash_index_stream


def emit_vector_epoch_pairs(
    index,
    batch: DataFrame,
    pairs_dir: str,
    epoch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_threshold: float = 0.9,
    pair_k: int = 5,
    pair_n_probe: int = 4,
    max_pair_batch_rows: int = 100_000,
    max_pair_batch_cells: int = 256_000_000,
) -> None:
    """One epoch of the continuous-semantic-dedup pairs loop, shared by
    ``run_vector_index_stream`` (its per-trigger body) and batch
    callers (the driver gate's batch face; backfills re-running a
    single epoch).  Writes the epoch's deduplicated cosine near-dup
    pairs to ``pairs_dir/epoch=N`` (mode=overwrite; deterministic, so
    replays recompute identical rows).  Semantics and scale shape are
    documented on ``run_vector_index_stream``: new-vs-history through
    the index's own partition-pruned search, new-vs-new through a
    row-chunked exact GEMM whose per-chunk pairs SPILL to an
    underscore-hidden staging sink (pair volume can be O(batch²) even
    when the matrix is chunked — it must never accumulate driver-side),
    both thresholded on the ROUNDED (3-decimal) cosine so the two
    sources share one boundary, then one ``groupBy(pair).max(cosine)``
    so a pair arriving from both sources keeps a deterministic score."""
    import numpy as np

    spark = batch.sparkSession
    # ONE aggregate job yields the row count AND the dimension probe
    # (previously a count job + a one-row first() job per epoch); both
    # guards still run BEFORE anything is collected to the driver
    _g = batch.groupBy().agg(
        F.count(F.lit(1)).alias("_n"),
        F.first(F.size(F.col(vec_col))).alias("_d"),
    ).first()
    n_batch = int(_g["_n"])
    if n_batch > max_pair_batch_rows:
        raise ValueError(
            f"micro-batch of {n_batch} vectors exceeds "
            f"max_pair_batch_rows={max_pair_batch_rows}; the pairs "
            "sink is CDC-batch-sized (the batch IS the search's "
            "query matrix) — backfill-sized corpora go through the "
            "one-shot semantic-dedup operator, then seed the stream"
        )
    if n_batch:
        # BYTE-aware guard, not just rows: the collect below pulls
        # rows x dim float64 cells onto the driver, and a row bound
        # alone lets a wide-embedding batch (100k x 4096 = ~3.3 GB)
        # through — bound total cells before collecting anything
        dim = int(_g["_d"] or 0)
        if n_batch * dim > max_pair_batch_cells:
            raise ValueError(
                f"micro-batch of {n_batch} x dim-{dim} vectors = "
                f"{n_batch * dim} cells exceeds max_pair_batch_cells="
                f"{max_pair_batch_cells} (~{max_pair_batch_cells * 8 // 2**20}"
                " MiB of float64 on the driver); the pairs sink is "
                "CDC-batch-sized — backfill-sized corpora go through "
                "the one-shot semantic-dedup operator, then seed the "
                "stream"
            )
    # Arrow fetch (toPandas), not a pickled-row collect: the batch
    # matrix is the per-epoch driver payload and Arrow moves it
    # columnar — same values, same guards, fewer serialization cycles
    bpdf = batch.select(id_col, vec_col).toPandas()
    schema = "doc_a long, doc_b long, cosine double"
    epoch_path = f"{pairs_dir}/epoch={epoch_id}"
    # underscore prefix => Spark's file index (and therefore
    # spark.read.parquet(pairs_dir)) ignores it; a crashed epoch
    # leaves only invisible staging debris, overwritten on replay
    staging = f"{pairs_dir}/_staging_epoch={epoch_id}"
    spilled = False
    if len(bpdf):
        ids = [int(v) for v in bpdf[id_col]]
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in bpdf[vec_col]]
        )
        # new-vs-history: the index's own partition-pruned search
        # (a CDC feed's removals have already committed by now, so
        # stale/deleted rows cannot match); search rounds cosine to 3
        # decimals, so the threshold applies to the ROUNDED value —
        # the in-batch path below shares that boundary
        hist = (
            index.search(
                spark, ids, k=pair_k, n_probe=pair_n_probe,
                query_vecs=vecs,
            )
            .filter(F.col("cosine") >= pair_threshold)
            .select(
                F.least("query_id", "neighbor_id").alias("doc_a"),
                F.greatest("query_id", "neighbor_id").alias("doc_b"),
                F.col("cosine").cast("double").alias("cosine"),
            )
        )
        # new-vs-new: exact in-batch GEMM, BLOCKED — a full n x n
        # similarity matrix is O(batch^2) doubles (80 GB at the
        # 100k guard); row-chunks keep peak memory ~chunk x n.
        # Pair-volume bound (the thing that must never accumulate
        # driver-side — a near-duplicate-heavy batch emits O(batch^2)
        # pairs even when the matrix is chunked): a SINGLE chunk's
        # extraction is bounded by chunk x n <= 8M entries, so the
        # one-chunk case (every CDC-sized batch) keeps its pairs
        # in-memory and unions them with the history plan — one write,
        # no staging round-trip; multi-chunk batches SPILL each
        # chunk's pairs to the staging sink immediately.
        ids_arr = np.array(ids, dtype=np.int64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = np.nan
        vn = vecs / norms[:, None]
        n = len(ids)
        chunk = max(1, min(n, 8_000_000 // max(n, 1)))
        spilled = chunk < n
        if spilled:
            hist.write.mode("overwrite").parquet(staging)
        nn_frames = []
        for s in range(0, n, chunk):
            # threshold on the ROUNDED cosine — the same boundary
            # as the stored-history path, so a 0.8996 pair cannot
            # be kept from one source and dropped from the other
            block = np.round(vn[s : s + chunk] @ vn.T, 3)
            bi, bj = np.nonzero(block >= pair_threshold)
            gi = bi.astype(np.int64) + s
            gj = bj.astype(np.int64)
            keep = (gi < gj) & (ids_arr[gi] != ids_arr[gj])
            if not keep.any():
                continue
            a_ids = ids_arr[gi[keep]]
            b_ids = ids_arr[gj[keep]]
            chunk_df = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "doc_a": np.minimum(a_ids, b_ids),
                        "doc_b": np.maximum(a_ids, b_ids),
                        "cosine": block[bi[keep], bj[keep]],
                    }
                ),
                schema,
            )
            if spilled:
                chunk_df.write.mode("append").parquet(staging)
            else:
                nn_frames.append(chunk_df)
        # one deterministic pair per (doc_a, doc_b): max cosine —
        # the same pair can arrive from BOTH sources (an id in the
        # batch AND still stored, e.g. re-sent without op_col
        # routing); an arbitrary keep would let a crash replay
        # rewrite epoch=N with a different cosine
        if spilled:
            res = spark.read.schema(schema).parquet(staging)
        else:
            res = hist
            for f in nn_frames:
                res = res.unionByName(f)
        res = res.groupBy("doc_a", "doc_b").agg(F.max("cosine").alias("cosine"))
    else:
        res = spark.createDataFrame([], schema)
    res.write.mode("overwrite").parquet(epoch_path)
    if spilled:
        _rmtree_quiet(staging)


def run_vector_index_stream(
    vec_stream: DataFrame,
    index,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    maintain_every: int | None = None,
    op_col: str | None = None,
    ts_col: str | None = None,
    pairs_dir: str | None = None,
    pair_threshold: float = 0.9,
    pair_k: int = 5,
    pair_n_probe: int = 4,
    max_pair_batch_rows: int = 100_000,
    max_pair_batch_cells: int = 256_000_000,
    cluster_index=None,
    counters=None,
    pairs_log=None,
):
    """Continuously-maintained ANN index: each micro-batch of embeddings
    is encoded against the FROZEN codebooks (coarse cell + PQ codes for
    ``IVFPQIndex``, cell assignment for ``IVFIndex``) and appended into
    the index's cell partitions — the long-running-embedding-stream shape
    of incremental IVF maintenance (codebook drift stays a periodic-
    rebuild concern, as in every IVF system).

    Exactly-once: the single effect (the cell-partitioned append) is
    epoch-stamped with the same snapshot-summary contract as the dedup
    index feeds; a replayed micro-batch appends nothing, and an epoch
    REGRESSION (reset checkpoint / second writer) raises rather than
    silently dropping batches (``functions/incremental.
    epoch_already_applied``).

    ``maintain_every=N`` bin-packs the per-trigger files every N epochs
    (compaction recomputes partition transforms from rows, so cell
    layout — and therefore search-time partition pruning — survives).

    ``op_col`` makes the feed CDC-aware, the same routing as
    ``run_minhash_index_stream``: events collapse to one survivor per
    vector id (``dedup_batch`` — max by ``ts_col``/op-priority), ids
    whose batch carried an update or delete have their OLD stored rows
    equality-deleted (``remove_vectors`` — an updated embedding must
    not keep matching under its stale cell/codes), and non-deleted
    survivors re-encode against the frozen codebooks and re-admit.
    Exactly-once extends over the removal with the guard in FRONT of
    all effects: the epoch stamp rides the append, so "stamp present"
    ⇒ removal + re-add durable ⇒ the replay skips both — a replayed
    removal would otherwise commit at a higher sequence and erase the
    first attempt's re-added rows (the hazard
    ``test_stream_op_aware_replay_skips_removals`` pins for the dedup
    feeds; same contract here).

    ``pairs_dir`` turns the feed into CONTINUOUS SEMANTIC DEDUP — the
    embedding-space analog of ``run_minhash_index_stream``'s pairs
    sink: each epoch's cosine near-dup pairs land in
    ``pairs_dir/epoch=N`` (mode=overwrite) BEFORE the epoch-stamped
    append, so "stamp present" ⇒ pairs durable ⇒ replays skip both
    effects.  Pair semantics (``(doc_a, doc_b, cosine)``, ``doc_a <
    doc_b``, deterministic — test-pinned against a numpy oracle):

    - new-vs-history: each batch vector's top-``pair_k`` stored
      neighbors at cosine ≥ ``pair_threshold``, found through the
      index's own partition-pruned search (``pair_n_probe`` cells) —
      history is never re-scored, per-epoch stored I/O is the probed
      cells' files, the SemDeDup recall/cost dial;
    - new-vs-new: ALL in-batch pairs at cosine ≥ ``pair_threshold``
      (exact, batch-bounded GEMM driver-side — the batch is already
      collected as the search's query matrix; ``max_pair_batch_rows``
      guards the collect and raises pointing at the one-shot
      ``semantic dedup`` operator for backfill-sized batches).

    Requires an ``IVFIndex`` (cosine scores); ``IVFPQIndex`` search
    returns ADC distances, not cosines — rerank-based streaming pairs
    are a rebuild-time concern, refused loudly.

    ``counters`` (a ``streaming/progress.RemovalCounters``) records the
    per-epoch removed-id count — the same observability hook as the
    dedup feed; vector removal is id-keyed, so ``skipped_null_before``
    stays 0 here.

    ``cluster_index`` (with ``pairs_dir``) chains each epoch's pairs
    into a persistent ``ClusterIndex`` — the FULL continuous SemDeDup
    loop (embeddings stream in, near-dup pairs stream out, cluster
    assignments stay queryable without re-clustering history), the
    exact shape ``run_minhash_index_stream(cluster_index=)`` gives the
    lexical loop.  Cluster admission runs AFTER the pairs land and
    BEFORE the vector append stamps, carrying its own epoch stamp, so
    every crash window replays to the identical state.

    ``pairs_log`` (a ``functions/incremental.PairsLog``) folds the raw
    ``pairs_dir/epoch=N`` directories into the bucket-partitioned
    live-pairs table every ``maintain_every`` epochs and deletes them —
    the pairs sink's lifecycle (see ``run_minhash_index_stream``).
    Requires ``pairs_dir`` and ``maintain_every``.

    Returns the started StreamingQuery."""
    if cluster_index is not None and pairs_dir is None:
        raise ValueError("cluster_index chains the pairs sink: pass pairs_dir")
    if pairs_log is not None and (pairs_dir is None or not maintain_every):
        raise ValueError(
            "pairs_log compacts the pairs sink on the maintain cadence: "
            "pass pairs_dir AND maintain_every"
        )
    if pairs_dir is not None:
        from ..functions.ann_index import IVFIndex

        if not isinstance(index, IVFIndex):
            raise ValueError(
                "pairs_dir needs cosine scores (IVFIndex); IVFPQIndex "
                "search returns ADC distances — run exact rerank offline "
                "or use an IVFIndex for the streaming dedup feed"
            )
    if op_col is not None and "vec_id" not in index.table.metadata().identifier_fields:
        # fail at stream SETUP, not per-batch inside foreachBatch: an
        # op-aware feed over a pre-removal-support index table would
        # poison-pill every micro-batch carrying a d/u event with the
        # generic commit_row_delta error and no hint that a rebuild fixes it
        raise ValueError(
            f"op-aware feed needs remove_vectors: index table "
            f"{index.table.location} does not declare vec_id as an "
            "identifier field (built before removal support) — rebuild "
            "the index (build() on the live corpus) first"
        )

    def process(batch_df, epoch_id):
        from ..functions.incremental import epoch_already_applied

        batch = batch_df
        if (op_col is not None and op_col in batch.columns) or pairs_dir:
            # guard FIRST: on a replayed epoch neither the (idempotent)
            # removal nor the pairs overwrite may run — a replayed
            # empty-ish recompute would clobber the first attempt's
            # durable pairs (see run_minhash_index_stream)
            if epoch_already_applied(index.table, epoch_id):
                return
        if op_col is not None and op_col in batch.columns:
            from ..operators.dedup import dedup_batch
            final = dedup_batch(
                batch, [id_col], dedup_column=ts_col, op_col=op_col
            )
            # remove by ANY d/u event in the RAW batch (not the
            # survivor's op): delete-then-recreate survives as 'c' but
            # its old rows from earlier epochs must still go
            touched = (
                batch.filter(F.col(op_col).isin("d", "u"))
                .select(F.col(id_col).cast("long").alias("vec_id"))
                .distinct()
            )
            # full distinct count only when someone reads it; the plain
            # path keeps the cheaper existence probe
            n_touched = (
                touched.count()
                if counters is not None
                else touched.limit(1).count()
            )
            if n_touched:
                index.remove_vectors(batch.sparkSession, touched)
            if counters is not None:
                # id-keyed removal needs no before image: never skips;
                # recorded AFTER the removal commit (a failed removal
                # raises above and must not count as removed)
                counters.record(epoch_id, removed=n_touched)
            batch = final.filter(F.col(op_col) != "d").drop(
                op_col,
                *([ts_col] if ts_col and ts_col in final.columns else []),
            )
        if pairs_dir is not None:
            spark = batch_df.sparkSession
            # pairs land BEFORE the stamped append — the dedup feeds'
            # effect-order contract: stamp present => pairs durable
            emit_vector_epoch_pairs(
                index,
                batch,
                pairs_dir=pairs_dir,
                epoch_id=epoch_id,
                id_col=id_col,
                vec_col=vec_col,
                pair_threshold=pair_threshold,
                pair_k=pair_k,
                pair_n_probe=pair_n_probe,
                max_pair_batch_rows=max_pair_batch_rows,
                max_pair_batch_cells=max_pair_batch_cells,
            )
            if cluster_index is not None:
                # admit the DURABLE pairs (read-back), not the live plan —
                # re-executing `res` inside add_batch would re-run the
                # index search for identical rows
                cluster_index.add_batch(
                    spark.read.parquet(f"{pairs_dir}/epoch={epoch_id}"),
                    epoch_id=epoch_id,
                )
        index.add_batch(batch, id_col=id_col, vec_col=vec_col, epoch_id=epoch_id)
        if maintain_every and (epoch_id + 1) % maintain_every == 0:
            index.maintain(batch_df.sparkSession)
            if cluster_index is not None:
                cluster_index.maintain(batch_df.sparkSession)
            if pairs_log is not None:
                # pairs-log lifecycle (r15): fold the raw epoch
                # directories into the bucket-partitioned live-pairs
                # table on the same cadence — the raw log never grows
                # past one maintain interval, and strict-split
                # maintains read the compacted table with pruned
                # scans.  Safe here: every durable effect of this
                # epoch has committed (a replay is skipped by the
                # epoch stamp before it would miss the folded dirs),
                # and compaction itself is idempotent across a crash
                # between the table commit and the dir cleanup.
                pairs_log.compact(batch_df.sparkSession, pairs_dir)

    return (
        vec_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process)
        .start()
    )
