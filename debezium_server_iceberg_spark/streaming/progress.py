"""Progress logging (operator C4): the reference logs consumed-event
counters on a 15-minute interval (IcebergChangeConsumer.java:66-72,396-407).
Spark-first equivalent: a StreamingQueryListener accumulating per-query
row counts and batch durations from the engine's own progress events —
no custom counters threaded through the write path.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)


@dataclass
class ProgressSnapshot:
    total_input_rows: int = 0
    batches: int = 0
    last_batch_rows: int = 0
    last_batch_duration_ms: int = 0
    started_at: float = field(default_factory=time.time)

    @property
    def rows_per_sec(self) -> float:
        elapsed = max(time.time() - self.started_at, 1e-9)
        return self.total_input_rows / elapsed


@dataclass
class RemovalCounters:
    """Per-epoch removal observability for the CDC index feeds
    (``run_minhash_index_stream(counters=)``): how many docs each epoch
    REMOVED from the index, and how many d/u events were SKIPPED for
    removal because their before-image was null (a source without full
    before images — e.g. Postgres without REPLICA IDENTITY FULL —
    under-removes the arithmetic SubstringIndex; the per-row skip is
    deliberate and documented, but the DRIFT must be operator-visible,
    not silent).  A nonzero skip logs a warning naming the routing fix.

    In-memory, at-least-once observability (a crash-window replay may
    re-record an epoch) — alarms and dashboards, not exactly-once
    state."""

    epochs: dict[int, dict[str, int]] = field(default_factory=dict)

    def record(
        self, epoch_id: int, removed: int = 0, skipped_null_before: int = 0
    ) -> None:
        e = self.epochs.setdefault(
            int(epoch_id), {"removed": 0, "skipped_null_before": 0}
        )
        e["removed"] += int(removed)
        e["skipped_null_before"] += int(skipped_null_before)
        if skipped_null_before:
            log.warning(
                "epoch %d: %d d/u event(s) skipped for removal (null "
                "before-image) — the index under-removes; use REPLICA "
                "IDENTITY FULL upstream or route the feed to MinHashIndex "
                "(id-keyed removal needs no before image)",
                epoch_id,
                skipped_null_before,
            )

    @property
    def total_removed(self) -> int:
        return sum(e["removed"] for e in self.epochs.values())

    @property
    def total_skipped_null_before(self) -> int:
        return sum(e["skipped_null_before"] for e in self.epochs.values())


class ConsumerProgressListener(StreamingQueryListener):
    """Accumulates throughput stats per streaming query; logs a summary line
    every ``log_interval_s`` seconds (default 15 min, matching the
    reference's cadence).

    ``removal_counters`` folds the CDC index feeds' under-removal
    observability into the same periodic surface (r15 — previously the
    operator had to hold and poll the ``RemovalCounters`` instance
    themselves): pass the counters object (or ``{name: counters}`` for
    several feeds) and every summary line carries the cumulative
    removed / skipped_null_before totals, so the documented
    under-removal drift shows up where the throughput stats already go
    instead of dying silently with the process."""

    def __init__(
        self,
        log_interval_s: int = 900,
        removal_counters: "RemovalCounters | dict[str, RemovalCounters] | None" = None,
    ) -> None:
        self.snapshots: dict[str, ProgressSnapshot] = {}
        self.log_interval_s = log_interval_s
        self.removal_counters = removal_counters
        self._last_log = 0.0

    def _removal_summary(self) -> str:
        """One '; removals ...' clause from the attached counters (empty
        string when none attached)."""
        c = self.removal_counters
        if c is None:
            return ""
        named = c.items() if isinstance(c, dict) else [("feed", c)]
        parts = [
            f"{name}: removed={ctr.total_removed} "
            f"skipped_null_before={ctr.total_skipped_null_before}"
            for name, ctr in named
        ]
        return "; removals " + ", ".join(parts)

    def onQueryStarted(self, event) -> None:
        self.snapshots[str(event.id)] = ProgressSnapshot()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        snap = self.snapshots.setdefault(str(p.id), ProgressSnapshot())
        rows = int(p.numInputRows or 0)
        snap.total_input_rows += rows
        snap.batches += 1
        snap.last_batch_rows = rows
        dur = p.durationMs or {}
        snap.last_batch_duration_ms = int(dur.get("triggerExecution", 0))
        now = time.time()
        if now - self._last_log >= self.log_interval_s:
            self._last_log = now
            log.info(
                "stream %s: %d rows in %d batches (%.1f rows/s)%s",
                p.id,
                snap.total_input_rows,
                snap.batches,
                snap.rows_per_sec,
                self._removal_summary(),
            )

    def onQueryTerminated(self, event) -> None:
        self.snapshots.pop(str(event.id), None)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass
