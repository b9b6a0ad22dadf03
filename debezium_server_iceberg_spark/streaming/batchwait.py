"""Batch-size wait strategies (T2 — batchsizewait/BatchSizeWait.java:14-24).

The reference grows batches by *delaying* the next poll until the source
queue holds a full batch: ``MaxBatchSizeWait`` sleep-polls Debezium's
queue-size metric until ``currentQueueSize >= maxBatchSize`` or the wait
ceiling elapses (MaxBatchSizeWait.java:41-68), and is skipped while a
snapshot is running (:43-46).  ``NoBatchSizeWait`` is the no-op default
(NoBatchSizeWait.java:13-22).

Here the "queue" is whatever the source exposes as a pending estimate —
for the file stream, events in input files the checkpoint has not
committed yet (``FileQueuePending``).  The strategy is source-agnostic:
it takes a ``pending_fn`` and owns only the sleep-poll contract, exactly
the reference's split between the strategy and the metrics supplier.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable


class NoBatchSizeWait:
    """Default: never delay (NoBatchSizeWait.java:13-22)."""

    def wait(self, pending_fn: Callable[[], int] | None = None) -> int:
        return 0


class MaxBatchSizeWait:
    """Sleep-poll until a full batch is pending (MaxBatchSizeWait.java:41-68).

    ``snapshot_running_fn`` mirrors the reference's snapshot-phase skip
    (:43-46): during initial snapshot load the source floods anyway, so
    waiting would only add latency."""

    def __init__(
        self,
        max_batch_size: int,
        max_wait_ms: int = 300_000,
        wait_interval_ms: int = 10_000,
        snapshot_running_fn: Callable[[], bool] | None = None,
        sleep_fn: Callable[[float], None] = time.sleep,
    ) -> None:
        if max_batch_size <= 0:
            raise ValueError("max_batch_size must be positive")
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.wait_interval_ms = wait_interval_ms
        self.snapshot_running_fn = snapshot_running_fn
        self.sleep_fn = sleep_fn

    def wait(self, pending_fn: Callable[[], int]) -> int:
        """Block until ``pending_fn() >= max_batch_size`` or the ceiling
        elapses; returns total waited ms (reference loop :47-68)."""
        if self.snapshot_running_fn is not None and self.snapshot_running_fn():
            return 0
        waited = 0
        while (
            pending_fn() < self.max_batch_size and waited < self.max_wait_ms
        ):
            step = min(self.wait_interval_ms, self.max_wait_ms - waited)
            self.sleep_fn(step / 1000.0)
            waited += step
        return waited


class FileQueuePending:
    """Pending-event estimator for the JSONL file-stream source: events in
    input files not yet marked processed.  Line counts per file are cached
    by (path, size, mtime) so repeated polls cost one ``os.scandir`` plus
    reads of only NEW files — the metrics-supplier role of the reference's
    queue-size MBean."""

    def __init__(self, input_path: str) -> None:
        self.input_path = input_path
        self._counts: dict[tuple[str, int, float], int] = {}
        self._processed: set[str] = set()

    def mark_processed(self, filenames: list[str]) -> None:
        self._processed.update(os.path.basename(f) for f in filenames)

    def pending(self) -> int:
        total = 0
        try:
            entries = list(os.scandir(self.input_path))
        except FileNotFoundError:
            return 0
        for e in entries:
            if not e.is_file() or os.path.basename(e.path) in self._processed:
                continue
            st = e.stat()
            key = (e.path, st.st_size, st.st_mtime)
            if key not in self._counts:
                try:
                    with open(e.path, "rb") as fh:
                        self._counts[key] = sum(1 for line in fh if line.strip())
                except OSError:
                    continue
            total += self._counts[key]
        return total


def build_batch_size_wait(cfg) -> NoBatchSizeWait | MaxBatchSizeWait:
    """Strategy selection (IcebergChangeConsumer.java:103-105)."""
    if cfg.batch_size_wait == "max":
        return MaxBatchSizeWait(
            cfg.max_batch_size,
            cfg.batch_size_wait_max_wait_ms,
            cfg.batch_size_wait_interval_ms,
        )
    if cfg.batch_size_wait in ("none", "", None):
        return NoBatchSizeWait()
    raise ValueError(f"unknown batch_size_wait {cfg.batch_size_wait!r}")
