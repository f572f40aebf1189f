"""Streaming observability: a StreamingQueryListener that keeps a
bounded in-memory metrics history per query — throughput, batch
duration, and state size — plus derived health summaries.

The reference's only observability is a 100-line log ring exposed over
REST (``firebase/app/artifacts.py:206-212``); at scale an operator
needs NUMBERS — is the consumer keeping up (inputRowsPerSecond vs
processedRowsPerSecond), is state growing without bound, is a batch
stuck. Spark already emits all of this through the listener bus on
every micro-batch; this module just retains and summarizes it. The
listener is passive (no query interference), and history is bounded
per query (ring buffer) so a weeks-long job cannot leak driver
memory.
"""

from __future__ import annotations

import collections
import math


def _finite(v) -> float:
    """Spark reports NaN rates on a (re)started query's first
    progress; NaN is truthy, so ``or 0.0`` passes it through and one
    sample poisons every windowed sum. Coerce non-finite to 0."""
    try:
        f = float(v)
    except (TypeError, ValueError):
        return 0.0
    return f if math.isfinite(f) else 0.0
import threading
from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_id: str
    batch_id: int
    timestamp: str
    num_input_rows: int
    input_rows_per_second: float
    processed_rows_per_second: float
    batch_duration_ms: int
    state_rows: int
    state_bytes: int


class MetricsRecorder(StreamingQueryListener):
    """Retains the last ``history`` batch metrics per streaming query.

    Attach with ``spark.streams.addListener(recorder)``; detach with
    ``removeListener``. Thread-safe (the listener bus delivers from a
    background thread while REST/health readers poll from others).
    """

    def __init__(self, history: int = 100):
        self.history = history
        self._lock = threading.Lock()
        self._by_query: dict[str, collections.deque] = {}
        self._terminated: dict[str, str | None] = {}

    # -- listener callbacks ---------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._by_query.setdefault(
                str(event.id), collections.deque(maxlen=self.history))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = state_bytes = 0
        for op in (p.stateOperators or []):
            state_rows += op.numRowsTotal or 0
            state_bytes += op.memoryUsedBytes or 0
        m = BatchMetric(
            query_id=str(p.id),
            batch_id=p.batchId,
            timestamp=p.timestamp,
            num_input_rows=p.numInputRows or 0,
            input_rows_per_second=_finite(p.inputRowsPerSecond),
            processed_rows_per_second=_finite(p.processedRowsPerSecond),
            batch_duration_ms=p.batchDuration or 0,
            state_rows=state_rows,
            state_bytes=state_bytes,
        )
        with self._lock:
            self._by_query.setdefault(
                str(p.id), collections.deque(maxlen=self.history)).append(m)

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self._terminated[str(event.id)] = event.exception
            # bound driver memory across query churn: keep history and
            # termination records only for the most recent queries —
            # a weeks-long control plane restarting jobs accumulates
            # new query ids forever otherwise
            while len(self._terminated) > 50:
                oldest = next(iter(self._terminated))
                self._terminated.pop(oldest, None)
                self._by_query.pop(oldest, None)

    def onQueryIdle(self, event) -> None:
        pass

    # -- readers --------------------------------------------------------
    def batches(self, query_id: str) -> list[BatchMetric]:
        with self._lock:
            return list(self._by_query.get(str(query_id), ()))

    def summary(self, query_id: str) -> dict:
        """Operator-facing health summary over the retained window."""
        ms = self.batches(query_id)
        if not ms:
            return {"query_id": str(query_id), "batches": 0}
        total_rows = sum(m.num_input_rows for m in ms)
        total_ms = sum(m.batch_duration_ms for m in ms)
        last = ms[-1]
        return {
            "query_id": str(query_id),
            "batches": len(ms),
            "total_input_rows": total_rows,
            "avg_batch_duration_ms": total_ms / len(ms),
            "max_batch_duration_ms": max(m.batch_duration_ms for m in ms),
            "last_state_rows": last.state_rows,
            "last_state_bytes": last.state_bytes,
            "state_rows_trend": (
                last.state_rows - ms[0].state_rows),
            # keeping-up indicator: processed < input over the window
            # means the query is falling behind its source
            "falling_behind": (
                sum(m.input_rows_per_second for m in ms)
                > 1.10 * sum(m.processed_rows_per_second for m in ms)
                and total_rows > 0),
            "terminated_exception": self._terminated.get(str(query_id)),
        }
