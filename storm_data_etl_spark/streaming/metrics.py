"""Pipeline observability (ST7): counters/gauges/histograms from streaming
progress events — the Spark analog of the reference's Prometheus metrics
(internal/observability/metrics.go:20-66):

  messages_consumed_total   → cumulative numInputRows
  messages_produced_total   → cumulative sink rows (reported by foreachBatch)
  transform_errors_total    → dead-letter counts (reported by foreachBatch)
  pipeline_running          → query active gauge
  batch_size / duration     → per-progress histograms

Export to Prometheus by scraping `snapshot()` from any HTTP layer; the
listener itself stays transport-agnostic, like the reference's metrics
struct behind its /metrics handler.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

#: histogram bucket bounds mirroring the reference exactly — sizes from
#: metrics.go:46, durations from metrics.go:52's seconds ×1000 to ms —
#: so dashboards/alerts keyed to the Go service's bucket series line up
#: name-for-name AND bound-for-bound on /metrics.
BATCH_SIZE_BUCKETS = (1, 5, 10, 20, 30, 40, 50, 75, 100)
BATCH_DURATION_BUCKETS_MS = (10, 50, 100, 500, 1000, 2500, 5000, 10000)


#: overflow pseudo-bound for observations above the top bucket (Prometheus
#: +Inf bucket; exposition needs it so histogram _count is conserved)
HIST_INF = -1


@dataclass
class MetricsSnapshot:
    consumed_total: int = 0
    produced_total: int = 0
    transform_errors_total: int = 0
    running: bool = False
    batches: int = 0
    batch_size_hist: dict[int, int] = field(default_factory=dict)
    batch_duration_hist_ms: dict[int, int] = field(default_factory=dict)
    batch_size_sum: int = 0
    batch_duration_sum_ms: int = 0


class PipelineMetricsListener(StreamingQueryListener):
    """Collects ST7 metrics from query progress; foreachBatch sinks report
    produced/error counts via `record_produced` / `record_transform_errors`
    (progress events can't see inside foreachBatch)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._m = MetricsSnapshot()

    # -- called by the streaming engine ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        with self._lock:
            self._m.running = True

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rows = p.numInputRows
        duration = (p.durationMs or {}).get("triggerExecution", 0)
        with self._lock:
            self._m.consumed_total += rows
            self._m.batches += 1
            self._m.batch_size_sum += rows
            self._m.batch_duration_sum_ms += duration
            for b in BATCH_SIZE_BUCKETS:
                if rows <= b:
                    self._m.batch_size_hist[b] = self._m.batch_size_hist.get(b, 0) + 1
                    break
            else:  # above the top bound → +Inf overflow bucket
                self._m.batch_size_hist[HIST_INF] = (
                    self._m.batch_size_hist.get(HIST_INF, 0) + 1
                )
            for b in BATCH_DURATION_BUCKETS_MS:
                if duration <= b:
                    self._m.batch_duration_hist_ms[b] = (
                        self._m.batch_duration_hist_ms.get(b, 0) + 1
                    )
                    break
            else:
                self._m.batch_duration_hist_ms[HIST_INF] = (
                    self._m.batch_duration_hist_ms.get(HIST_INF, 0) + 1
                )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self._m.running = False

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- called by foreachBatch sinks ------------------------------------
    def record_produced(self, n: int) -> None:
        with self._lock:
            self._m.produced_total += n

    def record_transform_errors(self, n: int) -> None:
        with self._lock:
            self._m.transform_errors_total += n

    def snapshot(self) -> MetricsSnapshot:
        with self._lock:
            return MetricsSnapshot(
                consumed_total=self._m.consumed_total,
                produced_total=self._m.produced_total,
                transform_errors_total=self._m.transform_errors_total,
                running=self._m.running,
                batches=self._m.batches,
                batch_size_hist=dict(self._m.batch_size_hist),
                batch_duration_hist_ms=dict(self._m.batch_duration_hist_ms),
                batch_size_sum=self._m.batch_size_sum,
                batch_duration_sum_ms=self._m.batch_duration_sum_ms,
            )
