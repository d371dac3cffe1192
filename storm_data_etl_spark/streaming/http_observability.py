"""HTTP observability endpoints: /healthz, /readyz, /metrics.

Parity surface for the reference's HTTP adapter
(internal/adapter/httpadapter/server.go:20-38): a mux serving liveness,
readiness, and Prometheus metrics, so a k8s deployment of the Spark
pipeline gets the same probe contract as the Go service.

  /healthz  — 200 "ok" while the process is alive (liveness is process
              liveness, same as the reference's LivenessHandler).
  /readyz   — 503 "not ready" until the pipeline has processed its first
              input rows, then 200 "ready" (the reference's atomic
              readiness flag; here ReadinessListener.ready — see
              streaming/pipeline.py ReadinessListener).
  /metrics  — Prometheus text exposition (format spec is public:
              prometheus.io/docs/instrumenting/exposition_formats) of the
              PipelineMetricsListener snapshot, with the SAME metric names
              as the reference (internal/observability/metrics.go:20-66):
              storm_etl_messages_consumed_total, ..._produced_total,
              ..._transform_errors_total, storm_etl_pipeline_running,
              storm_etl_batch_size, storm_etl_batch_processing_duration_seconds.

stdlib-only (http.server on a daemon thread): the metrics volume is a
handful of counters per scrape, and the driver JVM is busy running Spark —
a threaded stdlib server is the right weight. The server lives on the
DRIVER; at 100 TB nothing here scales with data volume (listener state is
O(1): six counters and two fixed-bucket histograms folded from progress
events).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from storm_data_etl_spark.streaming.metrics import (
    BATCH_DURATION_BUCKETS_MS,
    BATCH_SIZE_BUCKETS,
    HIST_INF,
    MetricsSnapshot,
    PipelineMetricsListener,
)

NAMESPACE = "storm_etl"


def _fmt_float(v: float) -> str:
    """Prometheus float rendering: integral values without exponent."""
    if v == int(v):
        return str(int(v))
    return repr(v)


def _histogram_lines(
    name: str,
    help_text: str,
    hist: dict[int, int],
    bounds: tuple[int, ...],
    total_sum: float,
    scale: float = 1.0,
) -> list[str]:
    """Cumulative-bucket exposition for one histogram. ``hist`` holds
    per-bucket (non-cumulative) counts keyed by upper bound, with HIST_INF
    for overflow; Prometheus buckets are cumulative and end at +Inf."""
    lines = [f"# HELP {name} {help_text}", f"# TYPE {name} histogram"]
    cum = 0
    for b in bounds:
        cum += hist.get(b, 0)
        lines.append(f'{name}_bucket{{le="{_fmt_float(b * scale)}"}} {cum}')
    cum += hist.get(HIST_INF, 0)
    lines.append(f'{name}_bucket{{le="+Inf"}} {cum}')
    lines.append(f"{name}_sum {_fmt_float(total_sum * scale)}")
    lines.append(f"{name}_count {cum}")
    return lines


def render_prometheus(snap: MetricsSnapshot) -> str:
    """Render a MetricsSnapshot in Prometheus text exposition format with
    the reference's metric names (metrics.go:20-66)."""
    n = NAMESPACE
    lines: list[str] = []
    for metric, help_text, value in (
        (
            f"{n}_messages_consumed_total",
            "Total messages read from the source topic.",
            snap.consumed_total,
        ),
        (
            f"{n}_messages_produced_total",
            "Total messages written to the sink topic.",
            snap.produced_total,
        ),
        (
            f"{n}_transform_errors_total",
            "Total transformation failures.",
            snap.transform_errors_total,
        ),
    ):
        lines += [
            f"# HELP {metric} {help_text}",
            f"# TYPE {metric} counter",
            f"{metric} {value}",
        ]
    lines += [
        f"# HELP {n}_pipeline_running 1 when the pipeline is active, 0 when shut down.",
        f"# TYPE {n}_pipeline_running gauge",
        f"{n}_pipeline_running {1 if snap.running else 0}",
    ]
    lines += _histogram_lines(
        f"{n}_batch_size",
        "Number of messages per batch extracted from the source.",
        snap.batch_size_hist,
        BATCH_SIZE_BUCKETS,
        float(snap.batch_size_sum),
    )
    lines += _histogram_lines(
        f"{n}_batch_processing_duration_seconds",
        "Duration of a complete batch extract-transform-load cycle.",
        snap.batch_duration_hist_ms,
        BATCH_DURATION_BUCKETS_MS,
        float(snap.batch_duration_sum_ms),
        scale=0.001,
    )
    return "\n".join(lines) + "\n"


class ObservabilityServer:
    """Threaded stdlib HTTP server exposing the three probe endpoints.

    ``ready_check`` is any zero-arg callable returning truthy when the
    pipeline is ready (pass ``lambda: listener.ready`` for the streaming
    ReadinessListener, or a constant for batch jobs); ``metrics`` is the
    PipelineMetricsListener whose snapshot /metrics renders (optional —
    without it /metrics serves an all-zero snapshot, matching a freshly
    registered Prometheus registry).
    """

    def __init__(
        self,
        ready_check: Callable[[], bool],
        metrics: PipelineMetricsListener | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self._ready_check = ready_check
        self._metrics = metrics
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, body: str, ctype: str) -> None:
                data = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:  # noqa: N802 (stdlib handler name)
                path = self.path.split("?", 1)[0]
                if path == "/healthz":
                    self._send(200, "ok", "text/plain; charset=utf-8")
                elif path == "/readyz":
                    try:
                        ready = bool(outer._ready_check())
                    except Exception:  # a broken probe is "not ready", not a 500
                        ready = False
                    if ready:
                        self._send(200, "ready", "text/plain; charset=utf-8")
                    else:
                        self._send(503, "not ready", "text/plain; charset=utf-8")
                elif path == "/metrics":
                    snap = (
                        outer._metrics.snapshot()
                        if outer._metrics is not None
                        else MetricsSnapshot()
                    )
                    self._send(
                        200,
                        render_prometheus(snap),
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                else:
                    self._send(404, "not found", "text/plain; charset=utf-8")

            def log_message(self, fmt: str, *args) -> None:  # silence stdlib
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "ObservabilityServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="observability-http", daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
