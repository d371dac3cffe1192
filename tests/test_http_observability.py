"""HTTP observability endpoints (/healthz /readyz /metrics): unit tests on
the exposition renderer + server, and an end-to-end probe of all three
endpoints during a LIVE file-source streaming query — the Spark analog of
the reference's HTTP adapter tests (httpadapter/server.go:34-36,
observability/metrics.go:20-66)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

from storm_data_etl_spark.streaming.http_observability import (
    ObservabilityServer,
    render_prometheus,
)
from storm_data_etl_spark.streaming.metrics import (
    HIST_INF,
    MetricsSnapshot,
    PipelineMetricsListener,
)
from storm_data_etl_spark.streaming.pipeline import ReadinessListener, run_pipeline

#: every metric name the reference registers (metrics.go:20-66), namespaced
REF_METRIC_NAMES = [
    "storm_etl_messages_consumed_total",
    "storm_etl_messages_produced_total",
    "storm_etl_transform_errors_total",
    "storm_etl_pipeline_running",
    "storm_etl_batch_size",
    "storm_etl_batch_processing_duration_seconds",
]


def _get(url: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(url, timeout=5) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_render_prometheus_names_and_math():
    snap = MetricsSnapshot(
        consumed_total=271,
        produced_total=268,
        transform_errors_total=3,
        running=True,
        batches=4,
        batch_size_hist={5: 1, 100: 2, HIST_INF: 1},
        batch_duration_hist_ms={100: 3, HIST_INF: 1},
        batch_size_sum=350,
        batch_duration_sum_ms=2500,
    )
    text = render_prometheus(snap)
    for name in REF_METRIC_NAMES:
        assert f"# TYPE {name} " in text, name
    assert "storm_etl_messages_consumed_total 271" in text
    assert "storm_etl_messages_produced_total 268" in text
    assert "storm_etl_transform_errors_total 3" in text
    assert "storm_etl_pipeline_running 1" in text
    # histogram buckets are CUMULATIVE and conserve _count through +Inf
    assert 'storm_etl_batch_size_bucket{le="5"} 1' in text
    assert 'storm_etl_batch_size_bucket{le="100"} 3' in text
    assert 'storm_etl_batch_size_bucket{le="+Inf"} 4' in text
    assert "storm_etl_batch_size_sum 350" in text
    assert "storm_etl_batch_size_count 4" in text
    # durations expose in SECONDS (reference buckets 0.01..10s); ours are ms
    assert (
        'storm_etl_batch_processing_duration_seconds_bucket{le="0.1"} 3' in text
    )
    assert "storm_etl_batch_processing_duration_seconds_sum 2.5" in text
    assert "storm_etl_batch_processing_duration_seconds_count 4" in text


def test_histogram_buckets_match_reference_exactly():
    """Bucket BOUNDS, not just metric names, must line up with the Go
    service (internal/observability/metrics.go:46,52) so dashboards built
    for its bucket series keep working: sizes {1,5,10,20,30,40,50,75,100},
    durations {0.01,0.05,0.1,0.5,1,2.5,5,10}s (held here in ms)."""
    from storm_data_etl_spark.streaming.metrics import (
        BATCH_DURATION_BUCKETS_MS,
        BATCH_SIZE_BUCKETS,
    )

    assert BATCH_SIZE_BUCKETS == (1, 5, 10, 20, 30, 40, 50, 75, 100)
    assert tuple(ms / 1000 for ms in BATCH_DURATION_BUCKETS_MS) == (
        0.01, 0.05, 0.1, 0.5, 1, 2.5, 5, 10,
    )


def test_server_endpoints_without_spark():
    ready = {"v": False}
    srv = ObservabilityServer(lambda: ready["v"]).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        assert _get(f"{base}/healthz") == (200, "ok")
        code, body = _get(f"{base}/readyz")
        assert (code, body) == (503, "not ready")
        ready["v"] = True
        assert _get(f"{base}/readyz") == (200, "ready")
        code, body = _get(f"{base}/metrics")
        assert code == 200
        # no listener attached → all-zero fresh-registry exposition
        assert "storm_etl_messages_consumed_total 0" in body
        assert "storm_etl_pipeline_running 0" in body
        assert _get(f"{base}/nope")[0] == 404
    finally:
        srv.shutdown()


def test_server_broken_ready_check_is_not_ready_not_500():
    def boom() -> bool:
        raise RuntimeError("probe broke")

    srv = ObservabilityServer(boom).start()
    try:
        assert _get(f"http://127.0.0.1:{srv.port}/readyz")[0] == 503
    finally:
        srv.shutdown()


GOOD = {
    "Time": "1510", "Size": "125", "F_Scale": "", "Speed": "",
    "Location": "8 ESE Chappel", "County": "San Saba", "State": "TX",
    "Lat": "31.02", "Lon": "-98.44", "Comments": "Hail. (SJT)", "EventType": "hail",
}


def test_endpoints_during_live_stream(spark, tmp_path):
    """The reference deployment contract end-to-end: /readyz serves 503
    before the pipeline has processed input, flips to 200 after the first
    batch, and /metrics exposes the reference's counters with values that
    reconcile against what the stream actually did (2 good, 1 poison)."""
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)

    listener = ReadinessListener()
    metrics = PipelineMetricsListener()
    srv = ObservabilityServer(lambda: listener.ready, metrics=metrics).start()
    base = f"http://127.0.0.1:{srv.port}"
    spark.streams.addListener(listener)
    spark.streams.addListener(metrics)
    try:
        # pre-stream: alive but not ready (k8s would hold traffic)
        assert _get(f"{base}/healthz")[0] == 200
        assert _get(f"{base}/readyz")[0] == 503

        with open(os.path.join(src_dir, "batch0.json"), "w") as f:
            for i, payload in enumerate(
                [json.dumps(GOOD), "not-json{{{", json.dumps(GOOD)]
            ):
                f.write(
                    json.dumps(
                        {
                            "value": payload,
                            "topic": "t",
                            "partition": 0,
                            "offset": i,
                            "timestamp": "2024-04-26T00:00:00.000Z",
                        }
                    )
                    + "\n"
                )
        stream_schema = (
            "value string, topic string, partition int, offset long,"
            " timestamp timestamp"
        )
        envelope = spark.readStream.schema(stream_schema).json(src_dir)
        sunk: list = []
        q = run_pipeline(
            spark,
            envelope,
            checkpoint_dir=str(tmp_path / "ckpt"),
            sink=lambda df, _e: sunk.extend(df.collect()),
            processed_at="2024-04-27 06:00:00",
            metrics=metrics,
        )
        try:
            q.processAllAvailable()
            # listener events are delivered async: wait for readiness and
            # the progress-event counters to land
            import time

            deadline = time.time() + 15
            while time.time() < deadline and (
                not listener.ready or metrics.snapshot().consumed_total < 3
            ):
                time.sleep(0.2)

            assert _get(f"{base}/readyz") == (200, "ready")
            code, body = _get(f"{base}/metrics")
            assert code == 200
            assert "storm_etl_pipeline_running 1" in body
            # in-loop counters (produced/errors) are synchronous in
            # foreachBatch; consumed comes from progress events
            assert "storm_etl_messages_produced_total 2" in body
            assert "storm_etl_transform_errors_total 1" in body
            consumed = next(
                int(line.rsplit(" ", 1)[1])
                for line in body.splitlines()
                if line.startswith("storm_etl_messages_consumed_total ")
            )
            assert consumed >= 3
            assert len(sunk) == 2
        finally:
            q.stop()
        # gauge drops when the query terminates (event is async)
        import time

        deadline = time.time() + 15
        while time.time() < deadline and metrics.snapshot().running:
            time.sleep(0.2)
        assert "storm_etl_pipeline_running 0" in _get(f"{base}/metrics")[1]
    finally:
        spark.streams.removeListener(listener)
        spark.streams.removeListener(metrics)
        srv.shutdown()
