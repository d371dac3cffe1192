"""End-to-end tests of the CLI entry points (cmd/etl, cmd/genmock,
cmd/validate parity): genmock writes fixtures a subsequent validate run
accepts; the streaming etl subcommand enriches a file-source envelope dir.

The CLI functions are driven in-process (same SparkSession) — subprocess
invocation would only add JVM startup per test.
"""

from __future__ import annotations

import json

import pytest

from storm_data_etl_spark.cli import main

HAIL_CSV = (
    "Time,Size,Location,County,State,Lat,Lon,Comments\n"
    "1510,125,8 ESE Chappel,San Saba,TX,31.02,-98.44,Hail. (SJT)\n"
    "1600,200,5 N Alpine,Brewster,TX,30.42,-103.66,Large hail. (MAF)\n"
)
WIND_CSV = (
    "Time,Speed,Location,County,State,Lat,Lon,Comments\n"
    "1245,65,Tarrant spot,Tarrant,TX,32.75,-97.33,Gusts. (FWD)\n"
)


def test_cli_genmock_then_validate(spark, tmp_path, capsys):
    hail, wind = str(tmp_path / "h.csv"), str(tmp_path / "w.csv")
    open(hail, "w").write(HAIL_CSV)
    open(wind, "w").write(WIND_CSV)
    etl_out, api_out = str(tmp_path / "etl.json"), str(tmp_path / "api.json")

    rc = main(
        [
            "genmock",
            "--hail", hail,
            "--wind", wind,
            "--etl-out", etl_out,
            "--api-out", api_out,
        ]
    )
    assert rc == 0
    assert len(json.load(open(etl_out))) == 3

    rc = main(["validate", "--raw", etl_out, "--api", api_out])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ALL CHECKS PASSED" in out

    # drift detection: corrupt one enriched magnitude → validate must fail
    api = json.load(open(api_out))
    api[0]["measurement"]["magnitude"] = 99.0
    json.dump(api, open(api_out, "w"))
    rc = main(["validate", "--raw", etl_out, "--api", api_out])
    out = capsys.readouterr().out
    assert rc == 1 and "FAIL" in out


def test_cli_etl_file_mode(spark, tmp_path):
    src = tmp_path / "envelopes"
    src.mkdir()
    record = {
        "Time": "1510", "Size": "125", "F_Scale": "", "Speed": "",
        "Location": "8 ESE Chappel", "County": "San Saba", "State": "TX",
        "Lat": "31.02", "Lon": "-98.44", "Comments": "Hail. (SJT)",
        "EventType": "hail",
    }
    envelope = {
        "key": None,
        "value": json.dumps(record).encode().decode(),
        "topic": "storm.raw",
        "partition": 0,
        "offset": 0,
        "timestamp": "2024-04-26T00:00:00.000Z",
    }
    (src / "batch0.json").write_text(json.dumps(envelope))
    out = str(tmp_path / "enriched")

    rc = main(
        [
            "etl",
            "--source-json", str(src),
            "--out", out,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--timeout", "25",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    row = got.collect()[0]
    assert row.event_type == "hail"
    assert abs(row.measurement.magnitude - 1.25) < 1e-9
    assert row.source_office == "SJT"


def test_cli_list(capsys):
    from storm_data_etl_spark.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out and "oracle-backed" in out


def test_cli_explain_unknown(capsys):
    from storm_data_etl_spark.cli import main

    assert main(["explain", "no_such_query"]) == 2


def test_parse_http_addr_honors_host():
    """HTTP_ADDR host part reaches the bind address (Go net.Listen
    semantics): loopback intent must not widen to all interfaces."""
    from storm_data_etl_spark.cli import _parse_http_addr

    assert _parse_http_addr(":8080") == ("0.0.0.0", 8080)
    assert _parse_http_addr("127.0.0.1:8080") == ("127.0.0.1", 8080)
    assert _parse_http_addr("[::1]:9000") == ("::1", 9000)
    for bad in ("localhost", "::1", "host:"):
        with pytest.raises(SystemExit):
            _parse_http_addr(bad)


def test_cli_etl_http_observability(spark, tmp_path, monkeypatch):
    """--http-port 0 serves the reference's probe surface during an etl
    run: healthz live from start, readyz flipping 503→200 once the stream
    has processed rows, metrics exposing the pipeline counters."""
    import threading
    import time
    import urllib.error
    import urllib.request

    from storm_data_etl_spark.streaming import http_observability as HO

    created: list = []
    real_cls = HO.ObservabilityServer

    class Recording(real_cls):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            created.append(self)

    monkeypatch.setattr(HO, "ObservabilityServer", Recording)

    src = tmp_path / "envelopes"
    src.mkdir()
    record = {
        "Time": "1510", "Size": "125", "F_Scale": "", "Speed": "",
        "Location": "8 ESE Chappel", "County": "San Saba", "State": "TX",
        "Lat": "31.02", "Lon": "-98.44", "Comments": "Hail. (SJT)",
        "EventType": "hail",
    }
    envelope = {
        "key": None,
        "value": json.dumps(record).encode().decode(),
        "topic": "storm.raw",
        "partition": 0,
        "offset": 0,
        "timestamp": "2024-04-26T00:00:00.000Z",
    }
    (src / "batch0.json").write_text(json.dumps(envelope))

    def _get(url):
        try:
            with urllib.request.urlopen(url, timeout=3) as r:
                return r.status, r.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    probes: dict = {}

    def probe():
        deadline = time.time() + 30
        while not created and time.time() < deadline:
            time.sleep(0.1)
        if not created:
            return
        base = f"http://127.0.0.1:{created[0].port}"
        probes["healthz"] = _get(f"{base}/healthz")
        # poll readyz until it flips (the stream needs a batch or two)
        while time.time() < deadline:
            code, _ = _get(f"{base}/readyz")
            if code == 200:
                probes["readyz"] = code
                break
            time.sleep(0.3)
        # then wait until the produced counter lands in /metrics
        while time.time() < deadline:
            _, body = _get(f"{base}/metrics")
            if "storm_etl_messages_produced_total 1" in body:
                probes["metrics"] = body
                break
            time.sleep(0.3)

    watcher = threading.Thread(target=probe, daemon=True)
    watcher.start()
    rc = main(
        [
            "etl",
            "--source-json", str(src),
            "--out", str(tmp_path / "enriched"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--timeout", "25",
            "--http-port", "0",
        ]
    )
    watcher.join(timeout=10)
    assert rc == 0
    assert created, "ObservabilityServer was never constructed"
    assert probes.get("healthz", (None,))[0] == 200
    assert probes.get("readyz") == 200
    body = probes.get("metrics", "")
    assert "storm_etl_messages_produced_total 1" in body
    assert "storm_etl_transform_errors_total 0" in body
