"""End-to-end tests of the CLI entry points (cmd/etl, cmd/genmock,
cmd/validate parity): genmock writes fixtures a subsequent validate run
accepts; the streaming etl subcommand enriches a file-source envelope dir.

The CLI functions are driven in-process (same SparkSession) — subprocess
invocation would only add JVM startup per test.
"""

from __future__ import annotations

import json

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
