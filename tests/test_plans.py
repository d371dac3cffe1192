"""Tests for the genmock stats report and the validate assertion suite,
driven end-to-end from raw fixtures through enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_data_etl_spark.functions.enrich import enrich_raw
from storm_data_etl_spark.plans import validate as V
from storm_data_etl_spark.plans.enrich_queries import BASE_TS, GOLDEN_ROWS, golden_df
from storm_data_etl_spark.plans.storm_report import stats_report


@pytest.fixture(scope="module")
def enriched(spark):
    raw = golden_df(spark).withColumn("_base_ts", F.lit(BASE_TS).cast("timestamp"))
    df = enrich_raw(raw, processed_at="2024-04-27 06:00:00")
    df.cache()
    yield df
    df.unpersist()


def test_stats_report_counts(enriched):
    rep = stats_report(enriched)
    assert rep["total"].collect()[0].total == len(GOLDEN_ROWS)
    by_type = {r.event_type: r["count"] for r in rep["by_type"].collect()}
    assert by_type["hail"] == 8 and by_type["tornado"] == 5 and by_type["wind"] == 6
    assert by_type[""] == 1  # the earthquake row normalizes to ''
    assert rep["n_states"].collect()[0].n_states == 5  # TX OK NE IA SD
    top = rep["top5_states"].collect()
    assert top[0].state == "TX" and top[0]["count"] == 9


def test_stats_report_filters(enriched):
    rep = stats_report(enriched)
    assert rep["hail_plus_tornado"].collect()[0].hail_plus_tornado == 13
    assert rep["max_hail_magnitude"].collect()[0].max_hail_magnitude == 3.0
    # severe hail in TX: hail rows in TX with severity 'severe' — rid 19 is
    # SD; rid 0 is moderate; rid 4 (3.0in) is extreme; none severe → 0
    assert rep["severe_hail_tx"].collect()[0].severe_hail_tx == 0


def test_validate_phase2(spark, enriched):
    raw = golden_df(spark)
    checks = V.phase2_etl_integrity(raw, raw)
    results = V.run_all(checks)
    assert results["count_parity_by_type"]
    assert results["raw_keys_exist_in_etl"]
    assert results["magnitude_column_exclusivity"] is False  # rid 14 sets all three


def test_validate_phase3_self_compare(enriched):
    e = enriched.withColumn("_pos", F.monotonically_increasing_id())
    checks = V.phase3_api_transformation(e, e, "_pos")
    assert all(V.run_all(checks).values())


def test_validate_phase3_detects_drift(enriched):
    e = enriched.withColumn("_pos", F.monotonically_increasing_id())
    drifted = e.withColumn(
        "measurement",
        F.struct(
            (F.col("measurement.magnitude") + 1.0).alias("magnitude"),
            F.col("measurement.unit").alias("unit"),
            F.col("measurement.severity").alias("severity"),
        ),
    )
    checks = V.phase3_api_transformation(e, drifted, "_pos")
    results = V.run_all(checks)
    assert results["expected_ids_present"]
    assert results["field_compare_by_id"] is False


def test_validate_phase4(enriched):
    flat = V._flatten(enriched)
    good = flat.filter(F.col("event_type").isin("hail", "wind", "tornado"))
    results = V.run_all(V.phase4_schema_alignment(good))
    # the golden rows include zero-coord rows (rid 12) → that check fails;
    # everything else holds
    assert results["event_type_enum"]
    assert results["unit_enum"]
    assert results["severity_enum"]
    assert results["severity_iff_magnitude"]
    assert results["state_two_letters"]
    assert results["id_prefixed"]
    assert results["coords_not_both_zero"] is False


def test_validate_phase1(spark):
    a = golden_df(spark)
    checks = V.phase1_source_parity(a, a, ["rid"])
    assert all(V.run_all(checks).values())
    b = golden_df(spark).withColumn(
        "County", F.when(F.col("rid") == 3, "Tampered").otherwise(F.col("County"))
    )
    checks = V.phase1_source_parity(a, b, ["rid"])
    assert not all(V.run_all(checks).values())


def test_genmock_generate_fixtures(spark, tmp_path):
    import json

    from storm_data_etl_spark.plans.genmock import generate_fixtures, print_stats

    hail = str(tmp_path / "hail.csv")
    wind = str(tmp_path / "wind.csv")
    open(hail, "w").write(
        "Time,Size,Location,County,State,Lat,Lon,Comments\n"
        "1510,125,8 ESE Chappel,San Saba,TX,31.02,-98.44,Hail. (SJT)\n"
    )
    open(wind, "w").write(
        "Time,Speed,Location,County,State,Lat,Lon,Comments\n"
        "1245,65,Tarrant spot,Tarrant,TX,32.75,-97.33,Gusts. (FWD)\n"
    )
    etl_out = str(tmp_path / "etl.json")
    api_out = str(tmp_path / "api.json")
    raw, enriched = generate_fixtures(
        spark, {"hail": hail, "wind": wind}, etl_out, api_out
    )

    etl = json.load(open(etl_out))
    api = json.load(open(api_out))
    assert len(etl) == len(api) == 2
    assert {r["EventType"] for r in etl} == {"hail", "wind"}
    hail_rec = next(r for r in api if r["event_type"] == "hail")
    assert hail_rec["measurement"]["magnitude"] == 1.25
    assert hail_rec["measurement"]["severity"] == "moderate"
    assert hail_rec["source_office"] == "SJT"
    assert hail_rec["processed_at"].startswith("2024-04-27T06:00:00")

    stats = print_stats(enriched)
    assert stats["total"][0][0] == 2
    assert stats["tarrant_county"][0][0] == 1
