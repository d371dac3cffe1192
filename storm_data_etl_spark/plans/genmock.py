"""The genmock entry point (cmd/genmock/main.go) end to end: per-type NOAA
CSVs → raw fixture (JSON array) + enriched fixture (JSON array) + stats
report — with the frozen clock the reference uses for reproducible fixtures
(main.go:60-64: 2024-04-27T06:00:00Z; base date 2024-04-26, main.go:29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_data_etl_spark.functions.enrich import enrich_raw
from storm_data_etl_spark.plans.storm_report import stats_report
from storm_data_etl_spark.sources.csv import read_storm_csv_dir
from storm_data_etl_spark.sources.jsonio import write_json_array

DEFAULT_BASE_DATE = "2024-04-26 00:00:00"
DEFAULT_PROCESSED_AT = "2024-04-27 06:00:00"


def generate_fixtures(
    spark: SparkSession,
    csv_paths: dict[str, str],
    etl_out: str,
    api_out: str,
    base_date: str = DEFAULT_BASE_DATE,
    processed_at: str = DEFAULT_PROCESSED_AT,
) -> tuple[DataFrame, DataFrame]:
    """Read {event_type: csv_path}, write the raw (ETL) and enriched (API)
    JSON-array fixtures, and return (raw, enriched).

    Timestamp wire note: Spark emits `2024-04-26T15:10:00.000Z` where Go
    emits `2024-04-26T15:10:00Z` — same instant, cosmetic fractional
    seconds; consumers parsing RFC 3339 accept both.
    """
    raw = read_storm_csv_dir(spark, csv_paths)
    write_json_array(raw, etl_out)

    enriched = enrich_raw(
        raw.withColumn("_base_ts", F.lit(base_date).cast("timestamp")),
        processed_at=processed_at,
    )
    write_json_array(enriched, api_out)
    return raw, enriched


def print_stats(enriched: DataFrame) -> dict[str, list]:
    """Collect and print the genmock stats block ('Stats for updating test
    assertions', main.go:233-354). Returns the collected rows keyed by stat
    name for programmatic use."""
    rep = stats_report(enriched)
    out: dict[str, list] = {}
    for name in (
        "total",
        "by_type",
        "with_severity",
        "by_severity",
        "mag_175_plus",
        "by_state",
        "n_states",
        "top5_states",
        "tarrant_county",
        "severe_hail_tx",
        "hail_plus_tornado",
        "near_fort_worth",
        "max_hail_magnitude",
    ):
        rows = rep[name].collect()
        out[name] = rows
        print(f"{name}: {[tuple(r) for r in rows]}")
    return out
