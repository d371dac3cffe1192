"""The genmock analytics report (cmd/genmock/main.go:194-354) as one
multi-query plan over an enriched storm-event DataFrame.

Every number genmock prints ("Stats for updating test assertions") comes out
of `stats_report`, computed with the generic operators — this is the
reference's entire ad-hoc analytics surface in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storm_data_etl_spark.operators import relational as R


def stats_report(enriched: DataFrame, order_col: str = "id") -> dict[str, DataFrame]:
    """All genmock stats as named DataFrames (collect whichever you need).

    ``order_col`` supplies the explicit total order for 'first hail record'
    — genmock uses file position; callers with an offset/position column
    should pass it (IDs are a stable fallback, not file order).
    """
    sev = F.col("measurement.severity")
    mag = F.col("measurement.magnitude")

    return {
        # Total + by type (main.go:237-239)
        "total": enriched.agg(F.count(F.lit(1)).alias("total")),
        "by_type": R.grouped_counts(enriched, "event_type"),
        # With severity + by severity (main.go:240-243)
        "with_severity": R.conditional_count(enriched, sev.isNotNull(), "with_severity"),
        "by_severity": R.grouped_counts(enriched.filter(sev.isNotNull()), sev.alias("severity")),
        # Magnitude >= 1.75 (main.go:244)
        "mag_175_plus": R.conditional_count(enriched, mag >= 1.75, "mag_175_plus"),
        # States + county breakdown (main.go:252-281)
        "by_state": R.grouped_counts(enriched, F.col("location.state").alias("state")),
        "by_state_county": R.grouped_counts(
            enriched,
            F.col("location.state").alias("state"),
            F.col("location.county").alias("county"),
        ),
        "n_states": R.distinct_count(enriched, "location.state", "n_states"),
        "top5_states": R.top_n(
            R.grouped_counts(enriched, F.col("location.state").alias("state")),
            [F.desc("count"), F.asc("state")],
            5,
        ),
        # Filter combos (main.go:283-302)
        "tarrant_county": R.conditional_count(
            enriched, F.col("location.county") == "Tarrant", "tarrant_county"
        ),
        "severe_hail_tx": R.conditional_count(
            enriched,
            (F.col("event_type") == "hail")
            & (F.col("location.state") == "TX")
            & (sev == "severe"),
            "severe_hail_tx",
        ),
        "hail_plus_tornado": R.conditional_count(
            enriched, F.col("event_type").isin("hail", "tornado"), "hail_plus_tornado"
        ),
        # Geo filter near Fort Worth (main.go:304-322)
        "near_fort_worth": R.bounding_box(
            enriched, F.col("geo.lat"), F.col("geo.lon"), 32.75, -97.15, 0.75
        ).agg(F.count(F.lit(1)).alias("near_fort_worth")),
        # First hail record + max hail magnitude (main.go:324-354)
        "first_hail": R.first_per_group(
            enriched.filter(F.col("event_type") == "hail").withColumn("_g", F.lit(1)),
            ["_g"],
            [order_col],
        ).drop("_g"),
        "max_hail_magnitude": R.global_max(
            enriched.filter(F.col("event_type") == "hail"),
            mag,
            "max_hail_magnitude",
        ),
    }
