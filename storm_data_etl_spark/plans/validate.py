"""The cross-dataset validation suite (cmd/validate/main.go) as DataFrame
assertion queries — each check returns a violations DataFrame whose count
must be 0, mirroring the reference's per-phase pass/fail report.

Phases (main.go:110-151):
1. source parity      — positional row/cell compare of two raw datasets
2. ETL integrity      — count parity, key existence, magnitude exclusivity
3. API transformation — re-derived enrichment vs downstream, by-ID compare
4. schema alignment   — enum/shape/implication predicates
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storm_data_etl_spark.operators import relational as R
from storm_data_etl_spark.schema import EVENT_TYPES, SEVERITIES, UNITS


@dataclass
class CheckResult:
    name: str
    violations: DataFrame

    def passed(self) -> bool:
        return self.violations.limit(1).count() == 0


# ---------------------------------------------------------------- phase 1
def phase1_source_parity(
    source: DataFrame, collector: DataFrame, order_cols: list[str]
) -> list[CheckResult]:
    """Positional row/cell compare (J3, main.go:228-252)."""
    return [
        CheckResult("source_parity_cells", R.positional_compare(source, collector, order_cols))
    ]


# ---------------------------------------------------------------- phase 2
def phase2_etl_integrity(raw: DataFrame, etl: DataFrame) -> list[CheckResult]:
    """Raw CSV records vs the ETL fixture (main.go:258-347).

    - per-type count parity (A6)
    - every raw key (type|state|lat|lon|time) exists in ETL (J1)
    - magnitude-column exclusivity: only the type-appropriate magnitude
      column may be non-empty (main.go:316-347)
    """
    key = ["EventType", "State", "Lat", "Lon", "Time"]
    checks = [
        CheckResult("count_parity_by_type", R.count_parity(raw, etl, "EventType")),
        CheckResult("raw_keys_exist_in_etl", R.missing_keys(raw.select(*key), etl, key)),
    ]
    exclusivity = etl.filter(
        ~(
            ((F.col("EventType") == "hail") & (F.col("F_Scale") == "") & (F.col("Speed") == ""))
            | ((F.col("EventType") == "tornado") & (F.col("Size") == "") & (F.col("Speed") == ""))
            | ((F.col("EventType") == "wind") & (F.col("Size") == "") & (F.col("F_Scale") == ""))
        )
    )
    checks.append(CheckResult("magnitude_column_exclusivity", exclusivity))
    return checks


# ---------------------------------------------------------------- phase 3
def phase3_api_transformation(
    expected: DataFrame, actual: DataFrame, order_col: str = "_pos"
) -> list[CheckResult]:
    """Re-derived enrichment vs the downstream dataset (main.go:352-462):
    first-wins dedup by ID, then join by ID and compare ten fields with
    1e-9 float tolerance and null-safe equality."""
    deduped = R.first_wins_dedup(expected, ["id"], [order_col])
    flat_e = _flatten(deduped)
    flat_a = _flatten(actual)
    missing = R.missing_keys(flat_e.select("id"), flat_a, ["id"])
    mismatches = R.field_compare(
        flat_e,
        flat_a,
        "id",
        numeric_cols=["geo_lat", "geo_lon", "magnitude", "distance"],
        exact_cols=[
            "event_type",
            "unit",
            "severity",
            "location_name",
            "direction",
            "state",
            "county",
            "source_office",
        ],
        tol=1e-9,
    )
    return [
        CheckResult("expected_ids_present", missing),
        CheckResult("field_compare_by_id", mismatches),
    ]


def _flatten(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    if "geo" not in cols:
        return df
    return df.select(
        "id",
        "event_type",
        F.col("geo.lat").alias("geo_lat"),
        F.col("geo.lon").alias("geo_lon"),
        F.col("measurement.magnitude").alias("magnitude"),
        F.col("measurement.unit").alias("unit"),
        F.col("measurement.severity").alias("severity"),
        F.col("location.name").alias("location_name"),
        F.col("location.distance").alias("distance"),
        F.col("location.direction").alias("direction"),
        F.col("location.state").alias("state"),
        F.col("location.county").alias("county"),
        "source_office",
    )


# ---------------------------------------------------------------- phase 4
def phase4_schema_alignment(enriched_flat: DataFrame) -> list[CheckResult]:
    """Enum/shape/implication checks (F8/F9, main.go:467-538), each a
    count-of-violations==0 query."""

    def violated(name: str, cond: Column) -> CheckResult:
        return CheckResult(name, enriched_flat.filter(~cond))

    sev = F.col("severity")
    mag = F.col("magnitude")
    return [
        violated("event_type_enum", F.col("event_type").isin(*EVENT_TYPES)),
        violated("unit_enum", F.col("unit").isin(*UNITS)),
        violated("severity_enum", sev.isNull() | sev.isin(*SEVERITIES)),
        # implication both ways: mag>0 ⇔ severity present (valid types only)
        violated("severity_iff_magnitude", (mag > 0) == sev.isNotNull()),
        violated("state_two_letters", F.length("state") == 2),
        violated("id_prefixed", F.col("id").startswith(F.concat(F.col("event_type"), F.lit("-")))),
        violated(
            "coords_not_both_zero", ~((F.col("geo_lat") == 0) & (F.col("geo_lon") == 0))
        ),
    ]


def run_all(checks: list[CheckResult]) -> dict[str, bool]:
    """Execute every check; {name: passed}. The reference prints per-phase
    pass/fail the same way (main.go:110-151)."""
    return {c.name: c.passed() for c in checks}
