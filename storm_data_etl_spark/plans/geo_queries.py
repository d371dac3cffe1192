"""Geospatial queries: radius self-join, kNN, and cell-density heatmap over
grid-cell blocked points (`operators/spatial.py`).

The reference enriches every storm report with lat/lon
(`internal/enrich/enrich.go`, SURVEY §2.2 P2) but only consumes them as
flat bounding-box filters (F5). These queries add the spatial workloads a
100 TB report lake needs — proximity pairing, nearest-station lookup,
density maps — each expressed as an equi-join on grid-cell keys so Catalyst
plans an ordinary hash shuffle instead of a cross join.

Oracle notes: the DuckDB oracles compute the SAME pairs with a naive O(n²)
join (fine at sf0.01), which doubles as an independent proof that the grid
blocking loses nothing. All hashed floats are either bit-identical pure
arithmetic (see operators/spatial.py module doc) or integer-floored.
Radius is 0.25° — dyadic, so the squared threshold 0.0625 is an exact
double literal in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_data_etl_spark.operators import spatial as S
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t

RADIUS = 0.25  # degrees; dyadic → RADIUS² == 0.0625 exactly in both engines

_PTS_SQL = """
  SELECT c_custkey AS k,
         25.0 + (((c_custkey % 100000) * 7919) % 100000) / 10000.0   AS lat,
         -106.0 + (((c_custkey % 120000) * 104729) % 120000) / 10000.0 AS lon
  FROM customer
"""

_D2 = "(a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.derive_points(t(spark, sf_dir, "customer"), "c_custkey")


# =====================================================================
# Radius self-join via grid blocking (vs O(n²) oracle)
# =====================================================================

@register(
    "spatial_neighbor_join",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT a.k AS key_a, b.k AS key_b, {_D2} AS dist_sq
    FROM pts a JOIN pts b ON a.k < b.k
    WHERE {_D2} <= 0.0625
    """,
)
def spatial_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within 0.25° — 3×3 grid-cell equi-join, shuffle on
    cell key, output ∝ true neighbor density (never the n² cross product).
    The oracle IS the cross product, proving the blocking is lossless."""
    return S.grid_neighbor_pairs(_points(spark, sf_dir), RADIUS)


# =====================================================================
# k nearest neighbors within radius
# =====================================================================

@register(
    "spatial_knn",
    f"""
    WITH pts AS ({_PTS_SQL}),
    cand AS (
      SELECT a.k AS key, b.k AS neighbor, {_D2} AS dist_sq
      FROM pts a JOIN pts b ON a.k <> b.k
      WHERE {_D2} <= 0.0625
    )
    SELECT key, neighbor, dist_sq, rk FROM (
      SELECT key, neighbor, dist_sq,
             row_number() OVER (PARTITION BY key ORDER BY dist_sq, neighbor) AS rk
      FROM cand
    ) WHERE rk <= 5
    """,
)
def spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 nearest neighbors per point within 0.25° (nearest-station lookup).
    Grid join builds the bounded candidate set; one key-partitioned window
    ranks it. Ties broken by neighbor key for determinism."""
    return S.grid_knn(_points(spark, sf_dir), k=5, radius_deg=RADIUS)


# =====================================================================
# Cell-density heatmap
# =====================================================================

@register(
    "spatial_cell_density",
    """
    WITH pts AS (
      SELECT c_custkey AS k, c_acctbal,
             25.0 + (((c_custkey % 100000) * 7919) % 100000) / 10000.0   AS lat,
             -106.0 + (((c_custkey % 120000) * 104729) % 120000) / 10000.0 AS lon
      FROM customer
    )
    SELECT CAST(floor(lat / CAST(0.25 AS DOUBLE)) AS INT) AS cx,
           CAST(floor(lon / CAST(0.25 AS DOUBLE)) AS INT) AS cy,
           count(*) AS n_points,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS weight_sum
    FROM pts GROUP BY cx, cy
    """,
)
def spatial_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density heatmap: points + exact integer account-balance cents per
    0.25° cell. One scan → map-side partial agg → tiny cell-key shuffle.
    Weight summed as floored integer cents (double sums are order-noisy)."""
    cust = t(spark, sf_dir, "customer")
    pts = S.derive_points(cust, "c_custkey", keep=("c_acctbal",))
    weight = F.floor(F.col("c_acctbal") * F.lit(100)).cast("long")
    return S.cell_density(pts, RADIUS, weight).select(
        "cx", "cy", "n_points", F.col("weight_sum").cast("long").alias("weight_sum")
    )
