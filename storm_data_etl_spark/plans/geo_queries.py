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


# =====================================================================
# Point-in-polygon (ray casting) — containment, the third classic
# spatial primitive after proximity and density
# =====================================================================

#: closed ring, (lat, lon) vertices — dyadic-friendly literals
_POLY = [
    (27.0, -104.0),
    (33.0, -103.0),
    (34.0, -98.0),
    (29.0, -95.0),
    (26.0, -100.0),
]
_EDGES = [(_POLY[i], _POLY[(i + 1) % len(_POLY)]) for i in range(len(_POLY))]


def _sql_crossings() -> str:
    """The unrolled crossing-number sum — one CASE term per polygon edge,
    the exact same arithmetic the Spark fold evaluates."""
    terms = []
    for (x1, y1), (x2, y2) in _EDGES:
        terms.append(
            f"(CASE WHEN ((({y1!r} > lon) <> ({y2!r} > lon)) AND "
            f"lat < ({x2!r} - {x1!r}) * (lon - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r}) "
            f"THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "points_in_polygon",
    f"""
    WITH pts AS ({_PTS_SQL}),
    flagged AS (
      SELECT k, ({_sql_crossings()}) % 2 = 1 AS inside
      FROM pts
    )
    SELECT inside, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
    FROM flagged GROUP BY inside
    """,
)
def points_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment via the crossing-number (ray-cast)
    test: a point is inside when a horizontal ray crosses the boundary an
    odd number of times. The polygon travels as a literal edge array and
    the test is ONE aggregate fold over it per point — constant per-row
    work, no shuffle until the final 2-row count, so a 100 TB point table
    streams through a narrow projection (many-polygon workloads broadcast
    the polygon table and explode, or pre-block with the same grid keys
    as the proximity joins). The oracle unrolls the identical per-edge
    arithmetic, so both engines evaluate the same IEEE ops."""
    pts = _points(spark, sf_dir)
    edges = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for (x1, y1), (x2, y2) in _EDGES
        ]
    )
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > F.col("lon")) != (e["y2"] > F.col("lon")))
            & (
                F.col("lat")
                < (e["x2"] - e["x1"]) * (F.col("lon") - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        pts.select(F.col("k"), (crossings % 2 == 1).alias("inside"))
        .groupBy("inside")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("key_sum"))
    )
