"""Geospatial operators: grid-cell blocked neighbor joins over point sets.

The reference carries lat/lon on every enriched storm report
(`internal/enrich/enrich.go` Latitude/Longitude fields) but only ever
filters them as flat numbers (bounding box, SURVEY §2.3 F5). This module
adds the spatial operations a lake-scale pipeline actually needs on those
columns: radius self-joins ("which reports are near each other"), k-nearest
neighbors, and cell-density aggregation — without ever forming the O(n²)
cross product.

Scale design (the whole point):
- A naive radius self-join is a cross join — 100 TB in, heat death out.
  Instead each point is assigned to a square grid cell of side == the
  search radius; a pair within radius r can differ by at most one cell
  index on each axis, so probing the 3×3 cell neighborhood finds EXACTLY
  the same pairs as the cross join (proved by `tests/test_spatial.py`
  equivalence test). The join becomes an equi-join on (cell_x, cell_y) —
  hash-shuffle both sides on the cell key, each task sees only its cells'
  points. Output work is proportional to true neighbor density, not n².
- The 3× explode lives on ONE side only (each left point probes 9 cells;
  right side stays 1 row/point), so shuffle volume is 9n + n rows, not n².
- Distance math is pure +,-,* arithmetic on doubles (squared Euclidean in
  degree space), which is bit-identical across engines — the DuckDB oracle
  reproduces the exact doubles. `haversine_km` (great-circle) is provided
  for real-world distances and unit-tested against an independent model;
  it stays out of oracle-hashed columns because libm sin/cos aren't
  IEEE-pinned across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Grid cell side in degrees == default search radius (see module doc:
#: cell side must be >= radius for 3x3 completeness).
DEFAULT_RADIUS_DEG = 0.2

_EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def derive_points(df: DataFrame, key_col: str, keep: tuple[str, ...] = ()) -> DataFrame:
    """Deterministic synthetic coordinates from an integer key.

    The shared testdata has no lat/lon columns, so spatial queries derive
    them as a pure function of the key: integer LCG-style scramble into a
    [25,35) x [-106,-94) box (the reference's own storm-report region —
    cmd/genmock generates the same bounding box). All-integer arithmetic
    until one exact IEEE division, so Spark and DuckDB produce
    bit-identical doubles. The inner `key % m` keeps the product far from
    int64 overflow at any key magnitude (ANSI mode throws on overflow).
    """
    k = F.col(key_col)
    lat = F.lit(25.0) + ((k % 100000) * 7919 % 100000) / F.lit(10000.0)
    lon = F.lit(-106.0) + ((k % 120000) * 104729 % 120000) / F.lit(10000.0)
    return df.select(k.alias("k"), lat.alias("lat"), lon.alias("lon"), *keep)


def with_cells(points: DataFrame, cell_deg: float) -> DataFrame:
    """Annotate (k, lat, lon) points with integer grid-cell coordinates."""
    return points.withColumns(
        {
            "cx": F.floor(F.col("lat") / F.lit(cell_deg)).cast("int"),
            "cy": F.floor(F.col("lon") / F.lit(cell_deg)).cast("int"),
        }
    )


def dist_sq(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Squared Euclidean distance in degree space — pure IEEE +,-,* (order
    fixed left-to-right), so oracle-reproducible bit-for-bit."""
    dlat = lat_a - lat_b
    dlon = lon_a - lon_b
    return dlat * dlat + dlon * dlon


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km (haversine formula), all JVM-side trig.

    For ranking/thresholding real coordinates; not used in oracle-hashed
    output columns (libm trig differs in final ulp across engines).
    """
    phi_a, phi_b = F.radians(lat_a), F.radians(lat_b)
    dphi = F.radians(lat_b - lat_a)
    dlam = F.radians(lon_b - lon_a)
    h = F.pow(F.sin(dphi / 2), 2) + F.cos(phi_a) * F.cos(phi_b) * F.pow(
        F.sin(dlam / 2), 2
    )
    return F.lit(2.0 * _EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def grid_neighbor_pairs(
    points: DataFrame, radius_deg: float = DEFAULT_RADIUS_DEG
) -> DataFrame:
    """All point pairs (k_a < k_b) within `radius_deg` (Euclidean in degree
    space), via 3×3 grid-cell blocking — equivalent to the cross join,
    without materializing it.

    Returns (key_a, key_b, dist_sq) with dist_sq <= radius².
    """
    pts = with_cells(points, radius_deg)
    # Left side probes its 9-cell neighborhood; each neighbor cell is a
    # distinct (dx,dy), so a true pair matches exactly once — no dedup.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = (
        pts.withColumn("o", F.explode(offsets))
        .select(
            F.col("k").alias("ka"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cx") + F.col("o.dx")).alias("nx"),
            (F.col("cy") + F.col("o.dy")).alias("ny"),
        )
    )
    right = pts.select(
        F.col("k").alias("kb"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cx",
        "cy",
    )
    d2 = dist_sq(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    return (
        left.join(
            right,
            (left.nx == right.cx) & (left.ny == right.cy) & (left.ka < right.kb),
        )
        .where(d2 <= F.lit(radius_deg * radius_deg))
        .select(
            F.col("ka").alias("key_a"),
            F.col("kb").alias("key_b"),
            d2.alias("dist_sq"),
        )
    )


def grid_knn(
    points: DataFrame, k: int = 5, radius_deg: float = DEFAULT_RADIUS_DEG
) -> DataFrame:
    """k nearest neighbors of each point *within radius_deg* (both
    directions, excluding self), rank ties broken by neighbor key.

    "Within radius" makes grid blocking exact: every candidate at distance
    <= radius is inside the 3×3 neighborhood, so the per-point top-k over
    those candidates equals the top-k over the full cross join restricted
    to the radius. One cell-key shuffle + one key-partitioned window.
    """
    pts = with_cells(points, radius_deg)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.withColumn("o", F.explode(offsets)).select(
        F.col("k").alias("key"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("o.dx")).alias("nx"),
        (F.col("cy") + F.col("o.dy")).alias("ny"),
    )
    right = pts.select(
        F.col("k").alias("nk"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cx",
        "cy",
    )
    d2 = dist_sq(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    cands = (
        left.join(
            right,
            (left.nx == right.cx) & (left.ny == right.cy) & (left.key != right.nk),
        )
        .where(d2 <= F.lit(radius_deg * radius_deg))
        .select("key", F.col("nk").alias("neighbor"), d2.alias("dist_sq"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("dist_sq", "neighbor")
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("key", "neighbor", "dist_sq", "rk")
    )


def cell_density(points: DataFrame, cell_deg: float, weight: Column | None = None) -> DataFrame:
    """Grid-cell density heatmap: points per cell (+ optional exact integer
    weight sum). One scan, map-side partial agg, tiny shuffle on cell key."""
    pts = with_cells(points, cell_deg)
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if weight is not None:
        aggs.append(F.sum(weight).alias("weight_sum"))
    return pts.groupBy("cx", "cy").agg(*aggs)
