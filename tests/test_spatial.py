"""Spatial operators: grid blocking losslessness, kNN exactness, haversine
sanity, and cell-density arithmetic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from storm_data_etl_spark.operators import spatial as S
from storm_data_etl_spark.plans.tables import t

RADIUS = 0.25


def _pts(spark, sf_dir):
    return S.derive_points(t(spark, sf_dir, "customer"), "c_custkey")


def test_grid_pairs_equal_cross_join(spark, sf_dir):
    """The 3×3 cell blocking finds EXACTLY the cross join's radius pairs."""
    pts = _pts(spark, sf_dir).cache()
    blocked = {
        (r.key_a, r.key_b) for r in S.grid_neighbor_pairs(pts, RADIUS).collect()
    }
    a = pts.select(
        F.col("k").alias("ka"), F.col("lat").alias("la"), F.col("lon").alias("lo_a")
    )
    b = pts.select(
        F.col("k").alias("kb"), F.col("lat").alias("lb"), F.col("lon").alias("lo_b")
    )
    d2 = S.dist_sq(F.col("la"), F.col("lo_a"), F.col("lb"), F.col("lo_b"))
    naive = {
        (r.ka, r.kb)
        for r in a.crossJoin(b)
        .where((F.col("ka") < F.col("kb")) & (d2 <= RADIUS * RADIUS))
        .collect()
    }
    assert blocked == naive
    assert len(blocked) > 0  # non-vacuous at sf0.001


def test_knn_matches_brute_force(spark, sf_dir):
    pts = _pts(spark, sf_dir).cache()
    got = {
        (r.key, r.neighbor, r.rk)
        for r in S.grid_knn(pts, k=3, radius_deg=RADIUS).collect()
    }
    rows = pts.collect()
    expect = set()
    for p in rows:
        cands = []
        for q in rows:
            if q.k == p.k:
                continue
            d2 = (p.lat - q.lat) * (p.lat - q.lat) + (p.lon - q.lon) * (p.lon - q.lon)
            if d2 <= RADIUS * RADIUS:
                cands.append((d2, q.k))
        cands.sort()
        for rk, (_, nk) in enumerate(cands[:3], start=1):
            expect.add((p.k, nk, rk))
    assert got == expect


def test_haversine_known_distances(spark):
    """1° of longitude at the equator ≈ 111.19 km; 1° of latitude anywhere
    ≈ 111.19 km; zero distance for identical points."""
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 1.0), (10.0, 20.0, 11.0, 20.0), (5.0, 5.0, 5.0, 5.0)],
        "lat_a double, lon_a double, lat_b double, lon_b double",
    )
    km = [
        r.km
        for r in df.select(
            S.haversine_km(
                F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
            ).alias("km")
        ).collect()
    ]
    one_deg = 2 * math.pi * 6371.0088 / 360
    assert abs(km[0] - one_deg) < 0.1
    assert abs(km[1] - one_deg) < 0.1
    assert km[2] == 0.0


def test_cell_density_totals(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    dens = S.cell_density(pts, RADIUS).collect()
    assert sum(r.n_points for r in dens) == pts.count()
    # every cell index is inside the derivation box /0.25
    for r in dens:
        assert 25.0 / RADIUS <= r.cx < 36.0 / RADIUS
        assert -106.0 / RADIUS <= r.cy < -93.9 / RADIUS


def test_points_in_polygon_known_points(spark):
    """Hand-placed points against the literal pentagon: centroid inside,
    far corners outside — pins the ray-cast orientation and edge math."""
    from pyspark.sql import functions as F

    from storm_data_etl_spark.plans import geo_queries as G

    # derive_points is replaced by a fixture of known coordinates
    rows = [
        (1, 30.0, -100.0),   # deep inside the pentagon
        (2, 25.1, -105.9),   # far SW, outside
        (3, 34.9, -94.1),    # far NE, outside
        (4, 27.5, -103.0),   # inside, near the west edge
    ]
    pts = spark.createDataFrame(rows, ["k", "lat", "lon"])
    orig = G._points
    G._points = lambda spark_, sf_dir_: pts  # noqa: ARG005
    try:
        out = {r.inside: r for r in G.points_in_polygon(spark, "x").collect()}
    finally:
        G._points = orig
    assert out[True].n == 2 and out[True].key_sum == 1 + 4
    assert out[False].n == 2 and out[False].key_sum == 2 + 3
