"""Grid-bucketed spatial join: brute-force differential (including
negative coordinates and cell-boundary pairs), exactly-once pair
emission, and the constant 9x fan-out claim."""

from __future__ import annotations

import math
import random

from prajna_spark.operators.spatial import (
    KM_PER_DEG_LAT,
    KM_PER_DEG_LON,
    within_radius_pairs,
)


def _brute(points, r):
    out = set()
    for i, (ida, lata, lona) in enumerate(points):
        for idb, latb, lonb in points[i + 1 :]:
            dx = (lona - lonb) * KM_PER_DEG_LON
            dy = (lata - latb) * KM_PER_DEG_LAT
            if dx * dx + dy * dy <= r * r:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_matches_bruteforce(spark):
    rng = random.Random(21)
    # negative lon exercises floor() on negative scaled coords
    pts = [
        (i, 37.0 + rng.random(), -122.0 + rng.random()) for i in range(120)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = within_radius_pairs(df, "id", "lat", "lon", 10.0).collect()
    got_pairs = [(r.id_i, r.id_j) for r in got]
    assert len(got_pairs) == len(set(got_pairs))  # exactly-once emission
    assert set(got_pairs) == _brute(pts, 10.0)


def test_cross_cell_boundary_pair_found(spark):
    # two points straddling a cell boundary, closer than r: the 3x3
    # neighborhood expansion must still pair them
    r = 10.0
    lat = 37.0
    lon_a = (math.floor(0.0) * r) / KM_PER_DEG_LON  # cell edge
    pts = [(1, lat, lon_a - 0.001), (2, lat, lon_a + 0.001)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = within_radius_pairs(df, "id", "lat", "lon", r).collect()
    assert [(r_.id_i, r_.id_j) for r_ in got] == [(1, 2)]
    # and the reported distance is the planar metric
    want = 0.002 * KM_PER_DEG_LON
    assert abs(got[0].dist_km - want) < 1e-6


def test_far_points_never_pair(spark):
    pts = [(1, 37.0, -122.0), (2, 38.0, -121.0)]  # ~140 km apart
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    assert within_radius_pairs(df, "id", "lat", "lon", 10.0).count() == 0
