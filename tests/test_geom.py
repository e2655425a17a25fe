"""Kernel tests for geometry (SURVEY.md §5.2-1, §8.1) — numpy kernels vs
brute-force / analytic oracles on seeded random data."""

import numpy as np

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import geom


def _square(lat0, lon0, dlat, dlon):
    """Closed CCW square ring."""
    lats = np.array([lat0, lat0, lat0 + dlat, lat0 + dlat, lat0])
    lons = np.array([lon0, lon0 + dlon, lon0 + dlon, lon0, lon0])
    return lats, lons


def _pip_oracle(plat, plon, rlat, rlon):
    """Independent scalar winding-free even-odd PIP with boundary=inside,
    ray cast along +lon (different axis than the kernel — same answer)."""
    inside = False
    n = len(rlat) - 1
    for i in range(n):
        y1, x1, y2, x2 = rlat[i], rlon[i], rlat[i + 1], rlon[i + 1]
        # boundary check
        cross = (plon - x1) * (y2 - y1) - (plat - y1) * (x2 - x1)
        if abs(cross) <= 1e-12 and min(x1, x2) - 1e-12 <= plon <= max(x1, x2) + 1e-12 \
                and min(y1, y2) - 1e-12 <= plat <= max(y1, y2) + 1e-12:
            return True
        if (y1 <= plat < y2) or (y2 <= plat < y1):
            t = (plat - y1) / (y2 - y1)
            if x1 + t * (x2 - x1) > plon:
                inside = not inside
    return inside


def test_pip_square_basic():
    rlat, rlon = _square(34.85, -82.40, 0.001, 0.001)
    plat = np.array([34.8505, 34.852, 34.85, 34.8500, 34.85049999])
    plon = np.array([-82.3995, -82.3995, -82.40, -82.3990, -82.39950001])
    got = geom.points_in_ring(plat, plon, rlat, rlon)
    assert got.tolist() == [True, False, True, True, True]  # interior, outside, vertex, edge, interior


def test_pip_vs_oracle_random_polygons():
    rng = np.random.default_rng(42)
    for trial in range(30):
        # random star-shaped polygon around a center
        k = rng.integers(3, 12)
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        radii = rng.uniform(0.0005, 0.003, k)
        clat, clon = 34.85 + rng.uniform(-0.1, 0.1), -82.4 + rng.uniform(-0.1, 0.1)
        rlat = np.append(clat + radii * np.sin(angles), clat + radii[0] * np.sin(angles[0]))
        rlon = np.append(clon + radii * np.cos(angles), clon + radii[0] * np.cos(angles[0]))
        plat = clat + rng.uniform(-0.004, 0.004, 200)
        plon = clon + rng.uniform(-0.004, 0.004, 200)
        got = geom.points_in_ring(plat, plon, rlat, rlon)
        want = np.array([_pip_oracle(plat[i], plon[i], rlat, rlon) for i in range(200)])
        assert (got == want).all(), f"trial {trial}"


def test_haversine_known_value():
    # 1 degree of latitude ~ 111.195 km at R=6371008.8
    d = geom.haversine_m(np.array([34.0]), np.array([-82.0]), np.array([35.0]), np.array([-82.0]))
    assert abs(d[0] - config.DEG_TO_M) < 1.0


def test_point_to_ring_dist_analytic():
    rlat, rlon = _square(34.85, -82.40, 0.001, 0.001)
    # point due west of the square's west edge by 0.001 deg lon
    plat = np.array([34.8505])
    plon = np.array([-82.401])
    d = geom.point_to_ring_dist_m(plat, plon, rlat, rlon)
    expected = 0.001 * config.DEG_TO_M * np.cos(np.radians(34.8505))
    assert abs(d[0] - expected) < 0.05
    # a point on the ring has distance 0
    d0 = geom.point_to_ring_dist_m(np.array([34.85]), np.array([-82.40]), rlat, rlon)
    assert d0[0] < 1e-9


def test_ring_area_and_centroid():
    rlat, rlon = _square(34.85, -82.40, 0.001, 0.001)
    a = geom.ring_area_m2(rlat, rlon)
    side_lat = 0.001 * config.DEG_TO_M
    side_lon = 0.001 * config.DEG_TO_M * np.cos(np.radians(34.8505))
    assert abs(a - side_lat * side_lon) / (side_lat * side_lon) < 1e-3
    clat, clon = geom.ring_centroid(rlat, rlon)
    assert abs(clat - 34.8505) < 1e-9 and abs(clon + 82.3995) < 1e-9


def test_rings_overlap():
    a = _square(34.85, -82.40, 0.001, 0.001)
    b = _square(34.8505, -82.3995, 0.001, 0.001)  # overlapping
    c = _square(34.86, -82.39, 0.001, 0.001)  # disjoint
    d = _square(34.8502, -82.3998, 0.0002, 0.0002)  # fully inside a
    assert geom.rings_overlap(a[0], a[1], b[0], b[1])
    assert not geom.rings_overlap(a[0], a[1], c[0], c[1])
    assert geom.rings_overlap(a[0], a[1], d[0], d[1])
    assert geom.rings_overlap(d[0], d[1], a[0], a[1])
