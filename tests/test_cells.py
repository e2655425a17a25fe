"""Kernel tests for the Morton cell layer (SURVEY.md §5.2-1, §8.5)."""

import numpy as np
import pytest

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-85, 85, n), rng.uniform(-179.9, 179.9, n)


def test_encode_decode_roundtrip():
    lat, lon = _rand_lonlat(10_000)
    for level in (1, 5, 12, 20):
        c = cells.encode(lat, lon, level)
        x, y, lv = cells.cell_to_xy(c)
        assert (lv == level).all()
        assert (cells.xy_to_cell(x, y, level) == c).all()
        min_lat, min_lon, max_lat, max_lon = cells.cell_bounds(c)
        assert (min_lat <= lat).all() and (lat < max_lat + 1e-9).all()
        assert (min_lon <= lon).all() and (lon < max_lon + 1e-9).all()


def test_ids_unique_across_levels():
    lat = np.array([34.85])
    lon = np.array([-82.4])
    ids = {int(cells.encode(lat, lon, lv)[0]) for lv in range(1, 21)}
    assert len(ids) == 20


def test_children_parent_prefix_coding():
    lat, lon = _rand_lonlat(1000)
    c = cells.encode(lat, lon, 12)
    ch = cells.children(c)
    assert ch.shape == (1000, 4)
    assert (cells.parent(ch[:, 0]) == c).all()
    assert (cells.level_of(ch[:, 2]) == 13).all()
    # a point's cell at L+1 is one of its L-cell's children
    c13 = cells.encode(lat, lon, 13)
    assert ((ch == c13[:, None]).any(axis=1)).all()


def test_encode_at_levels_matches_scalar_encode():
    lat, lon = _rand_lonlat(5000)
    levels = np.random.default_rng(1).integers(1, 20, 5000)
    mixed = cells.encode_at_levels(lat, lon, levels)
    for lv in np.unique(levels):
        m = levels == lv
        assert (mixed[m] == cells.encode(lat[m], lon[m], int(lv))).all()


def test_neighbors_are_adjacent_and_include_self():
    lat, lon = _rand_lonlat(500)
    c = cells.encode(lat, lon, 12)
    nb = cells.neighbors(c)
    assert nb.shape == (500, 9)
    assert (nb == c[:, None]).any(axis=1).all()
    x, y, _ = cells.cell_to_xy(c)
    n = 1 << 12
    for j in range(9):
        nx, ny, lv = cells.cell_to_xy(nb[:, j])
        assert (lv == 12).all()
        dx = np.minimum(np.abs(nx - x), n - np.abs(nx - x))  # lon wraps
        assert (dx <= 1).all()
        assert (np.abs(ny - y) <= 1).all()


def test_neighbor_completeness_for_nearby_points():
    """Any point within one cell-width of another is in its 3x3 neighbor
    block — the J2 kNN completeness invariant (§8.5)."""
    rng = np.random.default_rng(3)
    lat = rng.uniform(config.COUNTY_MIN_LAT, config.COUNTY_MAX_LAT, 2000)
    lon = rng.uniform(config.COUNTY_MIN_LON, config.COUNTY_MAX_LON, 2000)
    # displace by up to the cutoff distance in a random direction
    theta = rng.uniform(0, 2 * np.pi, 2000)
    dlat = config.KNN_CUTOFF_M / config.DEG_TO_M * np.sin(theta)
    dlon = config.KNN_CUTOFF_M / (config.DEG_TO_M * np.cos(np.radians(lat))) * np.cos(theta)
    c1 = cells.encode(lat, lon, config.CELL_LEVEL)
    c2 = cells.encode(lat + dlat, lon + dlon, config.CELL_LEVEL)
    nb = cells.neighbors(c1)
    assert (nb == c2[:, None]).any(axis=1).all()


def test_min_cell_width_supports_cutoff():
    width = cells.min_cell_width_m(config.CELL_LEVEL, max_abs_lat_deg=60.0)
    assert width >= 2 * config.KNN_CUTOFF_M


def test_cover_bbox_contains_corner_and_center_cells():
    rng = np.random.default_rng(11)
    lat0 = rng.uniform(34.7, 34.99, 200)
    lon0 = rng.uniform(-82.55, -82.25, 200)
    lat1 = lat0 + rng.uniform(0, 0.01, 200)
    lon1 = lon0 + rng.uniform(0, 0.01, 200)
    covers = cells.cover_bbox(lat0, lon0, lat1, lon1, 12)
    for i in range(200):
        for la, lo in ((lat0[i], lon0[i]), (lat1[i], lon1[i]), ((lat0[i] + lat1[i]) / 2, (lon0[i] + lon1[i]) / 2)):
            c = int(cells.encode(np.array([la]), np.array([lo]), 12)[0])
            assert c in set(covers[i].tolist())


def test_cover_is_small_for_building_sized_bboxes():
    # a 60 m building bbox covers at most 4 level-12 cells
    lat0 = np.array([34.85]); lon0 = np.array([-82.4])
    covers = cells.cover_bbox(lat0, lon0, lat0 + 0.0006, lon0 + 0.0006, 12)
    assert 1 <= len(covers[0]) <= 4


def test_encode_clips_at_poles_and_antimeridian():
    """Exact domain edges: lat=±90 / lon=±180 clip into the valid cell
    range instead of overflowing the coordinate grid (§8.5)."""
    lat = np.array([90.0, -90.0, 0.0, 0.0, 90.0, -90.0])
    lon = np.array([0.0, 0.0, 180.0, -180.0, 180.0, -180.0])
    for lvl in (1, 12, 20):
        c = cells.encode(lat, lon, lvl)
        x, y, level = cells.cell_to_xy(c)
        n = 1 << lvl
        assert (level == lvl).all()
        assert (x >= 0).all() and (x <= n - 1).all()
        assert (y >= 0).all() and (y <= n - 1).all()
    # lat 90 clips to top row, lat -90 to bottom row
    x, y, _ = cells.cell_to_xy(cells.encode(lat[:2], lon[:2], 12))
    assert y[0] == (1 << 12) - 1 and y[1] == 0


def test_neighbors_wrap_lon_and_clip_lat():
    """Neighborhood semantics at the grid edges: longitude wraps
    (antimeridian continuity), latitude clips (no pole wrap)."""
    lvl = 8
    n = 1 << lvl
    west = cells.encode(np.array([0.0]), np.array([-180.0]), lvl)  # x = 0
    nb = cells.neighbors(west)[0]
    xs = cells.cell_to_xy(nb)[0]
    assert (n - 1) in xs  # wrapped across the antimeridian
    top = cells.encode(np.array([89.9]), np.array([0.0]), lvl)  # y = n-1
    nb = cells.neighbors(top)[0]
    ys = cells.cell_to_xy(nb)[1]
    assert ys.max() == n - 1  # clipped, never wrapped past the pole
    assert len(set(nb.tolist())) <= 9
