"""Vectorized numpy geometry kernels (SURVEY.md §2.8 F1–F4, §8.1).

No geo libraries exist in this sandbox (SURVEY.md §9), so the ray-cast
point-in-polygon, point-to-segment distance, ring area/centroid/bbox and
ring-overlap tests are implemented here from scratch as numpy kernels.
These run inside Arrow-batched pandas UDFs on the executors — never
row-at-a-time Python (BASELINE.json:15).

Conventions (§8.1): WGS84 doubles; haversine distance with
R = 6371008.8 m; point-on-edge counts as INSIDE; the ray is cast along
+lat. Metric point↔segment distances use a local equirectangular
projection centered at the query point (county-scale inputs; exactness
pinned by the pure-Python oracle in tests/oracle.py which uses the same
formulae per the §8 spec).
"""

from __future__ import annotations

import numpy as np

from mergeaddressesandbuildings_spark import config

_EDGE_EPS = 1e-12  # degrees^2 tolerance for the on-edge collinearity test


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters (F1), elementwise."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = p2 - p1
    dlmb = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * config.EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def points_in_ring(
    plat: np.ndarray, plon: np.ndarray, ring_lat: np.ndarray, ring_lon: np.ndarray
) -> np.ndarray:
    """Even-odd ray-cast PIP of n points against one closed ring (F2).

    ``ring_*`` must be closed (first == last vertex). Ray direction is
    +lat (§8.1); the crossing test is half-open on lon (``<=``/``>``) so
    vertices are counted once; points exactly on an edge or vertex are
    detected separately and forced inside. Fully vectorized: one
    (n_points × n_edges) broadcast.
    """
    plat = np.asarray(plat, dtype=np.float64)[:, None]
    plon = np.asarray(plon, dtype=np.float64)[:, None]
    x1 = np.asarray(ring_lon, dtype=np.float64)[None, :-1]
    y1 = np.asarray(ring_lat, dtype=np.float64)[None, :-1]
    x2 = np.asarray(ring_lon, dtype=np.float64)[None, 1:]
    y2 = np.asarray(ring_lat, dtype=np.float64)[None, 1:]

    # crossing of the vertical (+lat) ray from (plon, plat)
    straddles = ((x1 <= plon) & (x2 > plon)) | ((x2 <= plon) & (x1 > plon))
    dx = np.where(x2 - x1 == 0.0, 1.0, x2 - x1)  # guarded; unused when not straddling
    t = (plon - x1) / dx
    y_int = y1 + t * (y2 - y1)
    crossings = (straddles & (y_int > plat)).sum(axis=1)
    inside = (crossings % 2) == 1

    # on-edge test: collinear (cross product ~ 0) and within edge bbox
    cross = (plon - x1) * (y2 - y1) - (plat - y1) * (x2 - x1)
    in_box = (
        (plon >= np.minimum(x1, x2) - _EDGE_EPS)
        & (plon <= np.maximum(x1, x2) + _EDGE_EPS)
        & (plat >= np.minimum(y1, y2) - _EDGE_EPS)
        & (plat <= np.maximum(y1, y2) + _EDGE_EPS)
    )
    on_edge = (np.abs(cross) <= _EDGE_EPS) & in_box
    return inside | on_edge.any(axis=1)


def point_to_ring_dist_m(
    plat: np.ndarray, plon: np.ndarray, ring_lat: np.ndarray, ring_lon: np.ndarray
) -> np.ndarray:
    """Min distance (meters) from each of n points to a ring's edges (F1).

    Local equirectangular projection per point: 1° lat = DEG_TO_M meters,
    1° lon = DEG_TO_M * cos(point lat) meters, then exact Euclidean
    point→segment distance. Error is negligible at the ≤100 m cutoff
    scale (§8.4).
    """
    plat = np.asarray(plat, dtype=np.float64)[:, None]
    plon = np.asarray(plon, dtype=np.float64)[:, None]
    kx = config.DEG_TO_M * np.cos(np.radians(plat))
    ky = config.DEG_TO_M
    ax = (np.asarray(ring_lon, dtype=np.float64)[None, :-1] - plon) * kx
    ay = (np.asarray(ring_lat, dtype=np.float64)[None, :-1] - plat) * ky
    bx = (np.asarray(ring_lon, dtype=np.float64)[None, 1:] - plon) * kx
    by = (np.asarray(ring_lat, dtype=np.float64)[None, 1:] - plat) * ky
    dx, dy = bx - ax, by - ay
    seg_len2 = dx * dx + dy * dy
    t = np.clip(
        np.where(seg_len2 > 0.0, -(ax * dx + ay * dy) / np.where(seg_len2 == 0.0, 1.0, seg_len2), 0.0),
        0.0,
        1.0,
    )
    cx = ax + t * dx
    cy = ay + t * dy
    return np.sqrt((cx * cx + cy * cy).min(axis=1))


def ring_bbox(ring_lat: np.ndarray, ring_lon: np.ndarray) -> tuple[float, float, float, float]:
    """(min_lat, min_lon, max_lat, max_lon) of one ring (F3)."""
    return (
        float(np.min(ring_lat)),
        float(np.min(ring_lon)),
        float(np.max(ring_lat)),
        float(np.max(ring_lon)),
    )


def ring_centroid(ring_lat: np.ndarray, ring_lon: np.ndarray) -> tuple[float, float]:
    """Vertex-mean centroid of one ring, excluding the closing vertex (F3).

    §8.7 tile membership uses this; the vertex mean (not the area
    centroid) is chosen for exact reproducibility across engines.
    """
    return float(np.mean(ring_lat[:-1])), float(np.mean(ring_lon[:-1]))


def ring_area_m2(ring_lat: np.ndarray, ring_lon: np.ndarray) -> float:
    """Shoelace area (m²) on a local equirectangular plane at the ring's
    mean latitude — the §8.4 smallest-area tie-break metric."""
    lat0 = float(np.mean(ring_lat[:-1]))
    kx = config.DEG_TO_M * np.cos(np.radians(lat0))
    ky = config.DEG_TO_M
    x = np.asarray(ring_lon, dtype=np.float64) * kx
    y = np.asarray(ring_lat, dtype=np.float64) * ky
    return float(abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])) / 2.0)


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect(
    a1: tuple, a2: tuple, b1x: np.ndarray, b1y: np.ndarray, b2x: np.ndarray, b2y: np.ndarray
) -> np.ndarray:
    """Does segment a1→a2 properly/improperly intersect each segment in b (F4)?

    Cross-product orientation test, vectorized over the b segments.
    Collinear-touching counts as intersecting (conservative for the J3
    building-overlap anti-join).
    """
    ax1, ay1 = a1
    ax2, ay2 = a2
    d1 = _orient(b1x, b1y, b2x, b2y, ax1, ay1)
    d2 = _orient(b1x, b1y, b2x, b2y, ax2, ay2)
    d3 = _orient(ax1, ay1, ax2, ay2, b1x, b1y)
    d4 = _orient(ax1, ay1, ax2, ay2, b2x, b2y)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def _on(dx, px, py, qx, qy, rx, ry):
        return (dx == 0) & (
            (np.minimum(px, qx) <= rx)
            & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry)
            & (ry <= np.maximum(py, qy))
        )

    touch = (
        _on(d1, b1x, b1y, b2x, b2y, ax1, ay1)
        | _on(d2, b1x, b1y, b2x, b2y, ax2, ay2)
        | _on(d3, ax1, ay1, ax2, ay2, b1x, b1y)
        | _on(d4, ax1, ay1, ax2, ay2, b2x, b2y)
    )
    return proper | touch


def rings_overlap(
    a_lat: np.ndarray, a_lon: np.ndarray, b_lat: np.ndarray, b_lon: np.ndarray
) -> bool:
    """Do two closed rings overlap (F4, J3 semantics)?

    True if any edges intersect, or either ring's first vertex lies
    inside the other (containment without edge crossing).
    """
    for i in range(len(a_lat) - 1):
        if segments_intersect(
            (a_lon[i], a_lat[i]),
            (a_lon[i + 1], a_lat[i + 1]),
            np.asarray(b_lon[:-1]),
            np.asarray(b_lat[:-1]),
            np.asarray(b_lon[1:]),
            np.asarray(b_lat[1:]),
        ).any():
            return True
    if points_in_ring(np.array([a_lat[0]]), np.array([a_lon[0]]), b_lat, b_lon)[0]:
        return True
    if points_in_ring(np.array([b_lat[0]]), np.array([b_lon[0]]), a_lat, a_lon)[0]:
        return True
    return False
