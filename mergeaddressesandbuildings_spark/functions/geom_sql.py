"""Ring centroid / shoelace area as PURE COLUMN EXPRESSIONS
(SURVEY.md §2.8 F3 — JVM-side variant).

These are sequential left folds (``F.aggregate``), which is EXACTLY the
summation order of the §8 pure-Python oracle (tests/oracle.py uses
plain ``for`` loops) — so the engine's derived values match the spec's
reference formulation for rings of ANY length. For the ≤8-term sums of
real building rings this is also bit-identical to the numpy
``np.mean``/``np.sum`` kernels in geom.py (numpy only switches to
pairwise summation above 8 elements), which is what keeps the golden
fingerprints stable across the numpy and SQL paths.

Used by the extraction (operators/extract.py) and the OSM-way
enrichment (operators/ways.py) so the whole record-derivation stage
stays inside whole-stage codegen — no Arrow round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from mergeaddressesandbuildings_spark import config


def seq_sum(arr: Column) -> Column:
    """Sequential left-fold sum of an array<double> (deterministic,
    §8-oracle summation order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def centroid_expr(ring: Column) -> Column:
    """Vertex-mean of a closed ring, excluding the closing vertex (F3):
    twin of geom.ring_centroid for one coordinate array."""
    n = F.size(ring) - 1
    return seq_sum(F.slice(ring, 1, n)) / n.cast("double")


def ring_area_m2_expr(ring_lats: Column, ring_lons: Column) -> Column:
    """Shoelace area (m²) on the local equirectangular plane at the
    ring's mean latitude — twin of geom.ring_area_m2: same per-term
    arithmetic ((lon_i·kx)·(lat_{i+1}·ky) − (lon_{i+1}·kx)·(lat_i·ky)),
    same sequential accumulation."""
    lat0 = centroid_expr(ring_lats)
    kx = F.lit(config.DEG_TO_M) * F.cos(F.radians(lat0))
    ky = F.lit(config.DEG_TO_M)
    n = F.size(ring_lats)
    idx = F.sequence(F.lit(1), n - 1)
    s = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + (
            (F.element_at(ring_lons, i) * kx) * (F.element_at(ring_lats, i + 1) * ky)
            - (F.element_at(ring_lons, i + 1) * kx) * (F.element_at(ring_lats, i) * ky)
        ),
    )
    return F.abs(s) / F.lit(2.0)


def flat_dist_m_expr(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                     cos_lat0: Column) -> Column:
    """Equirectangular (flat-projection) distance in meters (F1's
    small-area fast path): ``sqrt((Δlat·ky)² + (Δlon·kx)²)`` with
    ``ky = DEG_TO_M``, ``kx = DEG_TO_M·cos_lat0``. Every operation is a
    correctly-rounded IEEE primitive (mul/add/sqrt — no trig at eval
    time when ``cos_lat0`` is a literal), so an oracle engine running
    the textually-identical formula produces bit-identical doubles —
    which is what lets kNN *ranking* be hash-compared cross-engine
    (haversine trig differs sub-ULP between libms and can flip ranks of
    near-equal distances)."""
    ky = F.lit(config.DEG_TO_M)
    kx = F.lit(config.DEG_TO_M) * cos_lat0
    dy = (lat2 - lat1) * ky
    dx = (lon2 - lon1) * kx
    return F.sqrt(dy * dy + dx * dx)


def poly_area_m2_expr(ring_lats: Column, ring_lons: Column,
                      hole_lats: Column, hole_lons: Column) -> Column:
    """Polygon-with-holes area: outer shoelace − Σ hole shoelaces (each
    hole at its own mean latitude — §8.1 ext). ``hole_*`` are
    array<array<double>> (may be null/empty)."""
    outer = ring_area_m2_expr(ring_lats, ring_lons)
    holes = F.when(
        hole_lats.isNull() | (F.size(hole_lats) == 0), F.lit(0.0)
    ).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.size(hole_lats)),
            F.lit(0.0),
            lambda acc, i: acc
            + ring_area_m2_expr(
                F.element_at(hole_lats, i), F.element_at(hole_lons, i)
            ),
        )
    )
    return outer - holes
