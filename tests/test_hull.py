"""convex_hulls (monotone chain) vs an independent Jarvis-march
gift-wrapping oracle — different algorithm, same strict-hull
semantics (collinear interior points excluded)."""

from __future__ import annotations

import random

import pytest

from mergeaddressesandbuildings_spark.operators.hull import convex_hulls


def jarvis(points):
    """CCW strict hull from the lexicographically smallest point."""
    pts = sorted(set(points))
    if len(pts) == 1:
        return pts
    if len(pts) == 2:
        return pts
    start = pts[0]
    hull = [start]
    cur = start
    while True:
        cand = None
        for p in pts:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            cross = ((cand[0] - cur[0]) * (p[1] - cur[1])
                     - (cand[1] - cur[1]) * (p[0] - cur[0]))
            if cross < 0:
                cand = p
            elif cross == 0:
                # collinear: take the FARTHER one (strict hull skips
                # interior collinear points)
                d_c = ((cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2)
                d_p = ((p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2)
                if d_p > d_c:
                    cand = p
        if cand == start:
            break
        hull.append(cand)
        cur = cand
    # cross<0 replacement keeps the most-clockwise candidate, which
    # walks the boundary counter-clockwise (y-up orientation) — same
    # direction as the monotone chain
    return hull


def _check(spark, groups):
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {}
    for r in sorted(convex_hulls(df, "g").collect(),
                    key=lambda r: (r["g"], r["seq"])):
        got.setdefault(r["g"], []).append((r["x"], r["y"]))
    want = {g: jarvis(pts) for g, pts in groups.items()}
    assert got == want


def test_random_clouds(spark):
    rng = random.Random(67)
    groups = {g: [(rng.randrange(-50, 51), rng.randrange(-50, 51))
                  for _ in range(200)] for g in range(5)}
    _check(spark, groups)


def test_degenerate_shapes(spark):
    groups = {
        1: [(3, 4)],                               # single point
        2: [(0, 0), (5, 5), (0, 0)],               # 2 distinct + dup
        3: [(0, 0), (1, 1), (2, 2), (3, 3)],       # all collinear
        4: [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2),  # square + interior
            (2, 0), (4, 2)],                       # + edge-collinear
    }
    _check(spark, groups)


def test_square_hull_order(spark):
    df = spark.createDataFrame(
        [(1, x, y) for x, y in [(0, 0), (4, 0), (4, 4), (0, 4), (1, 2)]],
        ["g", "x", "y"])
    got = [(r["x"], r["y"]) for r in
           sorted(convex_hulls(df, "g").collect(), key=lambda r: r["seq"])]
    assert got == [(0, 0), (4, 0), (4, 4), (0, 4)]


def test_coord_guard(spark):
    df = spark.createDataFrame([(1, 1 << 21, 0), (1, 0, 1)],
                               ["g", "x", "y"])
    with pytest.raises(Exception, match="MAX_COORD"):
        convex_hulls(df, "g").collect()


def test_parallelism_invariant(spark):
    rng = random.Random(71)
    rows = [(i % 4, rng.randrange(-30, 31), rng.randrange(-30, 31))
            for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    a = sorted(map(tuple, convex_hulls(df.coalesce(1), "g").collect()))
    b = sorted(map(tuple, convex_hulls(df.repartition(8), "g").collect()))
    assert a == b
