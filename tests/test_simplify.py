"""douglas_peucker vs an independent recursive pure-Python DP oracle
(Python bigints, explicit recursion — distinct from the operator's
iterative numpy stack)."""

from __future__ import annotations

import random

import pytest

from mergeaddressesandbuildings_spark.operators.simplify import (
    douglas_peucker,
)


def brute_dp(pts, eps):
    """pts: list[(x, y)] in order. Returns kept indices (original
    positions)."""
    eps2 = eps * eps

    def rec(i, j, keep):
        if j - i < 2:
            return
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        best_d2, best_thresh, best_k = -1, 0, None
        for k in range(i + 1, j):
            px, py = pts[k]
            if dx == 0 and dy == 0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
                thresh = eps2
            else:
                cr = dx * (py - ay) - dy * (px - ax)
                d2 = cr * cr
                thresh = eps2 * (dx * dx + dy * dy)
            if d2 > best_d2:
                best_d2, best_thresh, best_k = d2, thresh, k
        if best_k is not None and best_d2 > best_thresh:
            keep.add(best_k)
            rec(i, best_k, keep)
            rec(best_k, j, keep)

    keep = {0, len(pts) - 1} if len(pts) > 1 else {0} if pts else set()
    if len(pts) > 2:
        rec(0, len(pts) - 1, keep)
    return sorted(keep)


def synth_line(line_id, n=120):
    return [((line_id + 1) * 13 + i,
             ((line_id + 1) * i * i) % 97 + (i * 31) % 7)
            for i in range(n)]


def _check(spark, lines, eps):
    rows = [(lid, i, x, y) for lid, pts in lines.items()
            for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["line_id", "pt_idx", "x", "y"])
    got = {}
    for r in douglas_peucker(df, eps).collect():
        got.setdefault(r["line_id"], []).append(r["pt_idx"])
    got = {k: sorted(v) for k, v in got.items()}
    want = {lid: brute_dp(pts, eps) for lid, pts in lines.items()}
    assert got == want


def test_matches_brute_oracle(spark):
    lines = {lid: synth_line(lid) for lid in range(8)}
    _check(spark, lines, eps=5)


def test_random_walks(spark):
    rng = random.Random(53)
    lines = {}
    for lid in range(6):
        x = y = 0
        pts = []
        for _ in range(80):
            x += rng.randrange(-4, 5)
            y += rng.randrange(-4, 5)
            pts.append((x, y))
        lines[lid] = pts
    for eps in (0, 3, 10):
        _check(spark, lines, eps)


def test_straight_line_collapses_to_endpoints(spark):
    lines = {1: [(i, 2 * i) for i in range(50)]}
    rows = [(1, i, x, y) for i, (x, y) in enumerate(lines[1])]
    df = spark.createDataFrame(rows, ["line_id", "pt_idx", "x", "y"])
    kept = sorted(r["pt_idx"] for r in douglas_peucker(df, 1).collect())
    assert kept == [0, 49]


def test_closed_ring_degenerate_chord(spark):
    # first == last: chord is a point; interior farther than eps kept
    ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    _check(spark, {7: ring}, eps=3)


def test_tiny_lines_kept_whole(spark):
    _check(spark, {1: [(5, 5)], 2: [(0, 0), (9, 9)]}, eps=2)


def test_guards(spark):
    df = spark.createDataFrame([(1, 0, 0, 0), (1, 1, 1 << 21, 0)],
                               ["line_id", "pt_idx", "x", "y"])
    with pytest.raises(Exception, match="MAX_COORD"):
        douglas_peucker(df, 1).collect()
    with pytest.raises(ValueError):
        douglas_peucker(df, -1)


def test_parallelism_invariant(spark):
    lines = {lid: synth_line(lid, n=60) for lid in range(10)}
    rows = [(lid, i, x, y) for lid, pts in lines.items()
            for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["line_id", "pt_idx", "x", "y"])
    a = sorted(map(tuple, douglas_peucker(df.coalesce(1), 4).collect()))
    b = sorted(map(tuple, douglas_peucker(df.repartition(8), 4).collect()))
    assert a == b
