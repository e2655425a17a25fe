"""grid_epsilon_cluster vs a pure-Python union-find oracle.

The oracle does the O(n^2) thing: every pair within eps is unioned,
labels are min-reachable-id — independently checking the 3x3 grid
probe's exhaustiveness (a pair within eps must land in adjacent
eps-cells), the strict <= eps^2 boundary, chain transitivity beyond
the 3x3 neighborhood, and singleton fallthrough.
"""

from __future__ import annotations

import pytest

from mergeaddressesandbuildings_spark.operators.clustering import (
    grid_epsilon_cluster,
)


def brute(pts, eps):
    ids = [p[0] for p in pts]
    parent = {i: i for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, (pa, xa, ya) in enumerate(pts):
        for pb, xb, yb in pts[i + 1:]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps:
                ra, rb = find(pa), find(pb)
                if ra != rb:
                    parent[rb] = ra
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(comp[find(i)]) for i in ids}


def synth(n, mx=251, my=241):
    return [(k, (k * 2654435761) % mx, (k * 40503) % my)
            for k in range(1, n + 1)]


@pytest.fixture(scope="module")
def pts_df(spark):
    return spark.createDataFrame(synth(400), ["pid", "ix", "iy"])


@pytest.mark.parametrize("eps", [1, 6, 12])
def test_matches_brute_oracle(spark, pts_df, eps, tmp_path_factory):
    scratch = str(tmp_path_factory.mktemp(f"gc{eps}"))
    got = {r["pid"]: r["cluster_id"]
           for r in grid_epsilon_cluster(pts_df, eps,
                                         scratch_dir=scratch).collect()}
    assert got == brute(synth(400), eps)


def test_chain_beyond_neighborhood(spark, tmp_path):
    # 5 collinear points 4 apart: any two ends are 16 apart (>eps=5)
    # but chained through intermediates -> one cluster; a far point
    # stays a singleton labeled by its own id.
    pts = [(1, 0, 0), (2, 4, 0), (3, 8, 0), (4, 12, 0), (5, 16, 0),
           (9, 1000, 1000)]
    df = spark.createDataFrame(pts, ["pid", "ix", "iy"])
    got = {r["pid"]: r["cluster_id"]
           for r in grid_epsilon_cluster(df, 5,
                                         scratch_dir=str(tmp_path)).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 9: 9}


def test_boundary_inclusive_and_negative_coords(spark, tmp_path):
    # distance exactly eps joins; eps+1 does not; negative coords must
    # grid correctly (floor division, not truncation toward zero)
    pts = [(1, -3, -3), (2, -3, 2), (3, -3, 9)]
    df = spark.createDataFrame(pts, ["pid", "ix", "iy"])
    got = {r["pid"]: r["cluster_id"]
           for r in grid_epsilon_cluster(df, 5,
                                         scratch_dir=str(tmp_path)).collect()}
    assert got == {1: 1, 2: 1, 3: 3}


def test_parallelism_invariant(spark, pts_df, tmp_path):
    a = sorted(map(tuple, grid_epsilon_cluster(
        pts_df.coalesce(1), 6,
        scratch_dir=str(tmp_path / "a")).collect()))
    b = sorted(map(tuple, grid_epsilon_cluster(
        pts_df.repartition(8), 6,
        scratch_dir=str(tmp_path / "b")).collect()))
    assert a == b


def test_eps_guard(spark, pts_df):
    with pytest.raises(ValueError):
        grid_epsilon_cluster(pts_df, 0)
