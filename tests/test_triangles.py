"""triangle_counts vs a brute-force itertools oracle."""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from mergeaddressesandbuildings_spark.operators.graph import triangle_counts


def brute(edge_list):
    und = set()
    nodes = set()
    for u, v in edge_list:
        if u != v:
            und.add((min(u, v), max(u, v)))
            nodes.update((u, v))
    out = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if ({(a, b), (a, c), (b, c)} <= und):
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return out


def _check(spark, edge_list):
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r["node"]: r["triangles"]
           for r in triangle_counts(df).collect()}
    assert got == brute(edge_list)


def test_random_graph(spark):
    rng = random.Random(43)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    _check(spark, edges)


def test_known_shapes(spark):
    # K4 (4 triangles total, 3 per node) + a path (0 triangles) + a
    # duplicate/reversed edge + a self-loop, all in one graph
    k4 = [(a, b) for a, b in combinations([10, 11, 12, 13], 2)]
    path = [(20, 21), (21, 22)]
    noise = [(11, 10), (10, 10), (12, 11)]
    _check(spark, k4 + path + noise)


def test_triangle_free_bipartite(spark):
    edges = [(a, b) for a in range(5) for b in range(100, 104)]
    _check(spark, edges)


def test_rank_base_guard(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    with pytest.raises(Exception, match="rank_base"):
        triangle_counts(df, rank_base=2).collect()


def test_parallelism_invariant(spark):
    rng = random.Random(47)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, triangle_counts(df.coalesce(1)).collect()))
    b = sorted(map(tuple, triangle_counts(df.repartition(8)).collect()))
    assert a == b
