"""Fixed-point PageRank (operators/graph.py) vs a pure-Python integer
oracle — exact equality, since ppm BIGINT arithmetic is deterministic
by construction (the property that makes the driver oracle hashable).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import graph


def py_pagerank(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Reference semantics, mirrored from graph.pagerank's docstring."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out: dict[int, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        in_sum = {n: 0 for n in nodes}
        for s, d in edges:
            in_sum[d] += r[s] // out[s]
        r = {n: 150_000 + (850_000 * in_sum[n]) // 1_000_000 for n in nodes}
    return r


def _run(spark, edges, iters, tmp_path, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = graph.pagerank(df, iters=iters,
                         scratch_dir=str(tmp_path / "pr"), **kw)
    return {row["node"]: row["rank_ppm"] for row in got.collect()}


CHAIN = [(i, i + 1) for i in range(6)]
STAR = [(i, 0) for i in range(1, 8)] + [(0, 1)]
CYCLE_WITH_TAIL = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 1), (4, 3)]


@pytest.mark.parametrize("edges", [CHAIN, STAR, CYCLE_WITH_TAIL])
@pytest.mark.parametrize("iters", [0, 1, 4])
def test_pagerank_matches_python_oracle(spark, tmp_path, edges, iters):
    assert _run(spark, edges, iters, tmp_path) == py_pagerank(edges, iters)


def test_pagerank_dedupes_multi_edges_and_cleans_scratch(spark, tmp_path):
    # duplicate edges count once (DISTINCT contract); scratch holds only
    # the final round after return
    edges = CYCLE_WITH_TAIL + CYCLE_WITH_TAIL
    got = _run(spark, edges, 3, tmp_path)
    assert got == py_pagerank(CYCLE_WITH_TAIL, 3)
    left = sorted(os.listdir(tmp_path / "pr" / "run"))
    assert left == ["ranks_2"]


def test_pagerank_sink_node_holds_base_and_sums_exactly(spark, tmp_path):
    # node 2 is dangling (no out-edges): its mass is dropped, but it
    # still accumulates in-flow; node 3 has no in-edges → pure base
    edges = [(0, 2), (1, 2), (3, 0)]
    got = _run(spark, edges, 2, tmp_path)
    oracle = py_pagerank(edges, 2)
    assert got == oracle
    assert got[3] == 150_000


def test_pagerank_rejects_negative_iters(spark, tmp_path):
    df = spark.createDataFrame(CHAIN, "src long, dst long")
    with pytest.raises(ValueError):
        graph.pagerank(df, iters=-1, scratch_dir=str(tmp_path / "pr"))
