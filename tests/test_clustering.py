"""Integer-exact distributed k-means (operators/clustering.py) vs a
pure-Python oracle implementing the identical algorithm, plus the
determinism and guard contracts the oracle pairing relies on."""

import math

import pytest

from mergeaddressesandbuildings_spark.operators import clustering

QUANT = clustering.QUANT


def _py_quantize(vec):
    return [math.floor(float(x) * QUANT + 0.5) for x in vec]


def _py_kmeans(rows, k, iters):
    """rows: [(vec_id, [float,...])] → {vec_id: cluster_id}, the same
    integer Lloyd: seeds = k lowest ids, assign = argmin exact int
    squared L2 w/ lower-cid ties, update = floor(sum/count + 0.5)."""
    q = {vid: _py_quantize(v) for vid, v in rows}
    seeds = sorted(q)[:k]
    cents = [list(q[vid]) for vid in seeds]

    def assign():
        out = {}
        for vid, x in q.items():
            best = None
            for cid, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(x, c))
                if best is None or d < best[0]:
                    best = (d, cid)
            out[vid] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        sums = {}
        for vid, cid in a.items():
            s = sums.setdefault(cid, [[0] * len(q[vid]), 0])
            s[1] += 1
            for d, x in enumerate(q[vid]):
                s[0][d] += x
        for cid, (svec, n) in sums.items():
            cents[cid] = [math.floor(s / n + 0.5) for s in svec]
    return assign()


def _rows(n, dim=8, seed=7):
    import random

    rng = random.Random(seed)
    # three planted blobs + noise, values in [-1, 1] like the fixture
    out = []
    for i in range(n):
        base = [(-0.8, 0.8), (0.6, -0.5), (0.1, 0.9)][i % 3]
        vec = [max(-1.0, min(1.0, base[d % 2] + rng.uniform(-0.3, 0.3)))
               for d in range(dim)]
        out.append((i + 1, vec))
    return out


def test_kmeans_matches_python_oracle(spark):
    rows = _rows(60)
    df = spark.createDataFrame(
        [(vid, v) for vid, v in rows],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["cluster_id"]
           for r in clustering.kmeans_assign(df, k=4, iters=3).collect()}
    want = _py_kmeans(
        [(vid, [float(x) for x in v]) for vid, v in rows], k=4, iters=3)
    assert got == want
    assert set(got) == {vid for vid, _ in rows}  # every vector assigned


def test_kmeans_parallelism_invariant(spark):
    rows = _rows(48, dim=6, seed=11)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one = {r["vec_id"]: r["cluster_id"] for r in clustering.kmeans_assign(
        df.coalesce(1), k=3, iters=2).collect()}
    many = {r["vec_id"]: r["cluster_id"] for r in clustering.kmeans_assign(
        df.repartition(8), k=3, iters=2).collect()}
    assert one == many


def test_kmeans_nontrivial_clustering(spark):
    # planted blobs must not collapse into one cluster
    rows = _rows(60)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = clustering.kmeans_assign(df, k=4, iters=3)
    n_clusters = got.select("cluster_id").distinct().count()
    assert n_clusters >= 2


def test_kmeans_guards(spark):
    df = spark.createDataFrame(
        _rows(5, dim=4), "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        clustering.kmeans_assign(df, k=0, iters=1)
    with pytest.raises(ValueError):
        clustering.kmeans_assign(df, k=2, iters=0)
    with pytest.raises(ValueError):
        clustering.kmeans_assign(df, k=50, iters=1)  # k > rows
