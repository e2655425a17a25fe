"""ols_stats vs pure-Python sums; ols_fit vs numpy lstsq."""

from __future__ import annotations

import random

import numpy as np
import pytest

from mergeaddressesandbuildings_spark.operators.regression import (
    ols_fit, ols_stats,
)


def brute_stats(rows):
    out = {}
    for k, x, y in rows:
        n, sx, sy, sxx, sxy, syy = out.get(k, (0, 0, 0, 0, 0, 0))
        out[k] = (n + 1, sx + x, sy + y, sxx + x * x,
                  sxy + x * y, syy + y * y)
    return out


@pytest.fixture(scope="module")
def rows():
    rng = random.Random(41)
    return [(f"g{i % 4}", rng.randrange(-50, 500),
             rng.randrange(-1000, 10_000)) for i in range(3000)]


def test_stats_match_brute(spark, rows):
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    got = {r["k"]: (r["n"], r["sx"], r["sy"], r["sxx"], r["sxy"], r["syy"])
           for r in ols_stats(df, ["k"], "x", "y").collect()}
    assert got == brute_stats(rows)


def test_fit_matches_numpy(rows):
    for k, (n, sx, sy, sxx, sxy, syy) in brute_stats(rows).items():
        fit = ols_fit(n, sx, sy, sxx, sxy, syy)
        xs = np.array([x for g, x, _ in rows if g == k], dtype=float)
        ys = np.array([y for g, _, y in rows if g == k], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert fit["slope"] == pytest.approx(slope, rel=1e-9)
        assert fit["intercept"] == pytest.approx(intercept, rel=1e-9)
        r = np.corrcoef(xs, ys)[0, 1]
        assert fit["r2"] == pytest.approx(r * r, rel=1e-9)


def test_fit_degenerate_raises():
    with pytest.raises(ValueError):
        ols_fit(1, 5, 5, 25, 25, 25)          # n < 2
    with pytest.raises(ValueError):
        ols_fit(3, 6, 9, 12, 18, 29)          # constant x (det=0)


def test_fit_perfect_line_r2_one():
    # y = 2x + 1 over x in 0..4
    xs = list(range(5))
    ys = [2 * x + 1 for x in xs]
    fit = ols_fit(len(xs), sum(xs), sum(ys),
                  sum(x * x for x in xs), sum(x * y for x, y in zip(xs, ys)),
                  sum(y * y for y in ys))
    assert fit["slope"] == pytest.approx(2.0)
    assert fit["intercept"] == pytest.approx(1.0)
    assert fit["r2"] == pytest.approx(1.0)


def test_parallelism_invariant(spark, rows):
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    a = sorted(map(tuple, ols_stats(df.coalesce(1), ["k"], "x", "y").collect()))
    b = sorted(map(tuple, ols_stats(df.repartition(8), ["k"], "x", "y").collect()))
    assert a == b
