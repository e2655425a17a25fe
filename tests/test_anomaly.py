"""rolling_anomalies vs a pure-Python fractions-exact oracle."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from mergeaddressesandbuildings_spark.operators.anomaly import (
    rolling_anomalies,
)


def brute(rows, window, c):
    """rows: [(k, t, x)]. Exact rational z-score comparison."""
    by_key = {}
    for k, t, x in rows:
        by_key.setdefault(k, []).append((t, x))
    out = {}
    for k, seq in by_key.items():
        seq.sort()
        for i, (t, x) in enumerate(seq):
            lo = max(0, i - window + 1)
            vals = [v for _, v in seq[lo:i + 1]]
            n = len(vals)
            mean = Fraction(sum(vals), n)
            var = Fraction(sum(v * v for v in vals), n) - mean * mean
            flag = n >= 2 and (x - mean) ** 2 > c * c * var
            out[(k, t)] = (n, bool(flag))
    return out


def _check(spark, rows, window=5, c=3):
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {(r["k"], r["t"]): (r["n"], r["is_anomaly"])
           for r in rolling_anomalies(df, "k", "t", "x",
                                      window=window, c=c).collect()}
    assert got == brute(rows, window, c)


def test_random_series(spark):
    rng = random.Random(73)
    rows = [(f"k{i % 3}", i, rng.randrange(-100, 101)) for i in range(600)]
    _check(spark, rows, window=10, c=2)


def test_planted_spike_flags(spark):
    rows = [("k", t, 10) for t in range(20)] + [("k", 20, 500)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {r["t"]: r["is_anomaly"]
           for r in rolling_anomalies(df, "k", "t", "x").collect()}
    assert got[20] is True
    assert not any(got[t] for t in range(20))
    _check(spark, rows, window=20, c=3)


def test_constant_series_never_flags(spark):
    # zero variance: (x-mean)^2 == 0 > 0 is false -> never anomalous
    rows = [("k", t, 7) for t in range(30)]
    _check(spark, rows, window=5, c=3)


def test_boundary_exactness(spark):
    # crafted so the float z-score sits exactly ON the threshold:
    # window [0, 0, 3] with c=1: mean 1, var 2; (3-1)^2 = 4 > 1*2 -> flag,
    # while [0, 3, 3]: mean 2, var 2; (3-2)^2 = 1 > 2 false
    rows = [("k", 0, 0), ("k", 1, 0), ("k", 2, 3), ("k", 3, 3)]
    _check(spark, rows, window=3, c=1)


def test_guards(spark):
    df = spark.createDataFrame([("k", 1, 1)], ["k", "t", "x"])
    with pytest.raises(ValueError):
        rolling_anomalies(df, "k", "t", "x", window=1)
    with pytest.raises(ValueError):
        rolling_anomalies(df, "k", "t", "x", c=0)


def test_parallelism_invariant(spark):
    rng = random.Random(79)
    rows = [(f"k{i % 4}", i, rng.randrange(0, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    a = sorted(map(tuple, rolling_anomalies(
        df.coalesce(1), "k", "t", "x").collect()))
    b = sorted(map(tuple, rolling_anomalies(
        df.repartition(8), "k", "t", "x").collect()))
    assert a == b
