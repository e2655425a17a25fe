"""exact_group_quantiles vs a pure-Python sorted-list oracle."""

from __future__ import annotations

import math
import random

import pytest

from mergeaddressesandbuildings_spark.operators.quantiles import (
    exact_group_quantiles,
)

QS = (0.25, 0.5, 0.75, 0.9)


def brute(rows, qs=QS):
    groups = {}
    for k, v in rows:
        groups.setdefault(k, []).append(v)
    out = {}
    for k, vs in groups.items():
        vs.sort()
        n = len(vs)
        sel = tuple(vs[int(math.floor((n - 1) * q))] for q in qs)
        out[k] = (n,) + sel
    return out


def _check(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: (r["n"], r["q25"], r["q50"], r["q75"], r["q90"])
           for r in exact_group_quantiles(df, ["k"], "v").collect()}
    assert got == brute(rows)


def test_random_groups(spark):
    rng = random.Random(7)
    rows = [(f"g{rng.randrange(5)}", rng.uniform(-100, 100))
            for _ in range(2000)]
    _check(spark, rows)


def test_tiny_groups_and_duplicates(spark):
    rows = [("a", 1.0),                      # n=1: every q -> the value
            ("b", 2.0), ("b", 1.0),          # n=2: q25/q50 -> min
            ("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 1.0)]  # dup ties
    _check(spark, rows)


def test_q0_and_q1_are_min_and_max(spark):
    rows = [("a", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = exact_group_quantiles(df, ["k"], "v", qs=(0.0, 1.0)).collect()[0]
    assert (r["q0"], r["q100"]) == (0.0, 9.0)


def test_parallelism_invariant(spark):
    rng = random.Random(11)
    rows = [(f"g{rng.randrange(3)}", rng.uniform(0, 1))
            for _ in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"])
    a = sorted(map(tuple, exact_group_quantiles(
        df.coalesce(1), ["k"], "v").collect()))
    b = sorted(map(tuple, exact_group_quantiles(
        df.repartition(8), ["k"], "v").collect()))
    assert a == b


def test_guards(spark):
    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    with pytest.raises(ValueError):
        exact_group_quantiles(df, ["k"], "v", qs=())
    with pytest.raises(ValueError):
        exact_group_quantiles(df, ["k"], "v", qs=(1.5,))
