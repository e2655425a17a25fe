"""max_concurrency vs a pure-Python sweep oracle (explicit sorted
event list, half-open [start, end) semantics)."""

from __future__ import annotations

import random

import pytest

from mergeaddressesandbuildings_spark.operators.intervals import (
    max_concurrency,
)


def brute(rows):
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).extend([(s, 1), (e, -1)])
    out = {}
    for k, evts in by_key.items():
        evts.sort(key=lambda p: (p[0], p[1]))  # -1 before +1 at same t
        run, peak, peak_at = 0, None, None
        for t, d in evts:
            run += d
            if peak is None or run > peak:
                peak, peak_at = run, t
        out[k] = (peak, peak_at)
    return out


def _check(spark, rows):
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    got = {r["k"]: (r["peak"], r["peak_at"])
           for r in max_concurrency(df, "k", "s", "e").collect()}
    assert got == brute(rows)


def test_random_intervals(spark):
    rng = random.Random(13)
    rows = []
    for i in range(800):
        s = rng.randrange(0, 10_000)
        rows.append((f"g{rng.randrange(4)}", s, s + rng.randrange(1, 500)))
    _check(spark, rows)


def test_half_open_touching_intervals_do_not_overlap(spark):
    # [0,10) and [10,20): peak must be 1, attained at t=0
    _check(spark, [("a", 0, 10), ("a", 10, 20)])


def test_identical_intervals_stack(spark):
    _check(spark, [("a", 5, 9), ("a", 5, 9), ("a", 5, 9)])


def test_earliest_attainment_wins(spark):
    # peak 2 attained at t=3 (first) and again at t=30 -> report 3
    _check(spark, [("a", 0, 10), ("a", 3, 6),
                   ("a", 20, 40), ("a", 30, 35)])


def test_invalid_interval_raises(spark):
    df = spark.createDataFrame([("a", 10, 10)], ["k", "s", "e"])
    with pytest.raises(Exception, match="non-positive interval"):
        max_concurrency(df, "k", "s", "e").collect()


def test_parallelism_invariant(spark):
    rng = random.Random(17)
    rows = [("g", s := rng.randrange(1000), s + rng.randrange(1, 50))
            for _ in range(300)]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    a = sorted(map(tuple, max_concurrency(
        df.coalesce(1), "k", "s", "e").collect()))
    b = sorted(map(tuple, max_concurrency(
        df.repartition(8), "k", "s", "e").collect()))
    assert a == b
