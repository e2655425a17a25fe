"""cohort_retention + scd2_intervals vs pure-Python oracles."""

from __future__ import annotations

import random

import pytest

from mergeaddressesandbuildings_spark.operators.retention import (
    cohort_retention, scd2_intervals,
)


def brute_retention(rows, period):
    first = {}
    for u, t in rows:
        p = t // period
        first[u] = min(first.get(u, p), p)
    cells = set()
    for u, t in rows:
        cells.add((first[u], t // period - first[u], u))
    out = {}
    for cohort, offset, _ in cells:
        out[(cohort, offset)] = out.get((cohort, offset), 0) + 1
    return out


def test_retention_matches_brute(spark):
    rng = random.Random(31)
    rows = [(rng.randrange(40), rng.randrange(0, 10_000))
            for _ in range(2000)]
    df = spark.createDataFrame(rows, ["user_id", "ts_us"])
    got = {(r["cohort"], r["offset"]): r["users"]
           for r in cohort_retention(df, "user_id", "ts_us",
                                     period_us=1000).collect()}
    assert got == brute_retention(rows, 1000)


def test_retention_offset_zero_counts_every_user_once(spark):
    rows = [(1, 5), (1, 7), (2, 1500), (3, 10)]
    df = spark.createDataFrame(rows, ["user_id", "ts_us"])
    got = {(r["cohort"], r["offset"]): r["users"]
           for r in cohort_retention(df, "user_id", "ts_us", 1000).collect()}
    assert got == {(0, 0): 2, (1, 0): 1}


def test_retention_guard(spark):
    df = spark.createDataFrame([(1, 1)], ["user_id", "ts_us"])
    with pytest.raises(ValueError):
        cohort_retention(df, "user_id", "ts_us", 0)


def brute_scd2(rows):
    by_key = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    out = []
    for k, chs in by_key.items():
        chs.sort()
        for i, (t, v) in enumerate(chs):
            nxt = chs[i + 1][0] if i + 1 < len(chs) else None
            out.append((k, t, nxt, v))
    return sorted(out, key=lambda r: (r[0], r[1]))


def test_scd2_matches_brute(spark):
    rng = random.Random(37)
    rows = []
    seen = set()
    for _ in range(500):
        k, t = f"k{rng.randrange(20)}", rng.randrange(10_000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rows.append((k, t, rng.randrange(100)))
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["v"])
        for r in scd2_intervals(df, ["k"], "t", ["v"]).collect())
    assert got == brute_scd2(rows)


def test_scd2_last_row_open_ended(spark):
    df = spark.createDataFrame([("k", 5, 1), ("k", 9, 2)],
                               ["k", "t", "v"])
    got = sorted(map(tuple, scd2_intervals(df, ["k"], "t", ["v"]).collect()))
    assert got == [("k", 5, 9, 1), ("k", 9, None, 2)]


def test_scd2_duplicate_ts_raises(spark):
    df = spark.createDataFrame([("k", 5, 1), ("k", 5, 2)],
                               ["k", "t", "v"])
    with pytest.raises(Exception, match="duplicate"):
        scd2_intervals(df, ["k"], "t", ["v"]).collect()


def test_parallelism_invariant(spark):
    rows = [(f"k{i % 7}", i * 13 % 997, i) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    a = sorted(map(tuple, scd2_intervals(
        df.coalesce(1), ["k"], "t", ["v"]).collect()))
    b = sorted(map(tuple, scd2_intervals(
        df.repartition(8), ["k"], "t", ["v"]).collect()))
    assert a == b
