"""funnel_counts vs a pure-Python earliest-transition oracle."""

from __future__ import annotations

import random

import pytest

from mergeaddressesandbuildings_spark.operators.funnel import funnel_counts


def brute(rows, stages):
    by_user = {}
    for u, et, t in rows:
        by_user.setdefault(u, []).append((et, t))
    counts = []
    for k in range(1, len(stages) + 1):
        n = 0
        for evts in by_user.values():
            prev = None
            ok = True
            for stage in stages[:k]:
                cand = [t for et, t in evts
                        if et == stage and (prev is None or t > prev)]
                if not cand:
                    ok = False
                    break
                prev = min(cand)
            n += ok
        counts.append((k, stages[k - 1], n))
    return counts


def _check(spark, rows, stages):
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    got = [(r["stage"], r["event_type"], r["users"])
           for r in funnel_counts(df, stages).orderBy("stage").collect()]
    assert got == brute(rows, stages)


def test_random_events(spark):
    rng = random.Random(23)
    types = ["view", "click", "purchase", "error"]
    rows = [(rng.randrange(50), rng.choice(types), rng.randrange(10_000))
            for _ in range(3000)]
    _check(spark, rows, ["view", "click", "purchase"])


def test_strictly_after_semantics(spark):
    rows = [
        (1, "view", 10), (1, "click", 10),   # simultaneous: no chain
        (2, "view", 10), (2, "click", 11),   # chains
        (3, "click", 5), (3, "view", 10),    # click before view: no
        (4, "view", 10), (4, "click", 20), (4, "view", 15),
    ]
    _check(spark, rows, ["view", "click"])


def test_earliest_transition_not_any_transition(spark):
    # user views at 10 and 100, clicks at 50: earliest view (10) is
    # the gate, so the click at 50 counts
    rows = [(1, "view", 10), (1, "view", 100), (1, "click", 50)]
    _check(spark, rows, ["view", "click"])


def test_guards(spark):
    df = spark.createDataFrame([(1, "a", 1)],
                               ["user_id", "event_type", "ts_us"])
    with pytest.raises(ValueError):
        funnel_counts(df, [])
    with pytest.raises(ValueError):
        funnel_counts(df, ["a", "a"])


def test_parallelism_invariant(spark):
    rng = random.Random(29)
    rows = [(rng.randrange(20), rng.choice(["a", "b", "c"]),
             rng.randrange(1000)) for _ in range(600)]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    a = [tuple(r) for r in funnel_counts(
        df.coalesce(1), ["a", "b", "c"]).orderBy("stage").collect()]
    b = [tuple(r) for r in funnel_counts(
        df.repartition(8), ["a", "b", "c"]).orderBy("stage").collect()]
    assert a == b
