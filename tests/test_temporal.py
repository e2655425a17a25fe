"""Backward as-of join (operators/temporal.py) vs a brute-force
Python oracle, plus the contract edges: inclusive vs strict equal-ts,
no-match nulls, and NULL-valued state columns carried from the matched
row (not reached past to an older row).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators.temporal import asof_join


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _brute(probes, states, strict=False):
    out = []
    for k, pts in probes:
        cand = [(ts, v) for (sk, ts, v) in states
                if sk == k and (ts < pts if strict else ts <= pts)]
        if cand:
            mts, v = max(cand)  # unique ts per key in these fixtures
            out.append((k, pts, v, mts))
        else:
            out.append((k, pts, None, None))
    return sorted(out)


STATES = [  # (key, ts, value)
    (1, _ts(1), 10), (1, _ts(5), 11), (1, _ts(9), 12),
    (2, _ts(3), 20), (2, _ts(7), 21),
    (3, _ts(8), 30),
]
PROBES = [
    (1, _ts(1)),   # equal to earliest state: inclusive hit, strict miss
    (1, _ts(6)),   (1, _ts(20)),
    (2, _ts(2)),   # before any state → nulls
    (2, _ts(7)),   # equal-ts again, mid-series
    (3, _ts(8, 12)),
    (4, _ts(15)),  # key with no states at all
]


def _run(spark, probes, states, **kw):
    p = spark.createDataFrame(probes, "k long, pts timestamp")
    s = spark.createDataFrame(states, "k long, ts timestamp, v long")
    got = asof_join(p, s, on="k", probe_ts="pts", state_ts="ts",
                    value_cols=["v"], **kw)
    assert got.columns == ["k", "pts", "v", "matched_ts"]
    return sorted(tuple(r) for r in got.collect())


def test_asof_inclusive_matches_brute(spark):
    assert _run(spark, PROBES, STATES) == _brute(PROBES, STATES)


def test_asof_strict_excludes_equal_ts(spark):
    got = _run(spark, PROBES, STATES, strict=True)
    assert got == _brute(PROBES, STATES, strict=True)
    # the equal-ts probe really did flip from hit to miss
    assert (1, _ts(1), None, None) in got
    assert (1, _ts(1), 10, _ts(1)) in dict.fromkeys(
        _run(spark, PROBES, STATES))


def test_asof_null_value_in_matched_state_not_reached_past(spark):
    # latest state's v is NULL: the join must return NULL (that row
    # matched), not carry the older non-null 10 forward
    states = [(1, _ts(1), 10), (1, _ts(5), None)]
    got = _run(spark, [(1, _ts(6))], states)
    assert got == [(1, _ts(6), None, _ts(5))]


def test_asof_probe_count_preserved(spark):
    # left-join semantics: exactly one output row per probe row
    p = spark.createDataFrame(PROBES, "k long, pts timestamp")
    s = spark.createDataFrame(STATES, "k long, ts timestamp, v long")
    got = asof_join(p, s, on="k", probe_ts="pts", state_ts="ts",
                    value_cols=["v"])
    assert got.count() == len(PROBES)
