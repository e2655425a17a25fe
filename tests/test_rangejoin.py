"""point_in_range_join (operators/rangejoin.py) == theta join, with an
equi-join plan (no BNLJ/cartesian), across bucket widths; the
wide-range guard fails loudly; empty/degenerate intervals drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators.rangejoin import (
    point_in_range_join,
)


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [(i, i * 37 % 1000) for i in range(800)], ["pid", "p"])
    # overlapping ranges of mixed span, plus empty and degenerate ones
    ranges = spark.createDataFrame(
        [(j, j * 53 % 900, j * 53 % 900 + (j % 7) * 25) for j in range(80)]
        + [(900, 500, 500), (901, 600, 590)],
        ["rid", "lo", "hi"])
    return points, ranges


def brute(points, ranges):
    return sorted(
        (p["pid"], p["p"], r["rid"], r["lo"], r["hi"])
        for p in points for r in ranges
        if r["lo"] <= p["p"] < r["hi"])


def test_equals_theta_join_across_widths(spark, sides):
    points, ranges = sides
    want = brute(points.collect(), ranges.collect())
    assert len(want) > 0
    for width in (1, 16, 100, 1000):
        got = sorted(map(tuple, point_in_range_join(
            points, ranges, "p", "lo", "hi", width).collect()))
        assert got == want, f"width={width}"


def test_plan_is_equi_join(spark, sides):
    points, ranges = sides
    plan = point_in_range_join(points, ranges, "p", "lo", "hi", 64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_wide_range_guard_fails_loudly(spark, sides):
    points, _ = sides
    wide = spark.createDataFrame([(1, 0, 10_000_000)], ["rid", "lo", "hi"])
    with pytest.raises(Exception, match="re-bucket"):
        point_in_range_join(points, wide, "p", "lo", "hi", 10,
                            max_buckets_per_range=100).collect()


def test_negative_domain_and_boundaries(spark):
    # floor() bucketing must stay correct below zero and at edges
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([-100, -65, -64, -1, 0, 1, 63, 64])],
        ["pid", "p"])
    ranges = spark.createDataFrame(
        [(0, -64, 64), (1, -100, -64), (2, 0, 1)], ["rid", "lo", "hi"])
    got = sorted(map(tuple, point_in_range_join(
        points, ranges, "p", "lo", "hi", 64).collect()))
    assert got == brute(points.collect(), ranges.collect())


def test_param_guards(spark, sides):
    points, ranges = sides
    with pytest.raises(ValueError):
        point_in_range_join(points, ranges, "p", "lo", "hi", 0)
    with pytest.raises(ValueError):
        point_in_range_join(points, ranges, "p", "lo", "hi", 10,
                            max_buckets_per_range=0)
