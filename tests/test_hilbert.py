"""Hilbert index (functions/hilbert.py): numpy kernel vs a scalar
pure-Python oracle, the JVM F.aggregate twin bit-identical to numpy,
round-trip inverse, unit-step adjacency (the locality property that
distinguishes it from Morton), and order guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.functions.hilbert import (
    hilbert_expr, hilbert_to_xy, xy_to_hilbert,
)


def scalar_xy2d(x: int, y: int, order: int) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


@pytest.fixture(scope="module")
def grid():
    n = 32  # full order-5 grid
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    return xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)


def test_numpy_matches_scalar_oracle(grid):
    xs, ys = grid
    got = xy_to_hilbert(xs, ys, 5)
    want = np.array([scalar_xy2d(int(x), int(y), 5)
                     for x, y in zip(xs, ys)])
    assert (got == want).all()
    # a full grid is a bijection onto [0, 4^order)
    assert sorted(got.tolist()) == list(range(32 * 32))


def test_round_trip(grid):
    xs, ys = grid
    d = xy_to_hilbert(xs, ys, 5)
    rx, ry = hilbert_to_xy(d, 5)
    assert (rx == xs).all() and (ry == ys).all()


def test_adjacency_unit_steps():
    # THE Hilbert property Morton lacks: consecutive codes are always
    # 4-neighbours (Manhattan distance exactly 1)
    d = np.arange(4 ** 6)
    x, y = hilbert_to_xy(d, 6)
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()


def test_expr_twin_bit_identical(spark, grid):
    xs, ys = grid
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], ["x", "y"])
    got = {(r["x"], r["y"]): r["d"] for r in df.select(
        "x", "y", hilbert_expr(F.col("x"), F.col("y"), 5).alias("d")
    ).collect()}
    want = xy_to_hilbert(xs, ys, 5)
    assert got == {(int(x), int(y)): int(d)
                   for x, y, d in zip(xs, ys, want)}


def test_expr_high_order_and_codegen(spark):
    # order 16 over scattered coords; plan stays pure expressions
    pts = [(i, (i * 2654435761) % 65536, (i * 40503) % 65536)
           for i in range(500)]
    df = spark.createDataFrame(pts, ["i", "x", "y"])
    out = df.select("i", hilbert_expr(F.col("x"), F.col("y"), 16)
                    .alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Eval" not in plan.split(
        "FileScan")[0].split("Project")[0]
    got = {r["i"]: r["d"] for r in out.collect()}
    xs = np.array([p[1] for p in pts])
    ys = np.array([p[2] for p in pts])
    want = xy_to_hilbert(xs, ys, 16)
    assert got == {p[0]: int(d) for p, d in zip(pts, want)}


def test_order_guards():
    with pytest.raises(ValueError):
        xy_to_hilbert(np.array([0]), np.array([0]), 0)
    with pytest.raises(ValueError):
        hilbert_to_xy(np.array([0]), 32)
    with pytest.raises(ValueError):
        hilbert_expr(F.lit(0), F.lit(0), 40)
