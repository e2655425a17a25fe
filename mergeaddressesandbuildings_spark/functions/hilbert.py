"""Hilbert-curve cell index (SURVEY.md §2.7 T1's locality-upgraded
sibling): map grid coords to the distance along a Hilbert curve.

Why both curves exist here: Morton (cells.py/cells_sql.py) is
cheaper (pure bit-interleave, trivially invertible, level-prefix
nesting — the right key for the tiling/kNN cell joins), but it has
locality seams: consecutive Morton codes can jump across the map, so
range scans over a Morton-sorted layout read up to 4x more cells
than they need. The Hilbert index guarantees consecutive codes are
4-neighbours (unit Manhattan steps, asserted in tests), which makes
it the better SORT KEY for write-time clustering — parquet row-group
min/max pruning over a Hilbert-sorted table touches near-minimal row
groups for a bbox scan. Same reasoning as z-order vs hilbert
clustering in lakehouse table formats.

Implementations, bit-identical to each other (asserted in
tests/test_hilbert.py):

- numpy kernels (``xy_to_hilbert`` / ``hilbert_to_xy``) for Arrow
  batch contexts — the classic iterative rotate-and-accumulate
  (Hilbert 1891; the s-loop form popularized by Warren, "Hacker's
  Delight" §16, public domain);
- a pure column-expression twin (``hilbert_expr``) that runs the
  same per-level fold JVM-side via ``F.aggregate`` over the level
  array — stays in whole-stage codegen, zero Python, usable straight
  in a ``sortWithinPartitions``/write-clustering stage.

Exactness: every step is integer shift/mask/select; order <= 31
keeps d = x,y interleave within a signed 64-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

__all__ = ["xy_to_hilbert", "hilbert_to_xy", "hilbert_expr"]


def _check_order(order: int) -> None:
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")


def xy_to_hilbert(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Vectorized (x, y) -> Hilbert distance d in [0, 4^order)."""
    _check_order(order)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant so the sub-curve orientation is canonical
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_to_xy(d: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse: Hilbert distance -> (x, y)."""
    _check_order(order)
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    top = np.int64(1) << order
    while s < top:
        rx = 1 & (t >> 1)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        x = x + s * rx
        y = y + s * ry
        t >>= 2
        s <<= 1
    return x, y


def hilbert_expr(x: Column, y: Column, order: int) -> Column:
    """JVM column-expression twin of :func:`xy_to_hilbert`: the same
    per-level rotate-and-accumulate as ONE ``F.aggregate`` fold over
    the descending level array — struct state (x, y, d), all integer
    shift/mask/select, inside whole-stage codegen."""
    _check_order(order)
    levels = F.array(*[F.lit(1 << (order - 1 - i)).cast("long")
                       for i in range(order)])
    init = F.struct(x.cast("long").alias("x"), y.cast("long").alias("y"),
                    F.lit(0).cast("long").alias("d"))

    def step(acc: Column, s: Column) -> Column:
        ax, ay, ad = acc["x"], acc["y"], acc["d"]
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        d2 = ad + s * s * (rx * 3).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        xf = F.when(flip, s - 1 - ax).otherwise(ax)
        yf = F.when(flip, s - 1 - ay).otherwise(ay)
        nx = F.when(ry == 0, yf).otherwise(xf)
        ny = F.when(ry == 0, xf).otherwise(yf)
        return F.struct(nx.cast("long").alias("x"),
                        ny.cast("long").alias("y"),
                        d2.cast("long").alias("d"))

    return F.aggregate(levels, init, step)["d"]
