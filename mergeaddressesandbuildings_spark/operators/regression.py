"""Grouped linear regression with EXACT integer sufficient statistics.

Distributed OLS is a one-pass aggregation problem: slope and
intercept are closed forms over (n, Sx, Sy, Sxx, Sxy). The float
versions of those sums are partial-agg-order-dependent (the same
drift class kmeans/clustering.py documents), so this module keeps the
DISTRIBUTED part purely integer — callers pass integer-valued x/y
columns (quantize first: cents, epoch units, kmeans-style fixed
point), and every sum is an exact int64 aggregate, associative and
engine/parallelism/retry-invariant, hence driver-hashable. The float
solve (`ols_fit`) happens on the tiny per-group stats row, driver- or
caller-side, where there is no merge order to drift.

Scale shape: ONE map-side-combinable hash agg, period. Sums overflow
int64 only past ~3e18 — callers with 10^12-row groups at large value
ranges should pre-scale the quantization (documented contract, loudly
checkable: sums are monotone, so overflow throws in Spark's checked
long arithmetic rather than wrapping silently under ANSI mode).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["ols_stats", "ols_fit"]


def ols_stats(df: DataFrame, keys: Sequence[str],
              x_col: str, y_col: str) -> DataFrame:
    """→ (keys..., n, sx, sy, sxx, sxy, syy) — all BIGINT, exact."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    return (
        df.select(*keys, x.alias("_x"), y.alias("_y"))
        .groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_x").cast("long").alias("sx"),
            F.sum("_y").cast("long").alias("sy"),
            F.sum(F.col("_x") * F.col("_x")).cast("long").alias("sxx"),
            F.sum(F.col("_x") * F.col("_y")).cast("long").alias("sxy"),
            F.sum(F.col("_y") * F.col("_y")).cast("long").alias("syy"),
        )
    )


def ols_fit(n: int, sx: int, sy: int, sxx: int, sxy: int,
            syy: int | None = None) -> dict:
    """Solve one group's stats → slope/intercept (+ r2 when syy
    given). Degenerate x-variance → ValueError, not NaN."""
    det = n * sxx - sx * sx  # exact int arithmetic (Python bigint)
    if n < 2 or det == 0:
        raise ValueError("need >= 2 points with non-constant x")
    slope = (n * sxy - sx * sy) / det
    intercept = (sy - slope * sx) / n
    out = {"slope": slope, "intercept": intercept}
    if syy is not None:
        ss_tot = n * syy - sy * sy
        if ss_tot == 0:
            out["r2"] = 1.0
        else:
            cov = n * sxy - sx * sy
            out["r2"] = (cov * cov) / (det * ss_tot)
        out["r2"] = float(out["r2"])
        if not math.isfinite(out["r2"]):
            raise ValueError("non-finite r2")
    return out
