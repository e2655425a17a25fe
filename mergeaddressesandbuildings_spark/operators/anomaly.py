"""Rolling anomaly detection per key — windowed z-score with the
float division CROSS-MULTIPLIED AWAY, so flags are integer-exact.

A point is anomalous when (x - mean)^2 > c^2 * variance over the
trailing window of w values (itself included). With integer inputs,
mean = S/n and variance = (n*Q - S^2)/n^2 are rationals; multiplying
the inequality through by n^2 gives

    (n*x - S)^2  >  c^2 * (n*Q - S^2)

— exact int64 terms (S = rolling sum, Q = rolling sum of squares),
no division, no sqrt, no float anywhere. The flag a row gets is
therefore identical in every engine and at every parallelism, which
float z-scores (ulp-fragile near the threshold) cannot promise.

Scale shape: ONE per-key window sort carrying two rowsBetween running
sums + the flag expression — all whole-stage-codegen JVM. The same
spill-aware hot-key profile as quantiles.py. ``c`` must be an integer
(c=3 is the classic 3-sigma rule); values must be pre-quantized
integers (cents, micros) per the repo's determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rolling_anomalies"]


def rolling_anomalies(df: DataFrame, key_col: str, order_col: str,
                      value_col: str, window: int = 20,
                      c: int = 3) -> DataFrame:
    """→ input keys/order/value + (n BIGINT, is_anomaly BOOLEAN):
    trailing-window 3-sigma-style flags. ``order_col`` must be
    integer and unique per key (deterministic window order);
    ``window`` is the max trailing row count including the current
    row. Rows early in a series are judged against their shorter
    prefix window (n < window), never skipped."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if c < 1:
        raise ValueError("c must be a positive integer")
    t = F.col(order_col).cast("long")
    x = F.col(value_col).cast("long")
    w = (Window.partitionBy(key_col).orderBy(t)
         .rowsBetween(-(window - 1), Window.currentRow))
    n = F.count("*").over(w)
    s = F.sum(x).over(w)
    q = F.sum(x * x).over(w)
    lhs = (n * x - s) * (n * x - s)
    rhs = F.lit(c * c) * (n * q - s * s)
    return (
        df.select(key_col, t.alias(order_col), x.alias(value_col))
        .withColumn("n", n.cast("long"))
        .withColumn("is_anomaly", (lhs > rhs) & (F.col("n") >= 2))
    )
