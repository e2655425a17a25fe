"""Interval concurrency analytics: peak simultaneous intervals per
key via a distributed sweep line.

Each interval [start, end) contributes a +1 event at start and a -1
at end; per key, the running sum over time-ordered events is the
concurrency curve, and its max is the peak. Ordering is
(t ASC, delta ASC), so at a shared instant the -1 lands before the
+1 — half-open semantics: an interval ending exactly when another
starts does NOT overlap it.

Determinism: all quantities are exact integers (epoch-micros
timestamps, ±1 deltas, integer running sums). Rows tied on (t, delta)
may be window-ordered arbitrarily, but equal-delta runs pass through
the same multiset of prefix sums whatever their order, and every row
in such a run shares the same t — so both the peak and the earliest
instant attaining it are engine/parallelism/retry-invariant and
driver-hashable.

Scale shape: ONE shuffle (the per-key window sort over 2x the input
rows); the peak + earliest-attainment extraction is a single hash agg
on a (run, -t) struct max — no second pass, no self-join, no driver
loop. A hot key degrades to a spill-aware window sort, the same
profile as quantiles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["max_concurrency"]


def max_concurrency(df: DataFrame, key: str,
                    start_col: str, end_col: str) -> DataFrame:
    """→ (key, peak: BIGINT, peak_at: BIGINT epoch-like integer) —
    peak concurrent [start, end) intervals per key and the earliest
    sweep instant attaining it. ``start_col``/``end_col`` must be
    integer-valued columns (e.g. unix_micros); rows with
    end <= start are rejected at plan time via a runtime assert
    column (they would corrupt the sweep silently)."""
    checked_end = F.when(
        F.col(end_col) > F.col(start_col), F.col(end_col)
    ).otherwise(F.raise_error(F.concat(
        F.lit("max_concurrency: non-positive interval for key "),
        F.col(key).cast("string"))))
    pts = (
        df.select(F.col(key), F.col(start_col).cast("long").alias("t"),
                  F.lit(1).alias("d"))
        .unionByName(
            df.select(F.col(key), checked_end.cast("long").alias("t"),
                      F.lit(-1).alias("d")))
    )
    w = (Window.partitionBy(key).orderBy("t", "d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = F.sum("d").over(w)
    return (
        pts.withColumn("run", run)
        .groupBy(key)
        .agg(F.max(F.struct(F.col("run").alias("r"),
                            (-F.col("t")).alias("nt"))).alias("m"))
        .select(key,
                F.col("m.r").cast("long").alias("peak"),
                (-F.col("m.nt")).cast("long").alias("peak_at"))
    )
