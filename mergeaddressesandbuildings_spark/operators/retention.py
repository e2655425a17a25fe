"""Cohort retention and SCD2 validity-interval construction — the two
temporal-versioning shapes every events warehouse ends up needing.

Both are single-window / single-agg plans over exact integers, so
results are engine/parallelism/retry-invariant and driver-hashable.

cohort_retention: users are cohorted by the period of their FIRST
event; the (cohort, period_offset) matrix counts distinct users from
that cohort active at each later offset. Two map-side-combinable hash
aggs (first-seen per user; distinct (cohort, offset, user) collapse)
— the classic retention triangle with no window over the event log.

scd2_intervals: a change log (key, ts, value) becomes slowly-changing-
dimension type-2 rows (key, valid_from, valid_to, value) where
valid_to is the next change's timestamp (exclusive) or NULL for the
current row — ONE per-key window with lead(). The as-of join
(operators/temporal.py) is the point-lookup dual; this materializes
the full validity table for range predicates and Iceberg-style
time-travel snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cohort_retention", "scd2_intervals"]


def cohort_retention(events: DataFrame, user_col: str, ts_col: str,
                     period_us: int) -> DataFrame:
    """→ (cohort BIGINT, offset BIGINT, users BIGINT): ``cohort`` is
    the integer period index (ts // period_us) of each user's first
    event; ``offset`` the period delta >= 0 of later activity.
    ``ts_col`` must be integer (e.g. epoch micros)."""
    if period_us <= 0:
        raise ValueError("period_us must be positive")
    t = F.col(ts_col).cast("long")
    # (t - t%P)/P, not floor(t/P): the dividend is an exact multiple
    # of P, so the double division is exact for any epoch-like t
    # (< 2^53); a raw t/P quotient could round across an integer
    ev = events.select(F.col(user_col).alias("u"),
                       ((t - t % period_us) / period_us)
                       .cast("long").alias("p"))
    first = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    return (
        ev.join(first, "u")
        .select("u", "cohort", (F.col("p") - F.col("cohort")).alias("offset"))
        .distinct()
        .groupBy("cohort", "offset")
        .agg(F.count("*").cast("long").alias("users"))
    )


def scd2_intervals(changes: DataFrame, key_cols: list[str], ts_col: str,
                   value_cols: list[str]) -> DataFrame:
    """→ (keys..., valid_from BIGINT, valid_to BIGINT|NULL,
    values...): validity intervals [valid_from, valid_to) per key from
    a change log, ordered by the integer ``ts_col``. Equal-timestamp
    changes for one key are rejected loudly (their interval order
    would be nondeterministic — the one thing that would break
    engine-invariance)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col("_t"))
    dup = F.count("*").over(Window.partitionBy(*key_cols, "_t"))
    return (
        changes.select(*key_cols, F.col(ts_col).cast("long").alias("_t"),
                       *value_cols)
        .withColumn(
            "_t",
            F.when(dup == 1, F.col("_t")).otherwise(F.raise_error(F.lit(
                "scd2_intervals: duplicate (key, ts) change — interval "
                "order would be nondeterministic"))),
        )
        .select(
            *key_cols,
            F.col("_t").alias("valid_from"),
            F.lead("_t").over(w).alias("valid_to"),
            *value_cols,
        )
    )
