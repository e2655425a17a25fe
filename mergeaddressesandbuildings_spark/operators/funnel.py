"""Ordered-funnel conversion analytics over the events stream.

Standard earliest-transition funnel semantics: a user completes stage
k iff they performed stage k's event STRICTLY AFTER their earliest
completion time of stage k-1 (which is itself the earliest qualifying
time, recursively). Greedy-earliest is the conventional product-
analytics definition: it is order-deterministic, needs only MIN
aggregates, and never backtracks.

Determinism: stage times are exact integer epoch-micros and every
reduction is a MIN — associative, commutative, tie-free on values
(equal timestamps collapse to the same MIN; the STRICT > between
stages means simultaneous events never chain). Counts are exact
integers. Engine/parallelism/retry-invariant, driver-hashable.

Scale shape: per stage, ONE map-side-combinable conditional MIN agg
keyed by user + ONE equi-join back on user to gate the next stage —
stages are sequential by nature (stage k's filter needs stage k-1's
time), so an S-stage funnel is S hash aggs + S-1 user-keyed joins,
each shuffle bounded by the USERS-WHO-SURVIVED side, which shrinks
monotonically down the funnel. No window over the full event log, no
per-user collect_list of events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel_counts"]


def funnel_counts(events: DataFrame, stages: Sequence[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts_us") -> DataFrame:
    """→ (stage INT 1-based, event_type STRING, users BIGINT): how
    many users reached each funnel stage under earliest-transition
    semantics. ``ts_col`` must be an integer timestamp column."""
    if len(stages) < 1:
        raise ValueError("stages must be non-empty")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct")
    ev = events.select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("et"),
                       F.col(ts_col).cast("long").alias("t"))
    spark = events.sparkSession
    reached = None  # (u, t_k): earliest completion of current stage
    counts = []
    for k, stage in enumerate(stages, start=1):
        stage_ev = ev.filter(F.col("et") == stage)
        if reached is None:
            cur = stage_ev.groupBy("u").agg(F.min("t").alias("t"))
        else:
            cur = (
                stage_ev.join(reached.withColumnRenamed("t", "prev_t"), "u")
                .filter(F.col("t") > F.col("prev_t"))
                .groupBy("u").agg(F.min("t").alias("t"))
            )
        # survivors shrink monotonically; barrier the small table so
        # stage k+1 doesn't replay stages 1..k
        reached = cur.localCheckpoint(eager=True)
        counts.append((k, stage, reached.count()))
    return spark.createDataFrame(
        counts, schema="stage int, event_type string, users bigint")
