"""Temporal joins over captured web corpora (SURVEY.md §2 webpipe
family): distributed as-of join — "the state at-or-before time t".

The reference pipeline's latest-capture-wins rule
(operators/extract.py::latest_capture) is the degenerate as-of join
where every probe is t = +inf. The general form answers "which capture
of this url / which event of this user was live at time t" — snapshot
reconstruction, point-in-time training splits, crawl-freshness audits.

Implementation is the scalable union+window form, NOT a range join:
probes and states are unioned with a side marker, a single window per
key ordered by (ts, side) carries the last state forward with
``last(..., ignorenulls=True)``, and probe rows are filtered back out.
One shuffle on the key, no theta join, no per-row Python — the same
shape DuckDB/Pandas expose natively as ``ASOF JOIN`` /
``merge_asof``, which is exactly what the driver oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(probes: DataFrame, states: DataFrame,
              on: str, probe_ts: str, state_ts: str,
              value_cols: list[str],
              strict: bool = False) -> DataFrame:
    """For each probe row, attach the columns of the latest state row
    of the same ``on`` key with ``state_ts <= probe_ts``
    (``< probe_ts`` when ``strict``) — backward as-of join.

    Returns the probe rows plus ``value_cols`` and ``matched_ts``
    (the timestamp of the matched state row; all NULL when no state
    precedes the probe). Ties between states at the same timestamp
    must be resolved by the caller (e.g. keep max event per (key, ts))
    — the operator asserts nothing about intra-timestamp state order,
    same contract as DuckDB's ASOF JOIN.

    Scale shape: ``union → window(partitionBy key, orderBy ts, side)``
    — one hash shuffle on the key, linear scan per partition, no
    range/theta join. Skewed keys behave like any window (AQE handles
    stragglers); probes and states never cross keys.
    """
    probe_keep = [c for c in probes.columns]
    # side: states sort BEFORE probes at equal ts so "at-or-before" is
    # inclusive; strict mode flips the order so equal-ts states are
    # not yet visible
    state_side, probe_side = (0, 1) if not strict else (2, 1)
    # all state payload rides ONE struct that is null exactly on probe
    # rows — last(ignorenulls) then carries the whole latest state row
    # even when individual value columns are legitimately NULL in it
    s = states.select(
        F.col(on).alias("_k"),
        F.col(state_ts).cast("timestamp").alias("_ts"),
        F.lit(state_side).alias("_side"),
        F.struct(F.col(state_ts).cast("timestamp").alias("_mts"),
                 *[F.col(c) for c in value_cols]).alias("_state"),
        *[F.lit(None).alias(f"_p_{c}") for c in probe_keep],
    )
    p = probes.select(
        F.col(on).alias("_k"),
        F.col(probe_ts).cast("timestamp").alias("_ts"),
        F.lit(probe_side).alias("_side"),
        F.lit(None).cast(s.schema["_state"].dataType).alias("_state"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_keep],
    )
    w = (Window.partitionBy("_k").orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (
        s.unionByName(p)
        .select(
            "*",
            F.last("_state", ignorenulls=True).over(w).alias("_m"),
        )
        .where(F.col("_side") == probe_side)
    )
    return carried.select(
        *[F.col(f"_p_{c}").alias(c) for c in probe_keep],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
        F.col("_m._mts").alias("matched_ts"),
    )
