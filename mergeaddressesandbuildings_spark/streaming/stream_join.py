"""ST8 — stream-stream interval join (SURVEY.md §2.10): correlate two
event streams per key within a bounded time window, e.g. "error
followed by a click within 10 minutes" while both streams are still
flowing — the incremental twin of the batch self-join family
(``error_click_pairs``).

This is the one streaming shape where Spark keeps STATE ON BOTH SIDES:
each side buffers rows until the other side's watermark passes the
join-window upper bound, then evicts. The two ingredients that make
state bounded — and that this module therefore refuses to run without
— are (a) a watermark on BOTH inputs and (b) a time-RANGE predicate in
the join condition (equality-only stream-stream joins grow state
forever). Inner-join matches emit as soon as both rows are present, so
an ``availableNow`` replay over a static capture log converges to
exactly the batch join — the property the driver oracle checks.

Column names of the two sides must be disjoint (rename before the
join): a streaming self-join over one source lineage with shared names
would hit ambiguous-attribute resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(left: DataFrame, right: DataFrame,
                  left_key: str, right_key: str,
                  left_ts: str, right_ts: str,
                  max_delta_s: int,
                  watermark: str = "1 hour") -> DataFrame:
    """Inner-join ``left`` and ``right`` on key equality with
    ``left_ts <= right_ts <= left_ts + max_delta_s`` (inclusive both
    ends). Works identically on static frames (watermark is a no-op
    there), which is how the unit tests pin the semantics the
    streaming run must reproduce."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint, got {sorted(overlap)}"
        )
    if max_delta_s <= 0:
        raise ValueError("max_delta_s must be positive")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts)
           <= F.col(left_ts) + F.expr(f"interval {int(max_delta_s)} seconds"))
    )
    return lw.join(rw, cond)
