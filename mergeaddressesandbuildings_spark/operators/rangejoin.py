"""Bucketized range join: point ∈ [lo, hi) containment as an
EQUI-join (SURVEY.md §13 — the 1-D sibling of the spatial join's cell
strategy, operators/spatial_join.py).

``points JOIN ranges ON lo <= p AND p < hi`` reaches Catalyst as a
theta join and executes as BroadcastNestedLoopJoin / cartesian — at
10^12 points that is O(P×R) comparisons and a single-task straggler.
The fix is the same trick the spatial join uses in 2-D: quantize the
domain into fixed-width buckets, explode each range to the buckets it
overlaps, and equi-join on the bucket id — candidates are then only
the (point, range) pairs sharing a bucket, and the exact predicate
filters false candidates inside the hash join's output, never a
nested loop.

Cost model (why the bucket width matters): a range spanning k buckets
is replicated k times, so the blowup is sum(ceil(span/width)+1) over
ranges; a point lands in exactly ONE bucket. Pick width ~ the median
range span to keep replication O(1) per range. A range wider than
``max_buckets_per_range`` buckets aborts LOUDLY (raise_error in the
plan, functions/cells.py's MAX_COVER_CELLS convention) instead of
silently exploding the shuffle — the caller re-buckets with a wider
width (ip-geolocation tables, session windows, and price bands all
have bounded spans in practice).

Exactness: buckets only ROUTE candidates; the final filter is the
original predicate on the original values, so the result is
bit-identical to the theta join the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["point_in_range_join"]


def point_in_range_join(points: DataFrame, ranges: DataFrame,
                        point_col: str, lo_col: str, hi_col: str,
                        bucket_width: int,
                        max_buckets_per_range: int = 4096) -> DataFrame:
    """Inner join of ``points`` to every range with
    ``lo <= point < hi`` (half-open, integer domain), executed as a
    bucket equi-join. Output: point columns then range columns.
    Ranges with hi <= lo match nothing (dropped — empty intervals).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    if max_buckets_per_range < 1:
        raise ValueError("max_buckets_per_range must be >= 1")
    # exact integer floor division (works below zero AND above 2^53,
    # where F.floor(x / w)'s double division misbuckets): subtract the
    # non-negative pmod remainder, then the division is exact
    def fdiv(c):
        return F.expr(
            f"(({c}) - pmod(({c}), {bucket_width})) DIV {bucket_width}")

    p_b = fdiv(point_col).cast("long")
    lo_b = fdiv(lo_col).cast("long")
    # hi is exclusive: the last covered bucket holds hi-1
    hi_b = fdiv(f"{hi_col} - 1").cast("long")
    n_b = hi_b - lo_b + F.lit(1)
    guard = F.when(
        n_b > max_buckets_per_range,
        F.expr(
            f"raise_error(concat('range spans > "
            f"{max_buckets_per_range} buckets of {bucket_width}: [', "
            f"{lo_col}, ', ', {hi_col}, ') — re-bucket with a wider "
            f"width'))").cast("long"),
    ).otherwise(hi_b)
    r_exp = (
        ranges.filter(F.col(hi_col) > F.col(lo_col))
        .withColumn("__bucket", F.explode(F.sequence(lo_b, guard)))
    )
    p_keyed = points.withColumn("__bucket", p_b)
    joined = p_keyed.join(r_exp, on="__bucket", how="inner").filter(
        (F.col(lo_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(hi_col)))
    return joined.select(*[p_keyed[c] for c in points.columns],
                         *[r_exp[c] for c in ranges.columns])
