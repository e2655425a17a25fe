"""Exact distributed per-group quantiles by rank selection.

Semantics: the q-quantile of a group of n values is the value at
1-based ascending rank ``floor((n-1)*q) + 1`` — the "lower" discrete
quantile. No interpolation, no float arithmetic on the VALUES at all:
the only float op is the single IEEE multiply ``(n-1)*q``, identical
bits in every engine, and the output is a value that actually occurs
in the data. That is what makes exact quantiles driver-hashable where
``percentile_approx``/t-digest (sketch-merge-order-dependent) never
could be.

Scale shape: one shuffle — the per-group sort window. Exact quantiles
fundamentally need a per-group total order; Spark's window sort is
spill-aware (ExternalAppendOnlyUnsafeRowArray), so a hot group
degrades to disk, not OOM. Rank targets for ALL requested quantiles
are selected in the same pass (one window + one hash agg, no
per-quantile rescans). When groups are astronomically large and
approximate answers suffice, ``F.percentile_approx`` is the documented
sketch sibling — this operator is the exact keep-the-contract path
(the same exact-vs-approx pairing as similarity.py's brute vs LSH).
Ties: row_number order among equal values is nondeterministic, but
the SELECTED VALUE at a rank is order-invariant under value-sorted
ranking, so the result is still engine/parallelism/retry-exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["exact_group_quantiles"]


def exact_group_quantiles(df: DataFrame, keys: Sequence[str],
                          value_col: str,
                          qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
                          ) -> DataFrame:
    """→ one row per group: ``keys..., n, q<pct> per requested q``
    (e.g. q=0.25 → column ``q25``), plus ``n`` the exact group size."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("quantiles must be within [0, 1]")
    keys = list(keys)
    w_sort = Window.partitionBy(*keys).orderBy(value_col)
    w_all = Window.partitionBy(*keys)
    ranked = (
        df.select(*keys, value_col)
        .withColumn("rn", F.row_number().over(w_sort))
        .withColumn("n", F.count("*").over(w_all))
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        target = F.floor((F.col("n") - 1) * F.lit(float(q))) + 1
        aggs.append(
            F.max(F.when(F.col("rn") == target, F.col(value_col)))
            .alias(f"q{round(q * 100)}")
        )
    return ranked.groupBy(*keys).agg(*aggs)
