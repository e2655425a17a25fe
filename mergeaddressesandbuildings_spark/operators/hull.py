"""Per-group convex hulls — Andrew's monotone chain with INTEGER
cross products, the footprint/coverage-envelope step of a geospatial
pipeline (tile coverage outlines, cluster extents).

Determinism: input points are deduplicated, sorted by (x, y), and the
chain keeps only STRICT turns (cross > 0), so collinear interior
points are excluded and the hull vertex set plus its traversal order
are unique for any point set — no float epsilon, no tie ambiguity.
Cross products stay exact in int64 under the same ±MAX_COORD guard as
simplify.py.

Scale shape: hull construction is group-local → one ``applyInPandas``
group map (Arrow batches, numpy-sorted, O(n log n) per group), the
multimodal/simplify pattern. Output is (group, seq, x, y) with seq
the counter-clockwise traversal order starting from the
lexicographically smallest vertex — integers only, driver-hashable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from mergeaddressesandbuildings_spark.operators.simplify import MAX_COORD

__all__ = ["convex_hulls"]


def _hull_ccw(pts: np.ndarray) -> np.ndarray:
    """Monotone chain over DISTINCT lexicographically-sorted (x, y)
    int64 points → CCW hull vertices starting at the smallest point.
    Degenerate inputs: 1 point → itself; collinear set → its two
    extremes (strict turns drop the middle)."""
    n = len(pts)
    if n == 1:
        return pts

    def chain(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                cross = (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox)
                if cross <= 0:  # non-left turn: drop (strict hull)
                    out.pop()
                else:
                    break
            out.append((int(p[0]), int(p[1])))
        return out

    lower = chain(pts)
    upper = chain(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    if len(ring) == 0:  # 2 distinct points: both chains collapse
        ring = [tuple(pts[0]), tuple(pts[-1])]
    return np.array(ring, dtype=np.int64)


def convex_hulls(points: DataFrame, group_col: str,
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """→ (group, seq INT, x, y): each group's convex hull in CCW
    order from its lexicographically smallest vertex."""
    out_schema = f"{group_col} long, seq int, x long, y long"

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x_col].to_numpy(dtype=np.int64)
        ys = pdf[y_col].to_numpy(dtype=np.int64)
        if np.abs(xs).max(initial=0) > MAX_COORD or \
                np.abs(ys).max(initial=0) > MAX_COORD:
            raise ValueError("convex_hulls: coordinate exceeds "
                             "MAX_COORD — rescale the quantization")
        pts = np.unique(np.stack([xs, ys], axis=1), axis=0)  # lex sort
        ring = _hull_ccw(pts)
        g = int(pdf[group_col].iloc[0])
        return pd.DataFrame({
            group_col: np.full(len(ring), g, dtype=np.int64),
            "seq": np.arange(len(ring), dtype=np.int32),
            "x": ring[:, 0],
            "y": ring[:, 1],
        })

    return (points.select(group_col, x_col, y_col)
            .groupBy(group_col)
            .applyInPandas(one_group, schema=out_schema))
