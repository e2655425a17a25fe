"""Douglas-Peucker polyline simplification — the vector-geometry
reduction step of a tiling/rendering pipeline (boundary rings, way
geometries), kept INTEGER-EXACT so simplification decisions are
engine/parallelism/retry-invariant.

The float formulation (perpendicular distance = |cross| / |b-a|)
divides, and division drifts; this one never does: a point p is
farther than eps from chord (a, b) iff

    cross(b-a, p-a)^2  >  eps^2 * |b-a|^2

— both sides exact int64 for coordinates within ±~10^4 quantized
units (loudly guarded). Degenerate chords (a == b, e.g. closed rings)
fall back to squared point distance. Max-distance ties keep the
LOWEST index (np.argmax's first-hit), making the recursion
deterministic.

Scale shape: simplification is geometry-local, so the operator is an
``applyInPandas`` group map over line ids — Arrow batches in, one
numpy stack-based DP per geometry (no Python per-point driver work,
no shuffle beyond the one groupBy line_id) — exactly the
embarrassingly-parallel pandas-UDF pattern the multimodal family
uses. A 10^12-vertex corpus distributes by line id; a single
pathological geometry is the only hot key, the same profile as any
per-document operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["douglas_peucker", "MAX_COORD"]

MAX_COORD = 1 << 20  # |x|,|y| guard: keeps cross^2 and eps^2*len^2 in int64


def _dp_keep(xs: np.ndarray, ys: np.ndarray, eps2: int) -> np.ndarray:
    """Indices kept by integer DP over one polyline (points in
    stored order). Iterative explicit stack — no recursion limits."""
    n = len(xs)
    if n <= 2:
        return np.arange(n)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        px = xs[i + 1:j]
        py = ys[i + 1:j]
        dx, dy = bx - ax, by - ay
        if dx == 0 and dy == 0:
            # closed/degenerate chord: plain squared distance to a
            d2 = (px - ax) ** 2 + (py - ay) ** 2
            thresh = eps2
        else:
            cross = dx * (py - ay) - dy * (px - ax)
            d2 = cross * cross
            thresh = eps2 * (dx * dx + dy * dy)
        k = int(np.argmax(d2))  # ties -> lowest index: deterministic
        if d2[k] > thresh:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return np.flatnonzero(keep)


def douglas_peucker(lines: DataFrame, eps: int,
                    id_col: str = "line_id", idx_col: str = "pt_idx",
                    x_col: str = "x", y_col: str = "y") -> DataFrame:
    """→ (line_id, pt_idx) of the vertices each polyline keeps under
    integer-exact DP with tolerance ``eps`` (same units as the
    integer coordinates). Point order within a line follows
    ``idx_col``; coordinates outside ±MAX_COORD raise (int64
    overflow in cross^2 would otherwise corrupt comparisons
    silently)."""
    if eps < 0:
        raise ValueError("eps must be >= 0")
    eps2 = int(eps) * int(eps)
    out_schema = f"{id_col} long, {idx_col} long"

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col)
        xs = pdf[x_col].to_numpy(dtype=np.int64)
        ys = pdf[y_col].to_numpy(dtype=np.int64)
        if np.abs(xs).max(initial=0) > MAX_COORD or \
                np.abs(ys).max(initial=0) > MAX_COORD:
            raise ValueError(
                "douglas_peucker: coordinate exceeds MAX_COORD — "
                "rescale the quantization")
        kept = _dp_keep(xs, ys, eps2)
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[:1].repeat(len(kept))
            .to_numpy(dtype=np.int64),
            idx_col: pdf[idx_col].to_numpy(dtype=np.int64)[kept],
        })

    cols = [id_col, idx_col, x_col, y_col]
    return (lines.select(*cols)
            .groupBy(id_col)
            .applyInPandas(simplify, schema=out_schema))
