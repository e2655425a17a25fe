"""P3: county-boundary filter (SURVEY.md §2.2 P3).

The reference drops elements outside the county polygon before any
merge work. Spark shape: a cheap bbox COLUMN predicate first (pushed
to the parquet/Iceberg scan — it prunes row groups via min/max stats),
then the exact ray-cast PIP refine on the survivors as one Arrow pass
with the boundary ring shipped as a Spark broadcast (a county boundary
is one small polygon; the broadcast is a few KB).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from mergeaddressesandbuildings_spark.functions import geom


def filter_in_boundary(df: DataFrame, ring_lat, ring_lon,
                       lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Keep rows whose (lat, lon) lies inside the closed boundary ring
    (point-on-edge counts as inside, §8.1)."""
    ring_lat = np.asarray(ring_lat, dtype=np.float64)
    ring_lon = np.asarray(ring_lon, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast((ring_lat, ring_lon))

    pre = df.filter(
        F.col(lat_col).between(float(ring_lat.min()), float(ring_lat.max()))
        & F.col(lon_col).between(float(ring_lon.min()), float(ring_lon.max()))
    )

    cols = pre.columns
    schema = pre.schema

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rlat, rlon = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            inside = geom.points_in_ring(
                pdf[lat_col].to_numpy(dtype=np.float64),
                pdf[lon_col].to_numpy(dtype=np.float64),
                rlat, rlon,
            )
            out = pdf.loc[inside, cols]
            if not out.empty:
                yield out

    return pre.mapInPandas(refine, schema=schema)
