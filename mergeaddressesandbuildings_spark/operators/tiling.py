"""T4/T5: adaptive tile split and tile membership (SURVEY.md §2.7,
§8.5/§8.7).

Tile universe = one point per output element: each address (assignment)
at its coordinates, each building at its ring centroid. Starting at
CELL_LEVEL, any tile whose element count exceeds the budget splits into
its 4 Morton children (prefix-coded ids make child = 4*parent+q);
iterate until no tile exceeds the budget or MAX_CELL_LEVEL.

Scale notes:
- the encode is a pure column expression (cells_sql) — whole-stage
  codegen, no Python round trip per iteration;
- each round is one hash aggregate (count per tile) of which only the
  OVER-BUDGET tile ids are collected (≤ total/budget entries — bounded
  and tiny); convergence ≤ MAX_CELL_LEVEL − CELL_LEVEL rounds, 1–2 in
  practice (only hot urban cells split);
- deterministic: the split set is a pure function of global counts, so
  the result is parallelism-invariant (SURVEY.md §5.2-5).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells, cells_sql


def assign_tiles(points: DataFrame,
                 budget: int = config.TILE_MAX_ELEMS,
                 level: int = config.CELL_LEVEL,
                 max_level: int = config.MAX_CELL_LEVEL) -> DataFrame:
    """points(elem_id, lat, lon, ...) → same + ``tile`` column."""
    df = points.withColumn("_lvl", F.lit(level)).withColumn(
        "tile", cells_sql.cell_expr(F.col("lat"), F.col("lon"), level)
    )
    for lvl in range(level, max_level):
        over = [
            r["tile"]
            for r in df.groupBy("tile").count().filter(F.col("count") > budget).collect()
        ]
        over_at_lvl = [
            t for t in over if int(cells.level_of(np.array([t]))[0]) == lvl
        ]
        if not over_at_lvl:
            break
        hot = F.col("tile").isin(over_at_lvl)
        df = df.withColumn(
            "_lvl", F.when(hot, F.col("_lvl") + 1).otherwise(F.col("_lvl"))
        ).withColumn(
            "tile",
            F.when(
                hot,
                cells_sql.cell_expr(F.col("lat"), F.col("lon"), F.col("_lvl")),
            ).otherwise(F.col("tile")),
        )
    return df.drop("_lvl")


def tile_points(assignments: DataFrame, buildings: DataFrame) -> DataFrame:
    """The tile universe (§8.7): addresses at their point, buildings at
    their centroid."""
    a = assignments.select(
        F.col("addr_id").alias("elem_id"), "lat", "lon",
        F.lit("address").alias("elem_kind"),
    )
    b = buildings.select(
        F.col("building_id").alias("elem_id"),
        F.col("centroid_lat").alias("lat"),
        F.col("centroid_lon").alias("lon"),
        F.lit("building").alias("elem_kind"),
    )
    return a.unionByName(b)
