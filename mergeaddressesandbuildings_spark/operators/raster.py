"""Raster ↔ vector operators (driver north_rule: "H3/S2 index,
point-in-polygon, kNN, raster↔vector").

A "raster" here is the engine's native grid: one row per level-L
Morton cell with integer x/y coords and an aggregated value — i.e.
zonal statistics over the tiling layer. All three directions are pure
relational plans (hash aggregate / equi-join / column math), so they
inherit the tiling layer's scale properties: one shuffle on the cell
key, pushdown-friendly, no Python in the hot path.

- rasterize_points: points → (cell, x, y, val) grid (count or
  sum/avg of a value column).
- raster_to_vector: grid → cell polygons (both the SQL-checkable
  bbox form and the ring form used by the geometry kernels).
- sample_raster: point → the raster value at its cell (broadcast-able
  equi-join; the raster is |distinct cells| ≤ |points|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells_sql


def _compact_xy(cell: Column, level: int) -> tuple[Column, Column]:
    body = cell.bitwiseXOR(F.lit(1 << (2 * level)))
    return cells_sql._compact(body), cells_sql._compact(F.shiftright(body, 1))


def rasterize_points(points: DataFrame, level: int = config.CELL_LEVEL,
                     value_col: str | None = None, agg: str = "count",
                     lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """points → (cell, x, y, val): the zonal aggregate per level-L cell.

    agg ∈ {count, sum, avg, min, max} over ``value_col`` (count ignores
    it). One hash aggregate — map-side partial combine, single shuffle.
    """
    cell = cells_sql.cell_expr(F.col(lat_col), F.col(lon_col), level)
    df = points.withColumn("cell", cell)
    if agg == "count":
        val = F.count("*").cast("double")
    else:
        val = getattr(F, agg)(F.col(value_col)).cast("double")
    g = df.groupBy("cell").agg(val.alias("val"))
    x, y = _compact_xy(F.col("cell"), level)
    return g.select("cell", x.alias("x"), y.alias("y"), "val")


def raster_to_vector(raster: DataFrame, threshold: float,
                     level: int = config.CELL_LEVEL,
                     with_rings: bool = False) -> DataFrame:
    """Grid cells with val ≥ threshold → vector rectangles.

    Output (cell, min_lat, min_lon, max_lat, max_lon, val) — the cell's
    geographic bounds as pure column math (n = 2^L; lat = y/n·180−90,
    lon = x/n·360−180), so an independent SQL engine can verify every
    vertex. ``with_rings=True`` additionally emits the closed ring
    arrays consumed by the PIP/overlap kernels, making the output a
    drop-in building-footprint-shaped table (vectorization direction of
    raster↔vector)."""
    n = float(1 << level)
    v = raster.filter(F.col("val") >= threshold)
    min_lat = F.col("y").cast("double") / n * 180.0 - 90.0
    max_lat = (F.col("y") + 1).cast("double") / n * 180.0 - 90.0
    min_lon = F.col("x").cast("double") / n * 360.0 - 180.0
    max_lon = (F.col("x") + 1).cast("double") / n * 360.0 - 180.0
    out = v.select(
        "cell",
        min_lat.alias("min_lat"), min_lon.alias("min_lon"),
        max_lat.alias("max_lat"), max_lon.alias("max_lon"),
        "val",
    )
    if not with_rings:
        return out
    return out.select(
        "*",
        F.array("min_lat", "min_lat", "max_lat", "max_lat", "min_lat").alias("ring_lats"),
        F.array("min_lon", "max_lon", "max_lon", "min_lon", "min_lon").alias("ring_lons"),
    )


def sample_raster(points: DataFrame, raster: DataFrame,
                  level: int = config.CELL_LEVEL,
                  lat_col: str = "lat", lon_col: str = "lon",
                  default: float = 0.0) -> DataFrame:
    """Attach the raster value at each point's cell (left join on the
    cell key; AQE broadcasts the raster when it is small)."""
    cell = cells_sql.cell_expr(F.col(lat_col), F.col(lon_col), level)
    return (
        points.withColumn("cell", cell)
        .join(raster.select("cell", "val"), "cell", "left")
        .withColumn("val", F.coalesce(F.col("val"), F.lit(default)))
    )
