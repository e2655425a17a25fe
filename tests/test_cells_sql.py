"""cells_sql column expressions must be bit-identical to the numpy
kernels in cells.py (they implement the same §8.5 spec)."""

import numpy as np
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.functions import cells, cells_sql


def _points_df(spark, n=5000, seed=9):
    rng = np.random.default_rng(seed)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "lat": rng.uniform(-85, 85, n),
                "lon": rng.uniform(-179.9, 179.9, n),
                "lvl": rng.integers(1, 21, n),
            }
        )
    )


def test_cell_expr_matches_numpy(spark):
    df = _points_df(spark)
    rows = df.withColumn("cell", cells_sql.cell_expr(F.col("lat"), F.col("lon"), 12)).collect()
    lat = np.array([r["lat"] for r in rows])
    lon = np.array([r["lon"] for r in rows])
    want = cells.encode(lat, lon, 12)
    got = np.array([r["cell"] for r in rows])
    assert (got == want).all()


def test_cell_expr_per_row_level_matches_numpy(spark):
    df = _points_df(spark)
    rows = df.withColumn(
        "cell", cells_sql.cell_expr(F.col("lat"), F.col("lon"), F.col("lvl"))
    ).collect()
    lat = np.array([r["lat"] for r in rows])
    lon = np.array([r["lon"] for r in rows])
    lvl = np.array([r["lvl"] for r in rows])
    want = cells.encode_at_levels(lat, lon, lvl)
    got = np.array([r["cell"] for r in rows])
    assert (got == want).all()


def test_neighbors_expr_matches_numpy(spark):
    df = _points_df(spark, n=2000)
    df = df.withColumn("cell", cells_sql.cell_expr(F.col("lat"), F.col("lon"), 12))
    rows = df.withColumn("nb", cells_sql.neighbors_expr(F.col("cell"), 12)).collect()
    cell = np.array([r["cell"] for r in rows])
    want = cells.neighbors(cell)
    got = np.array([r["nb"] for r in rows])
    assert (np.sort(got, axis=1) == np.sort(want, axis=1)).all()
