"""P3 county-boundary filter vs the pure-numpy oracle, and the S1
table-format abstraction (parquet branch; the iceberg branch needs
runtime jars absent from this sandbox — SURVEY.md §9)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.functions import geom
from mergeaddressesandbuildings_spark.operators import boundary
from mergeaddressesandbuildings_spark.sources import catalog

# a non-convex (L-shaped) closed ring around (34.8, -82.4)
RING_LAT = np.array([34.70, 34.70, 34.80, 34.80, 34.90, 34.90, 34.70])
RING_LON = np.array([-82.50, -82.30, -82.30, -82.40, -82.40, -82.50, -82.50])


def test_boundary_filter_matches_oracle(spark):
    rng = np.random.RandomState(42)
    lat = 34.6 + rng.rand(2000) * 0.4
    lon = -82.6 + rng.rand(2000) * 0.4
    df = spark.createDataFrame(
        [(int(i), float(a), float(o)) for i, (a, o) in enumerate(zip(lat, lon))],
        "id long, lat double, lon double",
    )
    got = sorted(
        r["id"] for r in boundary.filter_in_boundary(df, RING_LAT, RING_LON).collect()
    )
    want = sorted(np.flatnonzero(
        geom.points_in_ring(lat, lon, RING_LAT, RING_LON)
    ).tolist())
    assert got == want
    assert 0 < len(got) < 2000


def test_boundary_filter_empty_outside(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
    assert boundary.filter_in_boundary(df, RING_LAT, RING_LON).count() == 0


def test_catalog_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    loc = str(tmp_path / "t")
    catalog.write_table(df, loc, fmt="parquet", partition_by=["k"])
    back = catalog.read_table(spark, loc, fmt="parquet")
    assert back.count() == 100
    assert sorted(back.columns) == ["id", "k"]
    assert back.agg(F.sum("id")).collect()[0][0] == 4950


def test_catalog_unknown_format_raises(spark, tmp_path):
    with pytest.raises(Exception):
        catalog.read_table(spark, str(tmp_path / "nope"), fmt="no-such-format")


def test_catalog_iceberg_path_routes_to_pure_python(spark, tmp_path):
    """fmt='iceberg' + a path location must round-trip through
    sources/iceberg.py (no runtime jars in the sandbox): create,
    append, and snapshot-isolated read all via the catalog facade."""
    from mergeaddressesandbuildings_spark.sources import iceberg as ice

    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 3).alias("k"))
    loc = str(tmp_path / "ice_t")
    catalog.write_table(df, loc, fmt="iceberg")
    catalog.write_table(
        spark.range(50, 80).select(F.col("id"),
                                   (F.col("id") % 3).alias("k")),
        loc, fmt="iceberg", mode="append")
    back = catalog.read_table(spark, loc, fmt="iceberg")
    assert back.count() == 80
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(80))
    # the facade wrote REAL v2 metadata: snapshots are addressable
    assert ice.snapshot_ids(loc) == [1, 2]
    # overwrite of an existing path-addressed table is refused loudly
    with pytest.raises(ValueError, match="append"):
        catalog.write_table(df, loc, fmt="iceberg", mode="overwrite")
