"""Bucketed co-located join surface (sources/bucketed.py): two tables
bucketed on the same key must join and aggregate with ZERO shuffle
Exchange in the physical plan — the storage-level co-location that
makes repeated building_id/doc-key joins shuffle-free at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.sources import bucketed as B


@pytest.fixture(scope="module")
def tables(spark):
    a = spark.range(0, 2000).select(
        F.col("id").alias("building_id"),
        (F.col("id") % 97).alias("x"),
    )
    b = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("building_id"),
        F.col("id").alias("addr_id"),
    )
    B.write_bucketed(a, "bkt_buildings", ["building_id"], n_buckets=8,
                     sort_cols=["building_id"])
    B.write_bucketed(b, "bkt_assignments", ["building_id"], n_buckets=8,
                     sort_cols=["building_id"])
    return (B.read_bucketed(spark, "bkt_buildings"),
            B.read_bucketed(spark, "bkt_assignments"))


def test_colocated_join_has_no_exchange(spark, tables):
    ta, tb = tables
    joined = ta.join(tb, "building_id")
    assert joined.count() == 6000
    assert B.n_exchanges(joined) == 0, joined._jdf.queryExecution().toString()


def test_unbucketed_join_does_shuffle(spark, tables):
    """Control: the same join from plain (non-bucketed) inputs shuffles
    — proving the zero-Exchange plan above comes from the bucket
    layout, not from broadcast or plan trivia."""
    ta, _ = tables
    plain = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("building_id"),
        F.col("id").alias("addr_id"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(plain, "building_id")
        joined.count()
        assert B.n_exchanges(joined) >= 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, tables):
    """groupBy on the bucket key: partial+final agg collapses to a
    single stage over the bucketed scan (no Exchange)."""
    _, tb = tables
    agg = tb.groupBy("building_id").agg(F.count("*").alias("n_addr"))
    assert agg.count() == 2000
    assert B.n_exchanges(agg) == 0


def test_bucketed_roundtrip_values(spark, tables):
    ta, tb = tables
    got = (
        ta.join(tb, "building_id")
        .groupBy("building_id").agg(F.count("*").alias("n"))
        .filter(F.col("n") != 3).count()
    )
    assert got == 0  # every building has exactly 3 assignments


def test_overwrite_with_stale_location_in_named_database(spark):
    """Round-3 review: the stale-location cleanup must target the
    managed layout <warehouse>/<db>.db/<table> for non-default
    databases — deleting <warehouse>/<table> instead leaves the real
    leftover in place and saveAsTable dies with
    LOCATION_ALREADY_EXISTS."""
    import os

    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    # simulate a leftover location from a dead session's metastore:
    # files on disk, no catalog entry
    loc = os.path.join(wh, "bktdb.db", "t_stale")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "junk"), "w") as f:
        f.write("stale")
    spark.sql("DROP TABLE IF EXISTS bktdb.t_stale")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    B.write_bucketed(df, "bktdb.t_stale", ["k"], n_buckets=4)
    got = B.read_bucketed(spark, "bktdb.t_stale")
    assert got.count() == 100
    spark.sql("DROP TABLE bktdb.t_stale")
    spark.sql("DROP DATABASE bktdb")
