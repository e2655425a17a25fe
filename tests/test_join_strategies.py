"""Strategy equivalence for the J1/J2 spatial join (SURVEY.md §2.3):
broadcast (numpy fine-cell index in a Spark broadcast), pair-join
(fine-cell equi-join + per-pair Arrow refine, the default shuffle
path), and cogroup (salted applyInPandas groups) must produce
identical winner sets — the physical strategy is a pure performance
choice, never a semantics choice."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.operators import extract, spatial_join as sj
from mergeaddressesandbuildings_spark.sources import pages as pg


@pytest.fixture(scope="module")
def corpus(spark):
    p = pg.pages_df(spark, 800)
    records = extract.extract_records(p, level=config.CELL_LEVEL).persist()
    addresses, buildings = extract.split_records(records)
    yield addresses.persist(), buildings.persist()
    records.unpersist()


def _fp(df):
    row = df.agg(
        F.expr("bit_xor(xxhash64(addr_id, building_id))").alias("fp"),
        F.count("*").alias("n"),
    ).collect()[0]
    return row["fp"], row["n"]


def test_pip_strategy_equivalence(spark, corpus):
    addresses, buildings = corpus
    bidx = sj.build_broadcast_index(
        buildings.select(
            "building_id", "ring_lats", "ring_lons",
            "min_lat", "min_lon", "max_lat", "max_lon", "area_m2",
        ).toPandas()
    )
    bc = _fp(sj.pick_pip_winner(
        sj.pip_candidates(addresses, buildings, broadcast_index=bidx)))
    pj = _fp(sj.pick_pip_winner(
        sj.pip_candidates(addresses, buildings, strategy="pairjoin")))
    cg = _fp(sj.pick_pip_winner(
        sj.pip_candidates(addresses, buildings, strategy="cogroup")))
    assert bc == pj == cg
    assert bc[1] > 0


def test_knn_strategy_equivalence(spark, corpus):
    addresses, buildings = corpus
    bidx = sj.build_broadcast_index(
        buildings.select(
            "building_id", "ring_lats", "ring_lons",
            "min_lat", "min_lon", "max_lat", "max_lon", "area_m2",
        ).toPandas()
    )
    bc = _fp(sj.pick_knn_winner(
        sj.knn_candidates(addresses, buildings, broadcast_index=bidx)))
    pj = _fp(sj.pick_knn_winner(
        sj.knn_candidates(addresses, buildings, strategy="pairjoin")))
    cg = _fp(sj.pick_knn_winner(
        sj.knn_candidates(addresses, buildings, strategy="cogroup")))
    assert bc == pj == cg
    assert bc[1] > 0
