"""Golden merge-parity suite (SURVEY.md §5.2-3/4/7): the full Spark
pipeline must reproduce the independent pure-Python §8 oracle exactly —
same assignments, same decision sets, same tile membership — plus the
byte-parity and property-based invariants."""

import numpy as np
import pytest

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.plans.merge import run_merge
from mergeaddressesandbuildings_spark.sources import pages as pg

from tests import oracle as orc

N_PAGES = 400


@pytest.fixture(scope="module")
def fixture_rows():
    page_rows, existing_rows = [], []
    for i in range(N_PAGES):
        p, e = pg._gen_page(i)
        page_rows.extend(p)
        existing_rows.extend(e)
    return page_rows, existing_rows


@pytest.fixture(scope="module")
def golden(fixture_rows):
    page_rows, existing_rows = fixture_rows
    return orc.run_oracle(page_rows, existing_rows)


@pytest.fixture(scope="module")
def engine(spark):
    p = pg.pages_df(spark, N_PAGES, partitions=4)
    e = pg.existing_osm_df(spark, N_PAGES, partitions=4)
    return run_merge(spark, p, e)


def test_scenario_coverage(golden):
    """The fixture must exercise every decision family (FIXTURES.md §3)."""
    decisions = {r["decision"] for r in golden["assignments"].values()}
    assert decisions == {"MERGED", "KEEP_NODE", "CONFLICT", "STANDALONE"}
    methods = {r["method"] for r in golden["assignments"].values()}
    assert methods == {"PIP", "KNN", "NONE"}
    set_names = {s for _, s in golden["sets"]}
    assert set_names == {"merged", "untouched", "conflict", "new_building", "new_node"}


def test_assignments_match_oracle(engine, golden):
    got = {
        r["addr_id"]: r
        for r in engine.assignments.select(
            "addr_id", "building_id", "method", "dist_m", "decision"
        ).collect()
    }
    want = golden["assignments"]
    assert set(got) == set(want), (
        f"addr universe differs: engine-only={len(set(got)-set(want))}, "
        f"oracle-only={len(set(want)-set(got))}"
    )
    mismatches = []
    for aid, w in want.items():
        g = got[aid]
        if (g["building_id"], g["method"], g["decision"]) != (
            w["building_id"], w["method"], w["decision"]
        ):
            mismatches.append((aid, dict(g.asDict()), w))
        elif w["dist_m"] is not None and abs(g["dist_m"] - w["dist_m"]) > 1e-6:
            mismatches.append((aid, dict(g.asDict()), w))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[:3]}"


def test_sets_match_oracle(engine, golden):
    got = {(r["elem_id"], r["set"]) for r in engine.sets.collect()}
    want = set(golden["sets"])
    assert got == want, (
        f"engine-only={sorted(got - want)[:5]} oracle-only={sorted(want - got)[:5]}"
    )


def test_tiles_match_oracle(engine, golden):
    got = {r["elem_id"]: r["tile"] for r in engine.tiles.collect()}
    want = golden["tiles"]
    assert got == want


def test_text_byte_parity(spark):
    from mergeaddressesandbuildings_spark.operators.extract import text_parity_violations

    p = pg.pages_df(spark, 200, partitions=4)
    assert text_parity_violations(p).count() == 0


def test_properties(engine, golden, fixture_rows):
    """§5.2-7 property-based invariants."""
    rows = engine.assignments.collect()
    # decisions partition the address set
    assert len(rows) == len(golden["assignments"])
    for r in rows:
        if r["method"] == "KNN":
            assert r["dist_m"] <= config.KNN_CUTOFF_M + 1e-9
        if r["method"] == "NONE":
            assert r["decision"] == "STANDALONE" and r["building_id"] is None
        if r["method"] == "PIP":
            assert r["dist_m"] == 0.0
    # every element appears in exactly one tile
    tiles = engine.tiles.collect()
    assert len({t["elem_id"] for t in tiles}) == len(tiles)


def test_no_id_collisions(engine):
    a = engine.addresses.count()
    assert engine.addresses.select("addr_id").distinct().count() == a
    b = engine.buildings.count()
    assert engine.buildings.select("building_id").distinct().count() == b


def test_pairjoin_strategy_full_pipeline_parity(spark, golden):
    """The corpus-scale shuffle strategy (broadcast disabled →
    fine-cell pair-join) reproduces the §8 oracle exactly too — the
    physical strategy never changes the merge decisions."""
    p = pg.pages_df(spark, N_PAGES, partitions=4)
    e = pg.existing_osm_df(spark, N_PAGES, partitions=4)
    res = run_merge(spark, p, e, broadcast_max=0)
    got = {
        r["addr_id"]: (r["building_id"], r["method"], r["decision"])
        for r in res.assignments.collect()
    }
    want = {
        aid: (r["building_id"], r["method"], r["decision"])
        for aid, r in golden["assignments"].items()
    }
    assert got == want
