"""S4 per-tile OSM XML writer: the merge result round-trips through
`.osm` files the engine's own reader can parse — nodes before ways,
ascending negative ids, merged addr tags on ways, conflict review
JSON emitted per tile."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.plans.merge import run_merge
from mergeaddressesandbuildings_spark.sources import osm_writer, osm_xml, pages as pg


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("osm_out"))
    res = run_merge(spark, pg.pages_df(spark, 300), pg.existing_osm_df(spark, 300))
    elements = osm_writer.merge_result_to_elements(
        res.assignments, res.addresses, res.buildings, res.tiles
    )
    manifest = osm_writer.write_osm_tiles(elements, out).collect()
    return out, manifest, res


def test_manifest_and_files(written):
    out, manifest, res = written
    assert manifest, "no tiles written"
    files = glob.glob(os.path.join(out, "tile=*.osm"))
    assert len(files) == len(manifest)
    total_ways = sum(m["n_ways"] for m in manifest)
    n_merged = res.assignments.filter(F.col("decision") == "MERGED").count()
    assert total_ways == n_merged


def test_files_reparse_with_own_reader(spark, written):
    out, manifest, res = written
    nodes = osm_xml.read_nodes(spark, os.path.join(out, "*.osm"))
    ways = osm_xml.read_ways(spark, os.path.join(out, "*.osm"))
    n_merged = res.assignments.filter(F.col("decision") == "MERGED").count()
    assert ways.count() == n_merged
    # every way carries the merged address tags
    w = ways.filter(F.col("tags")["addr:housenumber"].isNull()).count()
    assert w == 0
    # all ids negative (new-element convention), nodes resolve
    assert nodes.filter(F.col("id") >= 0).count() == 0
    from mergeaddressesandbuildings_spark.operators import ways as W
    rings = W.resolve_rings(nodes, ways)
    assert rings.count() == n_merged


def test_element_order_inside_file(written):
    out, manifest, _ = written
    path = manifest[0]["path"]
    kinds = []
    ids = []
    for line in open(path):
        line = line.strip()
        if line.startswith("<node id="):
            kinds.append("node")
            ids.append(int(line.split('id="')[1].split('"')[0]))
        elif line.startswith("<way id="):
            kinds.append("way")
    # O1: all nodes precede all ways; node ids ascending
    assert kinds == sorted(kinds, key=lambda k: 0 if k == "node" else 1)
    node_ids = ids[: kinds.count("node")]
    assert node_ids == sorted(node_ids)


def test_conflict_review_files(written):
    out, manifest, res = written
    n_conf_tiles = sum(1 for m in manifest if m["n_conflicts"] > 0)
    files = glob.glob(os.path.join(out, "*.review_conflicts.json"))
    assert len(files) == n_conf_tiles
    if files:
        data = json.load(open(files[0]))
        assert all("id" in d and "tags" in d for d in data)
