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


def test_pbf_tiles_match_xml_tiles(spark, written, tmp_path):
    """S4 PBF variant: same elements through write_pbf_tiles — per-tile
    node/way counts equal the XML manifest's, files re-read with the
    engine's own PBF reader, tags survive, coords are the XML values
    quantized to the 100-nanodegree PBF grid."""
    from mergeaddressesandbuildings_spark.sources import osm_pbf, osm_writer as W

    out_xml, manifest, res = written
    out_pbf = str(tmp_path / "pbf_out")
    elements = W.merge_result_to_elements(
        res.assignments, res.addresses, res.buildings, res.tiles
    )
    pbf_manifest = {m["tile"]: m for m in W.write_pbf_tiles(elements, out_pbf).collect()}
    xml_manifest = {m["tile"]: m for m in manifest}
    assert set(pbf_manifest) == set(xml_manifest)
    for t, m in xml_manifest.items():
        assert pbf_manifest[t]["n_nodes"] == m["n_nodes"]
        assert pbf_manifest[t]["n_ways"] == m["n_ways"]

    glob_pbf = os.path.join(out_pbf, "*.osm.pbf")
    p_nodes = osm_pbf.read_nodes(spark, glob_pbf)
    p_ways = osm_pbf.read_ways(spark, glob_pbf)
    assert p_ways.count() == sum(m["n_ways"] for m in manifest)
    assert p_nodes.count() == sum(m["n_nodes"] for m in manifest)

    # XML twin comparison on ONE tile (synthesized vertex ids are
    # per-file unique — OSM negative-id semantics — so a multi-file
    # glob would collide ids across tiles): ids identical; coords are
    # the XML values quantized to the PBF grid
    tile = min(xml_manifest)
    x_nodes = {r["id"]: r for r in
               osm_xml.read_nodes(spark, xml_manifest[tile]["path"]).collect()}
    got = {r["id"]: r for r in
           osm_pbf.read_nodes(spark, pbf_manifest[tile]["path"]).collect()}
    assert set(got) == set(x_nodes)
    for nid in list(got)[:50]:
        g, x = got[nid], x_nodes[nid]
        assert g["lat"] == (100 * round(x["lat"] / 1e-9 / 100)) * 1e-9
        assert g["lon"] == (100 * round(x["lon"] / 1e-9 / 100)) * 1e-9
        assert dict(g["tags"]) == dict(x["tags"])
    x_ways = {r["id"]: r for r in
              osm_xml.read_ways(spark, xml_manifest[tile]["path"]).collect()}
    g_ways = {r["id"]: r for r in
              osm_pbf.read_ways(spark, pbf_manifest[tile]["path"]).collect()}
    assert set(g_ways) == set(x_ways)
    for wid, g in g_ways.items():
        assert list(g["node_refs"]) == list(x_ways[wid]["node_refs"])
        assert dict(g["tags"]) == dict(x_ways[wid]["tags"])
