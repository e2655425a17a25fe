"""Relation-membership scoping (round-3 advisor findings): a building
way that is a member of a route/associatedStreet/boundary relation must
STILL appear as existing state (only way-typed outer/inner members of
type=multipolygon relations are folded into resolved polygons), and a
node member whose id collides with a way id (OSM id spaces overlap)
must never knock that way out."""

from __future__ import annotations

from mergeaddressesandbuildings_spark.sources import osm_xml

OSM = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="34.8000" lon="-82.4000"/>
  <node id="2" lat="34.8000" lon="-82.3990"/>
  <node id="3" lat="34.8010" lon="-82.3990"/>
  <node id="4" lat="34.8010" lon="-82.4000"/>
  <node id="5" lat="34.8020" lon="-82.4000"/>
  <node id="6" lat="34.8020" lon="-82.3990"/>
  <node id="7" lat="34.8030" lon="-82.3990"/>
  <node id="8" lat="34.8030" lon="-82.4000"/>
  <node id="100" lat="34.9000" lon="-82.5000"/>
  <way id="100">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
    <tag k="building" v="house"/>
  </way>
  <way id="101">
    <nd ref="5"/><nd ref="6"/><nd ref="7"/><nd ref="8"/><nd ref="5"/>
    <tag k="building" v="church"/>
  </way>
  <way id="102">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
    <tag k="building" v="garage"/>
  </way>
  <relation id="500">
    <member type="way" ref="100" role="outer"/>
    <tag k="type" v="multipolygon"/><tag k="building" v="yes"/>
  </relation>
  <relation id="501">
    <member type="way" ref="101" role=""/>
    <member type="node" ref="100" role="stop"/>
    <tag k="type" v="route"/><tag k="route" v="bus"/>
  </relation>
  <relation id="502">
    <member type="node" ref="102" role="admin_centre"/>
    <tag k="type" v="boundary"/>
  </relation>
</osm>
"""


def _tables(spark, tmp_path):
    p = tmp_path / "state.osm"
    p.write_text(OSM)
    return (
        osm_xml.read_nodes(spark, str(p)),
        osm_xml.read_ways(spark, str(p)),
        osm_xml.read_relations(spark, str(p)),
    )


def test_member_types_parsed(spark, tmp_path):
    _, _, rels = _tables(spark, tmp_path)
    r = {x["id"]: x for x in rels.collect()}
    assert r[501]["member_types"] == ["way", "node"]
    assert r[502]["member_types"] == ["node"]


def test_route_member_way_kept_as_existing(spark, tmp_path):
    nodes, ways, rels = _tables(spark, tmp_path)
    existing = osm_xml.to_existing_table(nodes, ways, rels)
    ways_out = {r["elem_id"]: r for r in existing.filter("kind = 'way'").collect()}
    # way 100: folded into multipolygon relation 500 → appears once, as rel id 500
    # way 101: member of a ROUTE relation → must remain a plain way
    # way 102: only a NODE member (id collision) references id 102 → must remain
    assert set(ways_out) == {500, 101, 102}
    assert ways_out[101]["tags"]["building"] == "church"
    assert ways_out[102]["tags"]["building"] == "garage"
    assert ways_out[500]["tags"]["type"] == "multipolygon"


def test_legacy_relations_frame_without_member_types(spark, tmp_path):
    """A relations frame from a pre-member_types parquet (no
    `member_types` column) must still flow through to_existing_table —
    members default to way-typed, so the multipolygon exclusion
    resolves identically to the typed path for way members."""
    nodes, ways, rels = _tables(spark, tmp_path)
    typed = osm_xml.to_existing_table(nodes, ways, rels)
    legacy = osm_xml.to_existing_table(nodes, ways, rels.drop("member_types"))
    t = {(r["elem_id"], r["kind"]) for r in typed.select("elem_id", "kind").collect()}
    l = {(r["elem_id"], r["kind"]) for r in legacy.select("elem_id", "kind").collect()}
    # the only divergence the default can introduce is node members
    # being treated as ways; this fixture's multipolygon members are
    # way-typed, so the two paths must agree exactly
    assert t == l
