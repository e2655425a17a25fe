"""S4: per-tile OSM XML output + review files (SURVEY.md §2.1 S4,
§2.6 O1) — the reference's deliverable is one uploadable `.osm` file
per chunk plus human-review files for conflicts.

Spark shape: one `applyInPandas` group per tile writes
`tile=<id>.osm` — element order inside a file is the reference's:
nodes before ways, ascending id (O1) — plus a `review_conflicts.json`
per tile when conflicts exist. New elements carry deterministic
NEGATIVE ids derived from the stable 64-bit hash (§8.6): OSM
convention marks new elements with negative ids; hashing keeps them
parallelism-invariant where the reference's sequential counter is not.

Files are written from executors, so ``out_dir`` must be shared
storage on a real cluster (local fs in local mode); the returned
DataFrame (tile, path, n_nodes, n_ways, n_conflicts) is the manifest.
"""

from __future__ import annotations

import json
import os
from typing import Iterator
from xml.sax.saxutils import quoteattr

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _neg(id64: int) -> int:
    return -abs(int(id64)) or -1


def _tag_xml(tags: dict | None) -> str:
    if not tags:
        return ""
    return "".join(
        f"\n    <tag k={quoteattr(str(k))} v={quoteattr(str(v))}/>"
        for k, v in sorted(tags.items())
    )


def write_osm_tiles(elements: DataFrame, out_dir: str) -> DataFrame:
    """``elements`` rows (one per output element, already tiled):

      tile long, elem_kind string ('node'|'way'), id long,
      lat double, lon double,              -- nodes
      ring_lats array<double>, ring_lons array<double>,  -- ways
      tags map<string,string>, decision string

    Writes ``<out_dir>/tile=<tile>.osm`` (+ review JSON for CONFLICT
    rows) and returns the per-tile manifest."""
    os.makedirs(out_dir, exist_ok=True)

    def write_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iat[0])
        pdf = pdf.sort_values(["elem_kind", "id"])
        nodes, ways, conflicts = [], [], []
        node_seq: dict[tuple, int] = {}  # shared way vertices dedupe (A4)
        # synthesized way-vertex ids: sequential negative counter per
        # tile (deterministic — the iteration order is sorted), skipping
        # every hash-derived element-NODE id so a vertex can never
        # collide with an address node and corrupt geometry silently.
        # (Way ids live in OSM's separate way id-space — no clash.)
        elem_node_ids = {
            _neg(i) for i in pdf.loc[pdf["elem_kind"] == "node", "id"]
        }
        vseq = [0]

        def next_vertex_id() -> int:
            vseq[0] -= 1
            while vseq[0] in elem_node_ids:
                vseq[0] -= 1
            return vseq[0]

        for row in pdf.itertuples(index=False):
            tags = dict(row.tags) if row.tags else {}
            if row.decision == "CONFLICT":
                conflicts.append({"id": int(row.id), "tags": tags})
            if row.elem_kind == "node":
                nodes.append(
                    (
                        _neg(row.id),
                        f'  <node id="{_neg(row.id)}" lat="{float(row.lat)!r}" '
                        f'lon="{float(row.lon)!r}">{_tag_xml(tags)}\n  </node>',
                    )
                )
            else:
                refs = []
                for la, lo in zip(row.ring_lats, row.ring_lons):
                    key = (round(float(la), 7), round(float(lo), 7))
                    if key not in node_seq:
                        nid = next_vertex_id()
                        node_seq[key] = nid
                        nodes.append(
                            (nid,
                             f'  <node id="{nid}" lat="{float(la)!r}" '
                             f'lon="{float(lo)!r}"/>')
                        )
                    refs.append(node_seq[key])
                nd = "".join(f'\n    <nd ref="{r}"/>' for r in refs)
                ways.append(
                    (
                        _neg(row.id),
                        f'  <way id="{_neg(row.id)}">{nd}{_tag_xml(tags)}\n  </way>',
                    )
                )

        # O1: nodes before ways, ascending id, deduped
        seen: set[int] = set()
        body: list[str] = []
        for nid, xml in sorted(nodes):
            if nid not in seen:
                seen.add(nid)
                body.append(xml)
        for wid, xml in sorted(ways):
            body.append(xml)

        path = os.path.join(out_dir, f"tile={tile}.osm")
        with open(path, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            f.write('<osm version="0.6" generator="spark-merge-engine">\n')
            f.write("\n".join(body))
            f.write("\n</osm>\n")
        if conflicts:
            with open(os.path.join(out_dir, f"tile={tile}.review_conflicts.json"),
                      "w", encoding="utf-8") as f:
                json.dump(conflicts, f, sort_keys=True, indent=1)
        return pd.DataFrame([{
            "tile": tile,
            "path": path,
            "n_nodes": len(seen),
            "n_ways": len(ways),
            "n_conflicts": len(conflicts),
        }])

    return (
        elements.groupBy("tile")
        .applyInPandas(
            lambda _key, pdf: write_tile(pdf),
            schema="tile long, path string, n_nodes long, n_ways long, n_conflicts long",
        )
    )


def merge_result_to_elements(assignments: DataFrame, addresses: DataFrame,
                             buildings: DataFrame, tiles: DataFrame) -> DataFrame:
    """MergeResult pieces → the writer's element table: KEEP_NODE /
    STANDALONE / CONFLICT addresses as nodes, MERGED buildings as ways
    carrying the merged addr tags (§8.4 decision semantics)."""
    t = tiles.select("elem_id", "tile")
    addr_tags = addresses.select(
        "addr_id",
        F.map_filter(
            F.create_map(
                F.lit("addr:housenumber"), F.col("housenumber"),
                F.lit("addr:street"), F.col("street"),
                F.lit("addr:unit"), F.col("unit"),
                F.lit("addr:city"), F.col("city"),
                F.lit("addr:state"), F.col("state"),
                F.lit("addr:postcode"), F.col("postcode"),
            ),
            lambda _k, v: v.isNotNull(),
        ).alias("_atags"),
    )
    a = assignments.join(addr_tags, "addr_id")
    addr_nodes = (
        a.filter(F.col("decision") != F.lit("MERGED"))
        .join(t, a["addr_id"] == t["elem_id"]).drop("elem_id")
        .select(
            "tile", F.lit("node").alias("elem_kind"),
            F.col("addr_id").alias("id"), "lat", "lon",
            F.lit(None).cast("array<double>").alias("ring_lats"),
            F.lit(None).cast("array<double>").alias("ring_lons"),
            F.col("_atags").alias("tags"),
            "decision",
        )
    )
    merged = (
        a.filter(F.col("decision") == F.lit("MERGED"))
        .select("building_id", "_atags", "decision")
        .join(buildings, "building_id")
    )
    bld_ways = (
        merged.join(t, merged["building_id"] == t["elem_id"]).drop("elem_id")
        .select(
            "tile", F.lit("way").alias("elem_kind"),
            F.col("building_id").alias("id"),
            F.lit(None).cast("double").alias("lat"),
            F.lit(None).cast("double").alias("lon"),
            "ring_lats", "ring_lons",
            F.map_concat(
                # drop any addr:* already on the way first — map_concat
                # raises on duplicate keys (mapKeyDedupPolicy=EXCEPTION),
                # and the address's tags win by §8.4
                F.map_filter(
                    F.coalesce("tags", F.create_map().cast("map<string,string>")),
                    lambda k, _v: ~k.startswith("addr:"),
                ),
                F.col("_atags"),
            ).alias("tags"),
            "decision",
        )
    )
    return addr_nodes.unionByName(bld_ways)


def write_pbf_tiles(elements: DataFrame, out_dir: str) -> DataFrame:
    """S4 variant: same element table, `.osm.pbf` container —
    ``<out_dir>/tile=<tile>.osm.pbf`` per tile via osm_pbf.write_pbf.

    Element semantics are the XML writer's exactly (negative new-element
    ids, per-tile sequential vertex ids skipping element-node ids,
    shared-vertex dedupe at 1e-7, nodes-before-ways ascending order);
    coordinates quantize to the PBF 100-nanodegree grid (standard OSM
    precision — the XML variant keeps full float repr). Kept as a twin
    of write_osm_tiles rather than a shared assembler so the golden XML
    bytes stay untouchable."""
    from mergeaddressesandbuildings_spark.sources import osm_pbf

    os.makedirs(out_dir, exist_ok=True)

    def write_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iat[0])
        pdf = pdf.sort_values(["elem_kind", "id"])
        nodes: list[tuple] = []
        ways: list[tuple] = []
        node_seq: dict[tuple, int] = {}
        elem_node_ids = {
            _neg(i) for i in pdf.loc[pdf["elem_kind"] == "node", "id"]
        }
        vseq = [0]

        def next_vertex_id() -> int:
            vseq[0] -= 1
            while vseq[0] in elem_node_ids:
                vseq[0] -= 1
            return vseq[0]

        for row in pdf.itertuples(index=False):
            tags = dict(row.tags) if row.tags else {}
            if row.elem_kind == "node":
                nodes.append((_neg(row.id), float(row.lat), float(row.lon), tags))
            else:
                refs = []
                for la, lo in zip(row.ring_lats, row.ring_lons):
                    key = (round(float(la), 7), round(float(lo), 7))
                    if key not in node_seq:
                        nid = next_vertex_id()
                        node_seq[key] = nid
                        nodes.append((nid, float(la), float(lo), {}))
                    refs.append(node_seq[key])
                ways.append((_neg(row.id), refs, tags))

        seen: set[int] = set()
        node_rows = []
        for nid, la, lo, tags in sorted(nodes, key=lambda t: t[0]):
            if nid not in seen:
                seen.add(nid)
                node_rows.append({"id": nid, "lat": la, "lon": lo, "tags": tags})
        way_rows = [
            {"id": wid, "node_refs": refs, "tags": tags}
            for wid, refs, tags in sorted(ways, key=lambda t: t[0])
        ]

        path = os.path.join(out_dir, f"tile={tile}.osm.pbf")
        osm_pbf.write_pbf(path, node_rows, way_rows)
        return pd.DataFrame([{
            "tile": tile,
            "path": path,
            "n_nodes": len(node_rows),
            "n_ways": len(way_rows),
        }])

    return (
        elements.groupBy("tile")
        .applyInPandas(
            lambda _key, pdf: write_tile(pdf),
            schema="tile long, path string, n_nodes long, n_ways long",
        )
    )
