"""J7: way → node resolution join (SURVEY.md §2.3 J7) — materialize
building rings from OSM (nodes, ways) tables so real `.osm` input
flows into the same merge pipeline as extracted web-page records.

Spark shape: ``posexplode(node_refs)`` keeps each ref's position, an
equi-join on node id attaches coordinates, and an ordered
``array_agg`` (sorted by position inside the group) rebuilds the ring —
all shuffles are on the node-id / way-id keys, no per-row Python. The
ring-derived columns (bbox, centroid, area, cell cover) are then
computed by one Arrow pass sharing the extraction kernels, yielding
rows in the engine's buildings schema.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells, geom


def resolve_rings(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """ways(id, node_refs, tags) + nodes(id, lat, lon) →
    (id, tags, ring_lats, ring_lons) with vertices in ref order.

    Ways referencing a missing node are DROPPED (count them upstream if
    needed) — a partial ring is not a polygon.
    """
    refs = ways.select(
        F.col("id").alias("way_id"), "tags",
        F.posexplode("node_refs").alias("pos", "node_id"),
        F.size("node_refs").alias("n_refs"),
    )
    # a node id defined in several input files (shared border nodes in
    # a multi-county .osm glob) would otherwise duplicate ref rows and
    # make size(_ordered) exceed n_refs, silently discarding a fully
    # resolvable way — dedupe the nodes side first
    joined = refs.join(
        nodes.select(F.col("id").alias("node_id"), "lat", "lon")
        .dropDuplicates(["node_id"]),
        "node_id",
    )
    return (
        joined.groupBy("way_id", "n_refs")
        .agg(
            F.first("tags").alias("tags"),
            F.sort_array(
                F.collect_list(F.struct("pos", "lat", "lon"))
            ).alias("_ordered"),
        )
        .filter(F.size("_ordered") == F.col("n_refs"))  # drop partial rings
        .select(
            F.col("way_id").alias("id"),
            "tags",
            F.transform("_ordered", lambda s: s["lat"]).alias("ring_lats"),
            F.transform("_ordered", lambda s: s["lon"]).alias("ring_lons"),
        )
    )


def rings_to_buildings(rings: DataFrame,
                       level: int = config.CELL_LEVEL) -> DataFrame:
    """Ring table → the engine's buildings schema (bbox, centroid,
    shoelace area, Morton cell cover) via one Arrow pass using the same
    numpy kernels as web-page extraction — bit-identical derived values
    regardless of which source produced the ring."""
    schema = (
        "building_id long, tags map<string,string>, "
        "ring_lats array<double>, ring_lons array<double>, "
        "min_lat double, min_lon double, max_lat double, max_lon double, "
        "centroid_lat double, centroid_lon double, area_m2 double, "
        "cell long, cells array<long>"
    )

    def derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for row in pdf.itertuples(index=False):
                rlat = np.asarray(row.ring_lats, dtype=np.float64)
                rlon = np.asarray(row.ring_lons, dtype=np.float64)
                if len(rlat) < 4:
                    continue
                min_lat, min_lon, max_lat, max_lon = geom.ring_bbox(rlat, rlon)
                clat, clon = geom.ring_centroid(rlat, rlon)
                cover = cells.cover_bbox(
                    np.array([min_lat]), np.array([min_lon]),
                    np.array([max_lat]), np.array([max_lon]), level,
                )[0]
                out.append({
                    "building_id": int(row.id),
                    "tags": row.tags,
                    "ring_lats": rlat.tolist(),
                    "ring_lons": rlon.tolist(),
                    "min_lat": min_lat, "min_lon": min_lon,
                    "max_lat": max_lat, "max_lon": max_lon,
                    "centroid_lat": clat, "centroid_lon": clon,
                    "area_m2": geom.ring_area_m2(rlat, rlon),
                    "cell": int(cells.encode(
                        np.array([clat]), np.array([clon]), level)[0]),
                    "cells": [int(c) for c in cover],
                })
            if out:
                yield pd.DataFrame(out)

    return rings.mapInPandas(derive, schema=schema)


def assemble_boundary_ring(nodes: DataFrame, ways: DataFrame,
                           relations: DataFrame, rel_id: int,
                           role: str = "outer"):
    """Assemble a boundary relation's member ways into one closed ring
    (reference behavior: the county boundary arrives as a relation of
    ordered-or-not way segments).

    A boundary is ONE small object, so the member polylines are
    collected to the driver and stitched there by endpoint matching
    (each segment joined forward or reversed); the result feeds
    operators/boundary.filter_in_boundary as plain numpy arrays.
    Raises if the members do not close into a single ring.
    """
    rel = relations.filter(F.col("id") == rel_id).collect()
    if not rel:
        raise ValueError(f"relation {rel_id} not found")
    members = [
        m for m, r in zip(rel[0]["member_refs"], rel[0]["member_roles"])
        if r == role
    ]
    if not members:
        raise ValueError(f"relation {rel_id} has no '{role}' members")

    segs = {}
    rows = resolve_rings(
        nodes, ways.filter(F.col("id").isin([int(m) for m in members]))
    ).collect()
    for r in rows:
        segs[int(r["id"])] = (
            np.asarray(r["ring_lats"], dtype=np.float64),
            np.asarray(r["ring_lons"], dtype=np.float64),
        )
    missing = [m for m in members if int(m) not in segs]
    if missing:
        raise ValueError(f"member ways unresolved (missing nodes?): {missing}")

    first = segs.pop(int(members[0]))
    chain_lat, chain_lon = list(first[0]), list(first[1])
    while segs:
        end = (chain_lat[-1], chain_lon[-1])
        for wid, (sla, slo) in list(segs.items()):
            if (sla[0], slo[0]) == end:
                chain_lat.extend(sla[1:]); chain_lon.extend(slo[1:])
            elif (sla[-1], slo[-1]) == end:
                chain_lat.extend(sla[-2::-1]); chain_lon.extend(slo[-2::-1])
            else:
                continue
            del segs[wid]
            break
        else:
            raise ValueError(
                f"boundary does not chain: open end {end}, remaining {sorted(segs)}"
            )
    if (chain_lat[0], chain_lon[0]) != (chain_lat[-1], chain_lon[-1]):
        raise ValueError("assembled boundary is not closed")
    return np.asarray(chain_lat), np.asarray(chain_lon)
