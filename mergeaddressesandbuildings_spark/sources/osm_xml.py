"""S2: OSM XML reader (SURVEY.md §2.1 S2) — the reference's native
input format, so a user of the reference can bring their existing
`.osm` files to this engine unchanged.

Spark shape: `.osm` files are read whole via the binaryFile source
(one task per file — counties are file-sized units in the reference's
workflow; for planet-scale PBF you would pre-split, which is out of
scope per SURVEY §2.1) and parsed with xml.etree inside `mapInPandas`,
emitting three flat tables:

    nodes(id, lat, lon, tags)
    ways(id, node_refs, tags)
    relations(id, member_refs, member_roles, tags)

Ring materialization (J7) lives in operators/ways.py.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NODES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("lon", T.DoubleType(), False),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
])

WAYS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("node_refs", T.ArrayType(T.LongType()), False),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
])

RELATIONS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("member_refs", T.ArrayType(T.LongType()), False),
    T.StructField("member_roles", T.ArrayType(T.StringType()), False),
    # node|way|relation per member — OSM node/way id spaces OVERLAP, so
    # an untyped ref cannot safely be matched against way ids
    T.StructField("member_types", T.ArrayType(T.StringType()), False),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
])


def _tags(elem) -> dict:
    return {t.get("k"): t.get("v") for t in elem.findall("tag")}


def _parse(content: bytes):
    root = ET.fromstring(content)
    nodes, ways, rels = [], [], []
    for n in root.findall("node"):
        nodes.append({
            "id": int(n.get("id")),
            "lat": float(n.get("lat")),
            "lon": float(n.get("lon")),
            "tags": _tags(n),
        })
    for w in root.findall("way"):
        ways.append({
            "id": int(w.get("id")),
            "node_refs": [int(nd.get("ref")) for nd in w.findall("nd")],
            "tags": _tags(w),
        })
    for r in root.findall("relation"):
        members = r.findall("member")
        rels.append({
            "id": int(r.get("id")),
            "member_refs": [int(m.get("ref")) for m in members],
            "member_roles": [m.get("role") or "" for m in members],
            "member_types": [m.get("type") or "" for m in members],
            "tags": _tags(r),
        })
    return nodes, ways, rels


def _reader(which: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                parts = _parse(bytes(content))
                if parts[which]:
                    yield pd.DataFrame(parts[which])
    return run


def _read(spark: SparkSession, path: str, which: int, schema) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_reader(which), schema=schema)


def read_nodes(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, 0, NODES_SCHEMA)


def read_ways(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, 1, WAYS_SCHEMA)


def read_relations(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, 2, RELATIONS_SCHEMA)


def to_existing_table(nodes: DataFrame, ways: DataFrame,
                      relations: DataFrame | None = None) -> DataFrame:
    """(nodes, ways[, relations]) → the engine's existing-OSM table
    (schemas.EXISTING_OSM): every node becomes a ``kind='node'`` row,
    every resolvable way a ``kind='way'`` row with its materialized
    ring — so `.osm` state plugs straight into run_merge(existing_osm=…).

    With ``relations``, multipolygon relations (closed outer + inner
    ways) become ``kind='way'`` rows carrying their hole rings
    (§8.1 ext), and their member ways are excluded from the plain-way
    rows (the outer would duplicate the polygon). The exclusion is
    scoped to WAY-typed outer/inner members of ``type=multipolygon``
    relations only: a building way that is also a member of a
    route/associatedStreet/boundary relation must still appear as
    existing state (it would otherwise silently vanish and J3 dedupe
    would re-emit a duplicate building), and an untyped node member id
    must never be matched against the overlapping way id space."""
    from pyspark.sql import functions as F

    from mergeaddressesandbuildings_spark.operators.ways import (
        resolve_multipolygons,
        resolve_rings,
    )

    ring_t = "array<struct<lat:double,lon:double>>"
    zip_ring = lambda la, lo: F.zip_with(  # noqa: E731
        la, lo, lambda a, b: F.struct(a.alias("lat"), b.alias("lon"))
    )

    n = nodes.select(
        F.col("id").alias("elem_id"),
        F.lit("node").alias("kind"),
        "lat", "lon",
        F.lit(None).cast(ring_t).alias("ring"),
        F.lit(None).cast(f"array<{ring_t}>").alias("holes"),
        "tags",
    )
    plain_ways = ways
    parts = [n]
    if relations is not None:
        if "member_types" not in relations.columns:
            # legacy relations frames (pre-member_types parquet, same
            # compatibility contract as ways.resolve_multipolygons and
            # the PBF writer): default every member to way-typed so the
            # multipolygon exclusion below still resolves
            relations = relations.withColumn(
                "member_types",
                F.transform(F.col("member_refs"), lambda _: F.lit("way")),
            )
        mp_rels = relations.filter(
            F.col("tags")["type"] == "multipolygon"
        )
        members = mp_rels.select(
            F.explode(
                F.arrays_zip("member_refs", "member_roles", "member_types")
            ).alias("m")
        ).filter(
            (F.col("m.member_types") == "way")
            & F.col("m.member_roles").isin("outer", "inner")
        ).select(F.col("m.member_refs").alias("id")).distinct()
        plain_ways = ways.join(members, "id", "left_anti")
        mp = resolve_multipolygons(nodes, ways, relations).select(
            F.col("id").alias("elem_id"),
            F.lit("way").alias("kind"),
            F.lit(None).cast("double").alias("lat"),
            F.lit(None).cast("double").alias("lon"),
            zip_ring("ring_lats", "ring_lons").alias("ring"),
            F.when(
                F.col("hole_lats").isNotNull(),
                F.zip_with(
                    "hole_lats", "hole_lons",
                    lambda hla, hlo: zip_ring(hla, hlo),
                ),
            ).alias("holes"),
            "tags",
        )
        parts.append(mp)
    w = resolve_rings(nodes, plain_ways).select(
        F.col("id").alias("elem_id"),
        F.lit("way").alias("kind"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("lon"),
        zip_ring("ring_lats", "ring_lons").alias("ring"),
        F.lit(None).cast(f"array<{ring_t}>").alias("holes"),
        "tags",
    )
    parts.append(w)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
