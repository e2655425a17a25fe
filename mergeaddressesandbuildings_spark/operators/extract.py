"""S3: page-payload extraction — pages → addresses + buildings
(SURVEY.md §2.1 S3, §2.8 F8/F9; BASELINE.json:6 "geometries and address
records extracted from Common-Crawl-style page payloads by vectorized
Arrow UDFs").

Design for scale:
- latest-capture-wins (F9) runs BEFORE extraction so each url's html is
  parsed once; implemented as max_by over (warc_ts, text) — a single
  map-side-combinable aggregation, not a window (a window would sort
  whole partitions; the agg ships only one row per url out of each map
  task).
- the ENTIRE parse + derivation is PURE COLUMN EXPRESSIONS
  (``regexp_extract_all`` → ``posexplode`` → ``from_json`` → sha2-based
  id → Morton cell encode → sequential-fold centroid/area → SQL cell
  cover) — whole-stage codegen, zero Python, zero Arrow round trips.
  ``posexplode`` reproduces the §8.6 record_idx exactly (every span
  consumes an index, parseable or not, because ``from_json`` nulls out
  corrupt spans *after* the explode). Centroid/area use the same
  sequential summation order as the §8 pure-Python oracle
  (functions/geom_sql.py — bit-identical to the numpy kernels for
  building-sized rings).
- downstream never touches ``html`` again, so column pruning keeps the
  heavy binary out of every later scan; callers persist/materialize
  the records output before branching into addresses/buildings
  (SURVEY.md §4 column-pruning note).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import (
    cells_sql,
    geom_sql,
    ids_sql,
    textx,
)

RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("housenumber", T.StringType(), True),
        T.StructField("street", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("postcode", T.StringType(), True),
        T.StructField("ring_lats", T.ArrayType(T.DoubleType()), True),
        T.StructField("ring_lons", T.ArrayType(T.DoubleType()), True),
        # §8.1 ext: optional hole rings (multipolygon buildings with
        # courtyards) — array of closed rings, each inside the outer
        T.StructField("hole_lats", T.ArrayType(T.ArrayType(T.DoubleType())), True),
        T.StructField("hole_lons", T.ArrayType(T.ArrayType(T.DoubleType())), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("min_lat", T.DoubleType(), True),
        T.StructField("min_lon", T.DoubleType(), True),
        T.StructField("max_lat", T.DoubleType(), True),
        T.StructField("max_lon", T.DoubleType(), True),
        T.StructField("centroid_lat", T.DoubleType(), True),
        T.StructField("centroid_lon", T.DoubleType(), True),
        T.StructField("area_m2", T.DoubleType(), True),
        T.StructField("cell", T.LongType(), True),
        T.StructField("cells", T.ArrayType(T.LongType()), True),
    ]
)

_COLS = [f.name for f in RECORDS_SCHEMA.fields]


def latest_capture(pages: DataFrame) -> DataFrame:
    """F9: keep the winning capture per url — max (warc_ts, text).

    max_by with a struct key is a hash aggregate with map-side partial
    combine: each map task forwards at most one candidate row per url,
    vs a window's full sort+shuffle of every capture (html included).
    """
    key = F.struct(F.col("warc_ts"), F.col("text"))
    return (
        pages.groupBy("url")
        .agg(
            F.max_by(F.struct("warc_ts", "html", "text", "lang"), key).alias("w")
        )
        .select("url", "w.warc_ts", "w.html", "w.text", "w.lang")
    )


# the JSON payload inside <span class="geo-record">…</span>
# (mirrors textx.extract_geo_records / the fixture generator)
_GEO_JSON_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("housenumber", T.StringType()),
        T.StructField("street", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("holes", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

# same span regex as textx._GEO_SPAN ((?s) = DOTALL)
_GEO_SPAN_RE = r'(?s)<span class="geo-record">(.*?)</span>'


def extract_records(pages: DataFrame, level: int = config.CELL_LEVEL,
                    dedupe_captures: bool = True) -> DataFrame:
    """pages → combined record table (kind ∈ {address, building}).

    ENTIRELY column expressions — the whole parse + derivation stage
    runs inside whole-stage codegen; html never crosses into Python.
    Centroid/area are sequential folds (functions/geom_sql.py) matching
    the §8 oracle's summation order; the cell cover is the SQL cover
    (complete, cap-validated — functions/cells_sql.py)."""
    src = latest_capture(pages) if dedupe_captures else pages

    spans = F.regexp_extract_all(
        F.col("html").cast("string"), F.lit(_GEO_SPAN_RE), 1
    )
    recs = (
        src.select("url", F.posexplode(spans).alias("record_idx", "span"))
        .select(
            "url",
            F.col("record_idx").cast("int").alias("record_idx"),
            F.from_json("span", _GEO_JSON_SCHEMA).alias("r"),
        )
    )
    r = F.col("r")
    # corrupt spans parse to an all-null struct → fail both predicates →
    # dropped, but their record_idx was already consumed (§8.6 stability
    # under partial corruption — same semantics as strict=False)
    is_addr = (r["kind"] == "address") & r["lat"].isNotNull() & r["lon"].isNotNull()
    is_bld = (r["kind"] == "building") & r["ring"].isNotNull() & (F.size(r["ring"]) >= 4)
    ring_lats = F.transform(r["ring"], lambda p: p[0])
    ring_lons = F.transform(r["ring"], lambda p: p[1])
    # degenerate (<4-vertex) hole rings are dropped; absent/empty holes
    # normalize to null so hole-free rows are byte-identical to before
    holes_ok = F.filter(r["holes"], lambda h: F.size(h) >= 4)
    has_holes = r["holes"].isNotNull() & (F.size(holes_ok) > 0)
    hole_lats = F.when(has_holes, F.transform(holes_ok, lambda h: F.transform(h, lambda p: p[0])))
    hole_lons = F.when(has_holes, F.transform(holes_ok, lambda h: F.transform(h, lambda p: p[1])))

    def addr(c: str) -> F.Column:
        return F.when(is_addr, r[c]).alias(c)

    # min/max are order-independent → array_min/max are bit-identical
    # to the numpy reduceat bbox
    min_lat = F.array_min(ring_lats)
    min_lon = F.array_min(ring_lons)
    max_lat = F.array_max(ring_lats)
    max_lon = F.array_max(ring_lons)

    return recs.filter(is_addr | is_bld).select(
        F.when(is_addr, F.lit("address")).otherwise(F.lit("building")).alias("kind"),
        ids_sql.stable_id64_expr(
            F.when(is_addr, F.lit("a")).otherwise(F.lit("b")),
            F.col("url"), F.col("record_idx"),
        ).alias("id"),
        "url", "record_idx",
        addr("lat"), addr("lon"),
        addr("housenumber"), addr("street"), addr("unit"),
        addr("city"), addr("state"), addr("postcode"),
        F.when(is_bld, ring_lats).alias("ring_lats"),
        F.when(is_bld, ring_lons).alias("ring_lons"),
        F.when(is_bld, hole_lats).alias("hole_lats"),
        F.when(is_bld, hole_lons).alias("hole_lons"),
        F.when(is_bld, F.coalesce(r["tags"], F.expr("CAST(map() AS MAP<STRING,STRING>)"))).alias("tags"),
        F.when(is_bld, min_lat).alias("min_lat"),
        F.when(is_bld, min_lon).alias("min_lon"),
        F.when(is_bld, max_lat).alias("max_lat"),
        F.when(is_bld, max_lon).alias("max_lon"),
        F.when(is_bld, geom_sql.centroid_expr(ring_lats)).alias("centroid_lat"),
        F.when(is_bld, geom_sql.centroid_expr(ring_lons)).alias("centroid_lon"),
        F.when(is_bld, geom_sql.poly_area_m2_expr(ring_lats, ring_lons, hole_lats, hole_lons)).alias("area_m2"),
        # T1 cell encode, JVM variant (bit-identical to cells.encode —
        # tests/test_cells_sql.py)
        F.when(is_addr, cells_sql.cell_expr(r["lat"], r["lon"], level)).alias("cell"),
        F.when(
            is_bld,
            cells_sql.bbox_cover_cells_expr(min_lat, min_lon, max_lat, max_lon, level),
        ).alias("cells"),
    )


def text_parity_violations(pages: DataFrame) -> DataFrame:
    """Byte-parity audit (BASELINE.json:15): urls whose stored ``text``
    differs from the §8.2 re-extraction of ``html``. Empty ⇔ invariant
    holds. Vectorized via mapInPandas; returns (url, stored, recomputed).
    """
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("stored_text", T.StringType(), True),
            T.StructField("recomputed_text", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recomputed = [textx.extract_text(bytes(h)) for h in b["html"].to_numpy()]
            mask = [r != t for r, t in zip(recomputed, b["text"].to_numpy())]
            yield pd.DataFrame(
                {
                    "url": b["url"].to_numpy()[mask],
                    "stored_text": b["text"].to_numpy()[mask],
                    "recomputed_text": np.asarray(recomputed, dtype=object)[mask],
                }
            )

    return pages.select("url", "html", "text").mapInPandas(run, schema=schema)


def split_records(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """records → (addresses, buildings) with FIXTURES.md §2 columns."""
    addresses = records.filter(F.col("kind") == "address").select(
        F.col("id").alias("addr_id"),
        "url", "record_idx", "lat", "lon",
        "housenumber", "street", "unit", "city", "state", "postcode", "cell",
    )
    buildings = records.filter(F.col("kind") == "building").select(
        F.col("id").alias("building_id"),
        "url", "record_idx", "ring_lats", "ring_lons",
        "hole_lats", "hole_lons", "tags",
        "min_lat", "min_lon", "max_lat", "max_lon",
        "centroid_lat", "centroid_lon", "area_m2", "cells",
        F.lit(False).alias("existing"),
    )
    return addresses, buildings


def existing_to_tables(existing: DataFrame, level: int = config.CELL_LEVEL) -> tuple[DataFrame, DataFrame]:
    """existing_osm → (existing address nodes, existing building ways)
    shaped like the extracted tables so the join universe is uniform."""
    nodes = existing.filter(
        (F.col("kind") == "node") & F.col("tags")["addr:housenumber"].isNotNull()
    ).select(
        F.col("elem_id").alias("addr_id"),
        F.col("lat"), F.col("lon"),
        F.col("tags")["addr:housenumber"].alias("housenumber"),
        F.col("tags")["addr:street"].alias("street"),
    )

    ways = existing.filter((F.col("kind") == "way") & F.col("ring").isNotNull())
    ring_lats = F.expr("transform(ring, p -> p.lat)")
    ring_lons = F.expr("transform(ring, p -> p.lon)")
    # `holes` (array<array<struct<lat,lon>>>) is an optional input
    # column — absent in plain-way sources, populated by the
    # multipolygon resolver (operators/ways.py)
    if "holes" in existing.columns:
        hole_lats = F.expr("transform(holes, h -> transform(h, p -> p.lat))")
        hole_lons = F.expr("transform(holes, h -> transform(h, p -> p.lon))")
    else:
        hole_lats = F.lit(None).cast("array<array<double>>")
        hole_lons = F.lit(None).cast("array<array<double>>")
    min_lat = F.array_min(ring_lats)
    min_lon = F.array_min(ring_lons)
    max_lat = F.array_max(ring_lats)
    max_lon = F.array_max(ring_lons)
    enriched = ways.select(
        F.col("elem_id").alias("building_id"),
        F.lit("osm://existing").alias("url"),
        F.lit(-1).cast("int").alias("record_idx"),
        ring_lats.alias("ring_lats"),
        ring_lons.alias("ring_lons"),
        hole_lats.alias("hole_lats"),
        hole_lons.alias("hole_lons"),
        "tags",
        min_lat.alias("min_lat"),
        min_lon.alias("min_lon"),
        max_lat.alias("max_lat"),
        max_lon.alias("max_lon"),
        geom_sql.centroid_expr(ring_lats).alias("centroid_lat"),
        geom_sql.centroid_expr(ring_lons).alias("centroid_lon"),
        geom_sql.poly_area_m2_expr(
            ring_lats, ring_lons, hole_lats, hole_lons
        ).alias("area_m2"),
        cells_sql.bbox_cover_cells_expr(
            min_lat, min_lon, max_lat, max_lon, level
        ).alias("cells"),
        F.lit(True).alias("existing"),
    )
    return nodes, enriched
