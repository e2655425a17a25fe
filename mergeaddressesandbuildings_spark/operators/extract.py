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
- span extraction + JSON parse + ids + cells + bboxes are PURE COLUMN
  EXPRESSIONS (``regexp_extract_all`` → ``posexplode`` → ``from_json``
  → sha2-based id → Morton cell encode) — whole-stage codegen, zero
  Python. ``posexplode`` reproduces the §8.6 record_idx exactly (every
  span consumes an index, parseable or not, because ``from_json``
  nulls out corrupt spans *after* the explode).
- only the building centroid/area (whose np.mean/np.sum pairwise
  summation order is part of the §8 bit-parity contract) and the numpy
  cell cover run in one light Arrow pass over the already-parsed
  records — ``html`` never crosses into Python.
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
    cells,
    cells_sql,
    geom,
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
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

# same span regex as textx._GEO_SPAN ((?s) = DOTALL)
_GEO_SPAN_RE = r'(?s)<span class="geo-record">(.*?)</span>'


def _enrich_batch(pdf: pd.DataFrame, level: int) -> pd.DataFrame:
    """Building-only Arrow enrich: per-ring centroid/area (np.mean /
    np.sum pairwise-summation bits are part of the §8 parity contract,
    so these stay per-ring numpy — see geom.ring_centroid) plus the
    batched numpy cell cover. Address rows pass through untouched."""
    bmask = (pdf["kind"] == "building").to_numpy()
    if bmask.any():
        bidx = np.flatnonzero(bmask)
        lats = pdf["ring_lats"].to_numpy()
        lons = pdf["ring_lons"].to_numpy()
        clat = np.full(len(pdf), np.nan)
        clon = np.full(len(pdf), np.nan)
        area = np.full(len(pdf), np.nan)
        for i in bidx:
            la = np.asarray(lats[i], dtype=np.float64)
            lo = np.asarray(lons[i], dtype=np.float64)
            clat[i], clon[i] = geom.ring_centroid(la, lo)
            area[i] = geom.ring_area_m2(la, lo)
        pdf = pdf.assign(centroid_lat=clat, centroid_lon=clon, area_m2=area)
        covers = cells.cover_bbox(
            pdf["min_lat"].to_numpy(dtype=np.float64)[bidx],
            pdf["min_lon"].to_numpy(dtype=np.float64)[bidx],
            pdf["max_lat"].to_numpy(dtype=np.float64)[bidx],
            pdf["max_lon"].to_numpy(dtype=np.float64)[bidx],
            level,
        )
        cover_series = pd.Series([None] * len(pdf), dtype=object)
        cover_series.iloc[bidx] = [c.tolist() for c in covers]
        pdf["cells"] = cover_series.values
    if "cell" in pdf and pdf["cell"].dtype != "Int64":
        pdf["cell"] = pdf["cell"].astype("Int64")
    return pdf[_COLS]


def extract_records(pages: DataFrame, level: int = config.CELL_LEVEL,
                    dedupe_captures: bool = True) -> DataFrame:
    """pages → combined record table (kind ∈ {address, building}).

    The parse is all JVM expressions; one light Arrow pass derives the
    building centroid/area/cover (see module docstring)."""
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

    def addr(c: str) -> F.Column:
        return F.when(is_addr, r[c]).alias(c)

    flat = recs.filter(is_addr | is_bld).select(
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
        F.when(is_bld, F.coalesce(r["tags"], F.expr("CAST(map() AS MAP<STRING,STRING>)"))).alias("tags"),
        # min/max are order-independent → array_min/max are bit-identical
        # to the old reduceat bbox
        F.when(is_bld, F.array_min(ring_lats)).alias("min_lat"),
        F.when(is_bld, F.array_min(ring_lons)).alias("min_lon"),
        F.when(is_bld, F.array_max(ring_lats)).alias("max_lat"),
        F.when(is_bld, F.array_max(ring_lons)).alias("max_lon"),
        F.lit(None).cast("double").alias("centroid_lat"),
        F.lit(None).cast("double").alias("centroid_lon"),
        F.lit(None).cast("double").alias("area_m2"),
        # T1 cell encode, JVM variant (bit-identical to cells.encode —
        # tests/test_cells_sql.py)
        F.when(is_addr, cells_sql.cell_expr(r["lat"], r["lon"], level)).alias("cell"),
        F.lit(None).cast("array<long>").alias("cells"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            yield _enrich_batch(b, level)

    return flat.mapInPandas(run, schema=RECORDS_SCHEMA)


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
        "url", "record_idx", "ring_lats", "ring_lons", "tags",
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
    ways = ways.select(
        F.col("elem_id").alias("building_id"),
        F.lit("osm://existing").alias("url"),
        F.lit(-1).cast("int").alias("record_idx"),
        F.expr("transform(ring, p -> p.lat)").alias("ring_lats"),
        F.expr("transform(ring, p -> p.lon)").alias("ring_lons"),
        "tags",
    )

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                yield _ways_enriched_empty()
                continue
            # bbox batched via reduceat (bit-identical — min/max are
            # order-independent); centroid/area stay per-ring to keep
            # np.mean/np.sum pairwise-summation bits (see _extract_batch)
            flat_lat, flat_lon, offsets = geom.flatten_rings(
                list(b["ring_lats"]), list(b["ring_lons"])
            )
            starts = offsets[:-1]
            mins_lat = np.minimum.reduceat(flat_lat, starts)
            mins_lon = np.minimum.reduceat(flat_lon, starts)
            maxs_lat = np.maximum.reduceat(flat_lat, starts)
            maxs_lon = np.maximum.reduceat(flat_lon, starts)
            clats, clons, areas = [], [], []
            for la, lo in zip(b["ring_lats"], b["ring_lons"]):
                la = np.asarray(la, dtype=np.float64)
                lo = np.asarray(lo, dtype=np.float64)
                c = geom.ring_centroid(la, lo)
                clats.append(c[0]); clons.append(c[1])
                areas.append(geom.ring_area_m2(la, lo))
            b = b.assign(
                min_lat=mins_lat, min_lon=mins_lon, max_lat=maxs_lat, max_lon=maxs_lon,
                centroid_lat=clats, centroid_lon=clons, area_m2=areas,
            )
            covers = cells.cover_bbox(
                mins_lat, mins_lon, maxs_lat, maxs_lon, level,
            )
            b["cells"] = [c.tolist() for c in covers]
            b["existing"] = True
            yield b[_WAYS_COLS]

    enriched = ways.mapInPandas(enrich, schema=_WAYS_SCHEMA)
    return nodes, enriched


_WAYS_SCHEMA = T.StructType(
    [
        T.StructField("building_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("ring_lats", T.ArrayType(T.DoubleType()), False),
        T.StructField("ring_lons", T.ArrayType(T.DoubleType()), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("min_lat", T.DoubleType(), False),
        T.StructField("min_lon", T.DoubleType(), False),
        T.StructField("max_lat", T.DoubleType(), False),
        T.StructField("max_lon", T.DoubleType(), False),
        T.StructField("centroid_lat", T.DoubleType(), False),
        T.StructField("centroid_lon", T.DoubleType(), False),
        T.StructField("area_m2", T.DoubleType(), False),
        T.StructField("cells", T.ArrayType(T.LongType()), False),
        T.StructField("existing", T.BooleanType(), False),
    ]
)
_WAYS_COLS = [f.name for f in _WAYS_SCHEMA.fields]


def _ways_enriched_empty() -> pd.DataFrame:
    return pd.DataFrame(columns=_WAYS_COLS)
