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
- one ``mapInPandas`` pass emits a combined record table (addresses and
  buildings share it via a ``kind`` column) with ids, cells, bboxes,
  centroids, areas, and cell covers all computed in-batch with numpy —
  downstream never touches ``html`` again, so column pruning keeps the
  heavy binary out of every later scan.
- callers persist/materialize the records output before branching into
  addresses/buildings (SURVEY.md §4 column-pruning note).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells, geom, ids, textx

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


def _extract_batch(pdf: pd.DataFrame, level: int) -> pd.DataFrame:
    rows: list[dict] = []
    bld_rings: list[tuple[np.ndarray, np.ndarray]] = []  # row-order ring arrays
    for url, html in zip(pdf["url"].to_numpy(), pdf["html"].to_numpy()):
        for rec in textx.extract_geo_records(bytes(html), strict=False):
            idx = rec["record_idx"]
            if rec.get("kind") == "address" and "lat" in rec and "lon" in rec:
                rows.append(
                    {
                        "kind": "address",
                        "id": ids.stable_id64("a", url, idx),
                        "url": url,
                        "record_idx": idx,
                        "lat": float(rec["lat"]),
                        "lon": float(rec["lon"]),
                        "housenumber": rec.get("housenumber"),
                        "street": rec.get("street"),
                        "unit": rec.get("unit"),
                        "city": rec.get("city"),
                        "state": rec.get("state"),
                        "postcode": rec.get("postcode"),
                    }
                )
            elif rec.get("kind") == "building" and rec.get("ring"):
                ring = np.asarray(rec["ring"], dtype=np.float64)
                if len(ring) < 4:
                    continue
                rlat, rlon = ring[:, 0], ring[:, 1]
                # bbox is computed BATCHED after the loop (min/max are
                # order-independent → bit-identical to geom.ring_bbox);
                # centroid/area stay per-ring: np.mean/np.sum use
                # pairwise summation whose grouping the batched
                # reduceat would not reproduce bit-for-bit
                clat, clon = geom.ring_centroid(rlat, rlon)
                bld_rings.append((rlat, rlon))
                rows.append(
                    {
                        "kind": "building",
                        "id": ids.stable_id64("b", url, idx),
                        "url": url,
                        "record_idx": idx,
                        "ring_lats": rlat.tolist(),
                        "ring_lons": rlon.tolist(),
                        "tags": rec.get("tags") or {},
                        "centroid_lat": clat,
                        "centroid_lon": clon,
                        "area_m2": geom.ring_area_m2(rlat, rlon),
                    }
                )
    out = pd.DataFrame(rows, columns=_COLS)
    if out.empty:
        return out
    if bld_rings:
        flat_lat, flat_lon, offsets = geom.flatten_rings(
            [r[0] for r in bld_rings], [r[1] for r in bld_rings]
        )
        starts = offsets[:-1]
        bmask = (out["kind"] == "building").to_numpy()
        out.loc[bmask, "min_lat"] = np.minimum.reduceat(flat_lat, starts)
        out.loc[bmask, "min_lon"] = np.minimum.reduceat(flat_lon, starts)
        out.loc[bmask, "max_lat"] = np.maximum.reduceat(flat_lat, starts)
        out.loc[bmask, "max_lon"] = np.maximum.reduceat(flat_lon, starts)
    # missing keys surface as NaN; Arrow needs None for array/map columns
    for col in ("ring_lats", "ring_lons", "tags", "cells"):
        out[col] = out[col].astype(object).where(out[col].notna(), None)
    # vectorized cell encode over the whole Arrow batch (T1, batched)
    is_addr = (out["kind"] == "address").to_numpy()
    lat = out["lat"].to_numpy(dtype=np.float64, na_value=np.nan)
    lon = out["lon"].to_numpy(dtype=np.float64, na_value=np.nan)
    cell_col = np.full(len(out), np.nan, dtype=np.float64)
    if is_addr.any():
        cell_col[is_addr] = cells.encode(lat[is_addr], lon[is_addr], level)
    out["cell"] = pd.array(
        [int(c) if not np.isnan(c) else None for c in cell_col], dtype="Int64"
    )
    if (~is_addr).any():
        covers = cells.cover_bbox(
            out.loc[~is_addr, "min_lat"].to_numpy(),
            out.loc[~is_addr, "min_lon"].to_numpy(),
            out.loc[~is_addr, "max_lat"].to_numpy(),
            out.loc[~is_addr, "max_lon"].to_numpy(),
            level,
        )
        cover_series = pd.Series([None] * len(out), dtype=object)
        cover_series.iloc[np.flatnonzero(~is_addr)] = [c.tolist() for c in covers]
        out["cells"] = cover_series
    return out


def extract_records(pages: DataFrame, level: int = config.CELL_LEVEL,
                    dedupe_captures: bool = True) -> DataFrame:
    """pages → combined record table (kind ∈ {address, building})."""
    src = latest_capture(pages) if dedupe_captures else pages

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _extract_batch(b, level)

    return src.select("url", "html").mapInPandas(run, schema=RECORDS_SCHEMA)


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
