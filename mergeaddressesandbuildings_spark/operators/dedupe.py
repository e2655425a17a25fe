"""J3/J4: dedupe of new elements against existing OSM state
(SURVEY.md §2.3 J3, J4).

- J3 (buildings): a new footprint overlapping an existing way is
  dropped. Cell-cover equi-join (cogroup) + bbox prefilter + exact
  ring-overlap kernel → left_anti on the hit list.
- J4 (addresses): a new address with the same normalized
  (street, housenumber) within ε meters of an existing address node is
  dropped. Exact part is a plain equi-join on the normalized key — the
  existing side is tiny relative to the corpus, so it is broadcast; the
  ε-proximity refine is a column expression (haversine on builtins —
  stays in whole-stage codegen, no Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import geom


def street_norm_col(c: F.Column) -> F.Column:
    """§8.3 street normalization as a pure column expression (F5)."""
    s = F.upper(F.trim(F.regexp_replace(c, r"\s+", " ")))
    parts = F.split(s, " ")
    n = F.size(parts)
    last = F.element_at(parts, -1)
    expanded = last
    for abbr, full in config.STREET_SUFFIX_EXPANSION.items():
        expanded = F.when(last == abbr, F.lit(full)).otherwise(expanded)
    head = F.array_join(F.slice(parts, F.lit(1), n - 1), " ")
    return F.when(n > 1, F.concat(head, F.lit(" "), expanded)).otherwise(expanded)


def hn_norm_col(c: F.Column) -> F.Column:
    return F.upper(F.trim(c))


def haversine_m_col(lat1, lon1, lat2, lon2) -> F.Column:
    """F1 as a builtin-function column expression (JVM-side, codegen)."""
    rad = 3.141592653589793 / 180.0
    dphi = (lat2 - lat1) * rad / 2.0
    dlmb = (lon2 - lon1) * rad / 2.0
    a = F.pow(F.sin(dphi), 2) + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.pow(F.sin(dlmb), 2)
    return 2.0 * config.EARTH_RADIUS_M * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def dedupe_addresses(addresses: DataFrame, existing_nodes: DataFrame,
                     eps_m: float = config.ADDR_DEDUPE_EPS_M) -> DataFrame:
    """J4: drop new addresses duplicating an existing OSM address node."""
    a = addresses.withColumn("_st", street_norm_col(F.col("street"))) \
                 .withColumn("_hn", hn_norm_col(F.col("housenumber")))
    e = existing_nodes.select(
        street_norm_col(F.col("street")).alias("_st"),
        hn_norm_col(F.col("housenumber")).alias("_hn"),
        F.col("lat").alias("_elat"),
        F.col("lon").alias("_elon"),
    )
    hits = (
        a.join(F.broadcast(e), ["_st", "_hn"], "inner")
        .filter(haversine_m_col(F.col("lat"), F.col("lon"), F.col("_elat"), F.col("_elon")) <= eps_m)
        .select("addr_id")
        .distinct()
    )
    return a.join(hits, "addr_id", "left_anti").drop("_st", "_hn")


def overlap_hits_kernel(ndf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
    """New-building ids overlapping any existing way within a cell group."""
    if ndf.empty or edf.empty:
        return pd.DataFrame({"building_id": pd.Series([], dtype=np.int64)})
    hit_ids = []
    e_min_lat = edf["min_lat"].to_numpy(); e_max_lat = edf["max_lat"].to_numpy()
    e_min_lon = edf["min_lon"].to_numpy(); e_max_lon = edf["max_lon"].to_numpy()
    for i in range(len(ndf)):
        bbox_hit = np.flatnonzero(
            (ndf["min_lat"].iat[i] <= e_max_lat) & (ndf["max_lat"].iat[i] >= e_min_lat)
            & (ndf["min_lon"].iat[i] <= e_max_lon) & (ndf["max_lon"].iat[i] >= e_min_lon)
        )
        n_lat = np.asarray(ndf["ring_lats"].iat[i], dtype=np.float64)
        n_lon = np.asarray(ndf["ring_lons"].iat[i], dtype=np.float64)
        for j in bbox_hit:
            if geom.rings_overlap(
                n_lat, n_lon,
                np.asarray(edf["ring_lats"].iat[j], dtype=np.float64),
                np.asarray(edf["ring_lons"].iat[j], dtype=np.float64),
            ):
                hit_ids.append(ndf["building_id"].iat[i])
                break
    return pd.DataFrame({"building_id": np.asarray(hit_ids, dtype=np.int64)})


def dedupe_buildings(new_buildings: DataFrame, existing_ways: DataFrame) -> DataFrame:
    """J3: drop new buildings overlapping an existing way footprint."""
    cols = ["building_id", "ring_lats", "ring_lons",
            "min_lat", "min_lon", "max_lat", "max_lon"]
    n_exp = new_buildings.select(F.explode("cells").alias("cell"), *cols)
    e_exp = existing_ways.select(F.explode("cells").alias("cell"), *cols)

    def run(_key, ndf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        return overlap_hits_kernel(ndf, edf)

    hits = (
        n_exp.groupBy("cell")
        .cogroup(e_exp.groupBy("cell"))
        .applyInPandas(run, schema="building_id long")
        .distinct()
    )
    return new_buildings.join(hits, "building_id", "left_anti")
