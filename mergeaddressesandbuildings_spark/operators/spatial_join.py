"""J1/J2: the distributed spatial join (SURVEY.md §2.3; BASELINE.json:6).

Architecture — the standard partition-based spatial merge join
(PAPERS.md, EDBT 2020): both sides are keyed by level-L Morton cell so
Catalyst sees a plain equi-join/cogroup; the exact geometry test runs as
a numpy kernel inside ``applyInPandas`` groups ("STRtree-per-partition
PIP/kNN test inside pandas UDFs", BASELINE.json:6 — here the in-group
index is a vectorized bbox prefilter, the right structure for rectangle
candidates at county building sizes).

Scale design:
- **cogroup, not join-then-refine**: addresses are NOT replicated per
  candidate building; each (cell) group gets the address block and the
  building block once.
- **skew**: hot urban cells exceed executor-friendly group sizes → the
  address side is salted (`pmod(xxhash64(addr_id), s)`), the building
  side replicated per salt (correctness: every address still sees every
  building of its cell), group key = (cell, salt). AQE cannot split a
  single applyInPandas group, hence explicit salting (SURVEY.md §4).
- **broadcast path** (J6): when the building side is small, skip the
  shuffle entirely — ship a pandas copy in the UDF closure and run the
  same kernel in mapInPandas over unshuffled addresses.
- kNN candidate expansion (J2) = explode of the 3×3 Morton neighborhood,
  valid while cutoff ≤ one cell width (§8.5; asserted at plan build).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells, cells_sql, geom

CAND_SCHEMA = T.StructType(
    [
        T.StructField("addr_id", T.LongType(), False),
        T.StructField("building_id", T.LongType(), False),
        T.StructField("dist_m", T.DoubleType(), False),
        T.StructField("area_m2", T.DoubleType(), False),
    ]
)

_ADDR_KERNEL_COLS = ["addr_id", "lat", "lon"]
_BLD_KERNEL_COLS = [
    "building_id", "ring_lats", "ring_lons",
    "min_lat", "min_lon", "max_lat", "max_lon", "area_m2",
]


def _pip_kernel(adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
    """All (address, containing building) pairs within one cell group."""
    if adf.empty or bdf.empty:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    plat = adf["lat"].to_numpy(dtype=np.float64)
    plon = adf["lon"].to_numpy(dtype=np.float64)
    # vectorized bbox prefilter: (n_points, n_buildings) candidate mask
    in_box = (
        (plat[:, None] >= bdf["min_lat"].to_numpy()[None, :])
        & (plat[:, None] <= bdf["max_lat"].to_numpy()[None, :])
        & (plon[:, None] >= bdf["min_lon"].to_numpy()[None, :])
        & (plon[:, None] <= bdf["max_lon"].to_numpy()[None, :])
    )
    pair_pt, pair_bld = np.nonzero(in_box)
    if len(pair_pt) == 0:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    flat_lat, flat_lon, offsets = geom.flatten_rings(
        bdf["ring_lats"].to_numpy(), bdf["ring_lons"].to_numpy()
    )
    hit = geom.pairs_points_in_rings(
        plat, plon, pair_pt, pair_bld, flat_lat, flat_lon, offsets
    )
    pi, bi = pair_pt[hit], pair_bld[hit]
    return pd.DataFrame(
        {
            "addr_id": adf["addr_id"].to_numpy()[pi],
            "building_id": bdf["building_id"].to_numpy()[bi],
            "dist_m": np.zeros(len(pi), dtype=np.float64),
            "area_m2": bdf["area_m2"].to_numpy()[bi],
        }
    )


def _knn_kernel(adf: pd.DataFrame, bdf: pd.DataFrame, cutoff_m: float) -> pd.DataFrame:
    """(address, building, dist) pairs with dist ≤ cutoff in one group."""
    if adf.empty or bdf.empty:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    plat = adf["lat"].to_numpy(dtype=np.float64)
    plon = adf["lon"].to_numpy(dtype=np.float64)
    # bbox-expanded prefilter: only buildings whose bbox inflated by the
    # cutoff contains the point can be within cutoff
    pad_lat = cutoff_m / config.DEG_TO_M
    pad_lon = cutoff_m / (config.DEG_TO_M * np.cos(np.radians(plat[:, None])))
    near = (
        (plat[:, None] >= bdf["min_lat"].to_numpy()[None, :] - pad_lat)
        & (plat[:, None] <= bdf["max_lat"].to_numpy()[None, :] + pad_lat)
        & (plon[:, None] >= bdf["min_lon"].to_numpy()[None, :] - pad_lon)
        & (plon[:, None] <= bdf["max_lon"].to_numpy()[None, :] + pad_lon)
    )
    pair_pt, pair_bld = np.nonzero(near)
    if len(pair_pt) == 0:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    flat_lat, flat_lon, offsets = geom.flatten_rings(
        bdf["ring_lats"].to_numpy(), bdf["ring_lons"].to_numpy()
    )
    d = geom.pairs_point_to_ring_dist_m(
        plat, plon, pair_pt, pair_bld, flat_lat, flat_lon, offsets
    )
    ok = d <= cutoff_m
    pi, bi = pair_pt[ok], pair_bld[ok]
    return pd.DataFrame(
        {
            "addr_id": adf["addr_id"].to_numpy()[pi],
            "building_id": bdf["building_id"].to_numpy()[bi],
            "dist_m": d[ok],
            "area_m2": bdf["area_m2"].to_numpy()[bi],
        }
    )


def _salt_factors(addresses: DataFrame, threshold: int) -> dict[int, int]:
    """cell → salt fan-out for cells whose address count exceeds the
    threshold. Collected to the driver: only over-threshold cells travel
    (bounded: ≤ total_rows/threshold entries)."""
    hot = (
        addresses.groupBy("cell").count()
        .filter(F.col("count") > threshold)
        .collect()
    )
    return {r["cell"]: int(np.ceil(r["count"] / threshold)) for r in hot}


def _with_salt(addresses: DataFrame, buildings_exploded: DataFrame,
               factors: dict[int, int]):
    """Salt the address side; replicate the building side per salt."""
    spark = addresses.sparkSession
    if not factors:
        a = addresses.withColumn("salt", F.lit(0))
        b = buildings_exploded.withColumn("salt", F.lit(0))
        return a, b
    fmap = F.create_map(*[F.lit(v) for kv in factors.items() for v in kv])
    a = addresses.withColumn("_s", F.coalesce(fmap[F.col("cell")], F.lit(1)))
    a = a.withColumn("salt", F.pmod(F.xxhash64("addr_id"), F.col("_s")).cast("int")).drop("_s")
    b = buildings_exploded.withColumn("_s", F.coalesce(fmap[F.col("cell")], F.lit(1)))
    b = b.withColumn("salt", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)).cast("int")).drop("_s")
    return a, b


def _cogroup_refine(addresses: DataFrame, buildings: DataFrame, kernel,
                    salt_threshold: int) -> DataFrame:
    """Shuffle path: cogroup on (cell, salt), run the kernel per group."""
    b_exp = buildings.select(
        F.explode("cells").alias("cell"), *_BLD_KERNEL_COLS
    )
    a, b = _with_salt(addresses.select("cell", *_ADDR_KERNEL_COLS), b_exp,
                      _salt_factors(addresses, salt_threshold))

    def run(_key, adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        return kernel(adf, bdf)

    return (
        a.groupBy("cell", "salt")
        .cogroup(b.groupBy("cell", "salt"))
        .applyInPandas(run, schema=CAND_SCHEMA)
    )


def _broadcast_refine(addresses: DataFrame, buildings_pdf: pd.DataFrame,
                      kernel, by_cell: bool) -> DataFrame:
    """Broadcast path (J6): building side rides the UDF closure; the
    address side is never shuffled. ``by_cell`` restricts each batch to
    buildings covering the batch's cells (PIP) or their neighbors (kNN
    handles this by passing pre-expanded cell sets)."""
    cell_index: dict[int, list[int]] = {}
    for row_i, cs in enumerate(buildings_pdf["cells"]):
        for c in cs:
            cell_index.setdefault(int(c), []).append(row_i)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for adf in batches:
            if adf.empty:
                continue
            if not by_cell:
                out = kernel(adf, buildings_pdf)
                if not out.empty:
                    yield out
                continue
            # per-cell sub-batches: the candidate matrix is then
            # |cell points| × |cell buildings|, never batch × corpus
            for c, grp in adf.groupby("cell", sort=False):
                rows = cell_index.get(int(c))
                if not rows:
                    continue
                out = kernel(grp, buildings_pdf.iloc[rows])
                if not out.empty:
                    yield out

    return addresses.select("cell", *_ADDR_KERNEL_COLS).mapInPandas(run, schema=CAND_SCHEMA)


def pip_candidates(addresses: DataFrame, buildings: DataFrame,
                   broadcast_pdf: pd.DataFrame | None = None,
                   salt_threshold: int = config.SALT_THRESHOLD) -> DataFrame:
    """J1: (addr, containing-building) candidate pairs."""
    if broadcast_pdf is not None:
        return _broadcast_refine(addresses, broadcast_pdf, _pip_kernel, by_cell=True)
    return _cogroup_refine(addresses, buildings, _pip_kernel, salt_threshold)


def knn_candidates(addresses: DataFrame, buildings: DataFrame,
                   cutoff_m: float = config.KNN_CUTOFF_M,
                   level: int = config.CELL_LEVEL,
                   broadcast_pdf: pd.DataFrame | None = None,
                   salt_threshold: int = config.SALT_THRESHOLD) -> DataFrame:
    """J2 candidates: addresses replicated to their 3×3 cell
    neighborhood (T3) and matched against building cover cells."""
    assert cells.min_cell_width_m(level, 80.0) >= cutoff_m, (
        "kNN cutoff exceeds one cell width — neighbor expansion incomplete (§8.5)"
    )

    # candidate expansion (T3): 3×3 Morton neighborhood. An all-expression
    # explode(neighbors_expr) inlines the 60-op bit-spread chain into all
    # 9 generator elements and overflows janino's method-size limit, so
    # the expansion stays a (tiny) Arrow kernel over the unmatched set.
    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            nb = cells.neighbors(b["cell"].to_numpy(dtype=np.int64))  # (n, 9)
            rep = b.loc[b.index.repeat(9)].reset_index(drop=True)
            rep["cell"] = nb.reshape(-1)
            yield rep

    a_schema = "cell long, addr_id long, lat double, lon double"
    a_exp = (
        addresses.select("cell", *_ADDR_KERNEL_COLS)
        .mapInPandas(expand, schema=a_schema)
    )
    if broadcast_pdf is not None:
        kern = lambda adf, bdf: _knn_kernel(adf, bdf, cutoff_m)
        raw = _broadcast_refine(a_exp, broadcast_pdf, kern, by_cell=True)
    else:
        b_exp = buildings.select(F.explode("cells").alias("cell"), *_BLD_KERNEL_COLS)
        # factors computed on the un-expanded addresses (1 row per addr,
        # not 9) — avoids re-running the expansion job just for counts
        a, b = _with_salt(a_exp, b_exp, _salt_factors(addresses, salt_threshold))

        def run(_key, adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
            return _knn_kernel(adf, bdf, cutoff_m)

        raw = (
            a.groupBy("cell", "salt")
            .cogroup(b.groupBy("cell", "salt"))
            .applyInPandas(run, schema=CAND_SCHEMA)
        )
    # an (addr, building) pair can surface via several neighbor cells
    # with identical dist — harmless for the top-1 window (row_number
    # picks exactly one of the identical rows), so no dedup shuffle here;
    # callers needing distinct pairs dedupe themselves
    return raw


def pick_pip_winner(cands: DataFrame) -> DataFrame:
    """§8.4(1): smallest area, tie → lowest building_id."""
    w = Window.partitionBy("addr_id").orderBy(F.asc("area_m2"), F.asc("building_id"))
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("addr_id", "building_id", F.lit(config.METHOD_PIP).alias("method"),
                F.col("dist_m"))
    )


def pick_knn_winner(cands: DataFrame) -> DataFrame:
    """§8.4(2): nearest, tie → lowest building_id."""
    w = Window.partitionBy("addr_id").orderBy(F.asc("dist_m"), F.asc("building_id"))
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("addr_id", "building_id", F.lit(config.METHOD_KNN).alias("method"),
                F.col("dist_m"))
    )
