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
    "building_id", "ring_lats", "ring_lons", "hole_lats", "hole_lons",
    "min_lat", "min_lon", "max_lat", "max_lon", "area_m2",
]
# cogroup variant: holes packed flat (array<array<double>> segfaults in
# the cogroup Arrow serializer — see geom.flatten_polys_packed)
_BLD_COGROUP_COLS = [
    "building_id", "ring_lats", "ring_lons",
    "hflat_lat", "hflat_lon", "hole_lens",
    "min_lat", "min_lon", "max_lat", "max_lon", "area_m2",
]
_EMPTY_HOLES = "CAST(array() AS ARRAY<ARRAY<DOUBLE>>)"


def _pack_holes(buildings: DataFrame) -> DataFrame:
    """hole_lats/hole_lons → (hflat_lat, hflat_lon, hole_lens)."""
    hla = F.coalesce(F.col("hole_lats"), F.expr(_EMPTY_HOLES))
    hlo = F.coalesce(F.col("hole_lons"), F.expr(_EMPTY_HOLES))
    return buildings.withColumn("hflat_lat", F.flatten(hla)) \
                    .withColumn("hflat_lon", F.flatten(hlo)) \
                    .withColumn("hole_lens", F.transform(hla, lambda h: F.size(h)))


_MASK_BLD_CHUNK = 4096  # bounds the dense bbox-prefilter mask: even a
# salted 20k-point group peaks at 20k×4096 bools ≈ 80 MB per chunk,
# independent of how many buildings a hot urban cell holds


def _bbox_pairs(plat, plon, min_lat, max_lat, min_lon, max_lon,
                pad_lat=None, pad_lon=None):
    """(point, building) candidate pairs whose (optionally padded) bbox
    contains the point — computed in building-axis chunks so the dense
    mask is bounded regardless of group size."""
    pts, blds = [], []
    for s in range(0, len(min_lat), _MASK_BLD_CHUNK):
        e = s + _MASK_BLD_CHUNK
        lo_lat = min_lat[None, s:e]
        hi_lat = max_lat[None, s:e]
        lo_lon = min_lon[None, s:e]
        hi_lon = max_lon[None, s:e]
        if pad_lat is not None:
            lo_lat = lo_lat - pad_lat
            hi_lat = hi_lat + pad_lat
            lo_lon = lo_lon - pad_lon
            hi_lon = hi_lon + pad_lon
        m = (
            (plat[:, None] >= lo_lat) & (plat[:, None] <= hi_lat)
            & (plon[:, None] >= lo_lon) & (plon[:, None] <= hi_lon)
        )
        p, b = np.nonzero(m)
        pts.append(p)
        blds.append(b + s)
    return np.concatenate(pts), np.concatenate(blds)


def _pip_kernel(adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
    """All (address, containing building) pairs within one cell group."""
    if adf.empty or bdf.empty:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    plat = adf["lat"].to_numpy(dtype=np.float64)
    plon = adf["lon"].to_numpy(dtype=np.float64)
    pair_pt, pair_bld = _bbox_pairs(
        plat, plon,
        bdf["min_lat"].to_numpy(), bdf["max_lat"].to_numpy(),
        bdf["min_lon"].to_numpy(), bdf["max_lon"].to_numpy(),
    )
    if len(pair_pt) == 0:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    flat_lat, flat_lon, ring_off, poly_off = geom.flatten_polys_packed(
        bdf["ring_lats"].to_numpy(), bdf["ring_lons"].to_numpy(),
        bdf["hflat_lat"].to_numpy(), bdf["hflat_lon"].to_numpy(),
        bdf["hole_lens"].to_numpy(),
    )
    hit = geom.pairs_points_in_polys(
        plat, plon, pair_pt, pair_bld, flat_lat, flat_lon, ring_off, poly_off
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
    pair_pt, pair_bld = _bbox_pairs(
        plat, plon,
        bdf["min_lat"].to_numpy(), bdf["max_lat"].to_numpy(),
        bdf["min_lon"].to_numpy(), bdf["max_lon"].to_numpy(),
        pad_lat=pad_lat, pad_lon=pad_lon,
    )
    if len(pair_pt) == 0:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    flat_lat, flat_lon, ring_off, poly_off = geom.flatten_polys_packed(
        bdf["ring_lats"].to_numpy(), bdf["ring_lons"].to_numpy(),
        bdf["hflat_lat"].to_numpy(), bdf["hflat_lon"].to_numpy(),
        bdf["hole_lens"].to_numpy(),
    )
    d = geom.pairs_point_to_polys_dist_m(
        plat, plon, pair_pt, pair_bld, flat_lat, flat_lon, ring_off, poly_off
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
    b_exp = _pack_holes(buildings).select(
        F.explode("cells").alias("cell"), *_BLD_COGROUP_COLS
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


class BldIndex:
    """Broadcast building index (J6): plain numpy buffers — flattened
    rings, bboxes, and a sorted fine-cell cover for searchsorted
    candidate lookup. Pickles as raw buffers (fast to ship per task,
    unlike a pandas frame holding Python-list rings, whose per-task
    unpickle dominated the old broadcast path)."""

    def __init__(self, buildings_pdf: pd.DataFrame, level: int):
        self.level = level
        self.ids = buildings_pdf["building_id"].to_numpy(dtype=np.int64)
        self.areas = buildings_pdf["area_m2"].to_numpy(dtype=np.float64)
        self.min_lat = buildings_pdf["min_lat"].to_numpy(dtype=np.float64)
        self.min_lon = buildings_pdf["min_lon"].to_numpy(dtype=np.float64)
        self.max_lat = buildings_pdf["max_lat"].to_numpy(dtype=np.float64)
        self.max_lon = buildings_pdf["max_lon"].to_numpy(dtype=np.float64)
        holes_la = (buildings_pdf["hole_lats"].to_numpy()
                    if "hole_lats" in buildings_pdf else None)
        holes_lo = (buildings_pdf["hole_lons"].to_numpy()
                    if "hole_lons" in buildings_pdf else None)
        self.flat_lat, self.flat_lon, self.ring_off, self.poly_off = (
            geom.flatten_polys(
                buildings_pdf["ring_lats"].to_numpy(),
                buildings_pdf["ring_lons"].to_numpy(),
                holes_la, holes_lo,
            )
        )
        covers = cells.cover_bbox(
            self.min_lat, self.min_lon, self.max_lat, self.max_lon, level
        )
        lens = np.fromiter((len(c) for c in covers), dtype=np.int64,
                           count=len(covers))
        cover_cells = (np.concatenate(covers) if len(covers)
                       else np.empty(0, dtype=np.int64))
        cover_rows = np.repeat(np.arange(len(covers), dtype=np.int64), lens)
        order = np.argsort(cover_cells, kind="stable")
        self.cover_cells = cover_cells[order]
        self.cover_rows = cover_rows[order]

    def candidates(self, qcells: np.ndarray, qpt: np.ndarray):
        """(query cell, query point) → candidate (point, building) pair
        arrays, via binary search on the sorted cover."""
        lo = np.searchsorted(self.cover_cells, qcells, "left")
        hi = np.searchsorted(self.cover_cells, qcells, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        excl = np.zeros(len(qcells), dtype=np.int64)
        np.cumsum(cnt[:-1], out=excl[1:])
        local = np.arange(total, dtype=np.int64) - np.repeat(excl, cnt)
        pos = np.repeat(lo, cnt) + local
        return np.repeat(qpt, cnt), self.cover_rows[pos]


def build_broadcast_index(buildings_pdf: pd.DataFrame,
                          level: int = config.REFINE_INDEX_LEVEL) -> BldIndex:
    return BldIndex(buildings_pdf, level)


def _broadcast_refine(addresses: DataFrame, index: BldIndex,
                      pair_fn) -> DataFrame:
    """Broadcast path (J6): the numpy index ships as a Spark broadcast
    variable (once per executor, torrent protocol on a cluster — never
    re-pickled per task in the closure); the address side is never
    shuffled. ``pair_fn(plat, plon, addr_ids, index)`` returns the
    candidate-pair output frame."""
    bc = addresses.sparkSession.sparkContext.broadcast(index)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        for adf in batches:
            if adf.empty:
                continue
            out = pair_fn(
                adf["lat"].to_numpy(dtype=np.float64),
                adf["lon"].to_numpy(dtype=np.float64),
                adf["addr_id"].to_numpy(dtype=np.int64),
                idx,
            )
            if out is not None and not out.empty:
                yield out

    return addresses.select(*_ADDR_KERNEL_COLS).mapInPandas(run, schema=CAND_SCHEMA)


def _pip_pairs(plat, plon, addr_ids, index: BldIndex) -> pd.DataFrame:
    """PIP over broadcast index: fine-cell lookup → bbox filter → one
    flattened-edge pair-PIP pass."""
    fine = cells.encode(plat, plon, index.level)
    pair_pt, pair_bld = index.candidates(fine, np.arange(len(plat), dtype=np.int64))
    keep = (
        (plat[pair_pt] >= index.min_lat[pair_bld])
        & (plat[pair_pt] <= index.max_lat[pair_bld])
        & (plon[pair_pt] >= index.min_lon[pair_bld])
        & (plon[pair_pt] <= index.max_lon[pair_bld])
    )
    pair_pt, pair_bld = pair_pt[keep], pair_bld[keep]
    hit = geom.pairs_points_in_polys(
        plat, plon, pair_pt, pair_bld,
        index.flat_lat, index.flat_lon, index.ring_off, index.poly_off,
    )
    pi, bi = pair_pt[hit], pair_bld[hit]
    return pd.DataFrame(
        {
            "addr_id": addr_ids[pi],
            "building_id": index.ids[bi],
            "dist_m": np.zeros(len(pi), dtype=np.float64),
            "area_m2": index.areas[bi],
        }
    )


def _knn_pairs(plat, plon, addr_ids, index: BldIndex, cutoff_m: float) -> pd.DataFrame:
    """kNN over broadcast index: 3×3 fine-neighborhood lookup (valid
    while cutoff ≤ one fine-cell width — asserted at plan build) →
    padded-bbox filter → one flattened-edge pair-distance pass."""
    n = len(plat)
    fine = cells.encode(plat, plon, index.level)
    nb = cells.neighbors(fine).reshape(-1)  # (n*9,)
    qpt = np.repeat(np.arange(n, dtype=np.int64), 9)
    # prune neighbor cells farther than the cutoff (conservative rect
    # lower bound under the refine's own metric): typically 1–4 of the
    # 9 survive, shrinking the candidate lookup proportionally
    b0, b1, b2, b3 = cells.cell_bounds(nb)
    near_cell = cells.rect_dist_m(plat[qpt], plon[qpt], b0, b1, b2, b3) <= cutoff_m
    pair_pt, pair_bld = index.candidates(nb[near_cell], qpt[near_cell])
    if len(pair_pt) == 0:
        return pd.DataFrame(columns=["addr_id", "building_id", "dist_m", "area_m2"])
    # a building cover spanning several neighbor cells yields duplicate
    # pairs — dedupe with one sort so the distance pass runs once per pair
    key = pair_pt * np.int64(len(index.ids)) + pair_bld
    _, uidx = np.unique(key, return_index=True)
    pair_pt, pair_bld = pair_pt[uidx], pair_bld[uidx]

    pad_lat = cutoff_m / config.DEG_TO_M
    pad_lon = cutoff_m / (config.DEG_TO_M * np.cos(np.radians(plat[pair_pt])))
    keep = (
        (plat[pair_pt] >= index.min_lat[pair_bld] - pad_lat)
        & (plat[pair_pt] <= index.max_lat[pair_bld] + pad_lat)
        & (plon[pair_pt] >= index.min_lon[pair_bld] - pad_lon)
        & (plon[pair_pt] <= index.max_lon[pair_bld] + pad_lon)
    )
    pair_pt, pair_bld = pair_pt[keep], pair_bld[keep]
    d = geom.pairs_point_to_polys_dist_m(
        plat, plon, pair_pt, pair_bld,
        index.flat_lat, index.flat_lon, index.ring_off, index.poly_off,
    )
    ok = d <= cutoff_m
    pi, bi = pair_pt[ok], pair_bld[ok]
    return pd.DataFrame(
        {
            "addr_id": addr_ids[pi],
            "building_id": index.ids[bi],
            "dist_m": d[ok],
            "area_m2": index.areas[bi],
        }
    )


def _flat_pair_frame(pdf: pd.DataFrame, dists: np.ndarray | None = None,
                     mask: np.ndarray | None = None) -> pd.DataFrame:
    sel = np.flatnonzero(mask) if mask is not None else np.arange(len(pdf))
    return pd.DataFrame(
        {
            "addr_id": pdf["addr_id"].to_numpy(dtype=np.int64)[sel],
            "building_id": pdf["building_id"].to_numpy(dtype=np.int64)[sel],
            "dist_m": (np.zeros(len(sel), dtype=np.float64) if dists is None
                       else dists[sel]),
            "area_m2": pdf["area_m2"].to_numpy(dtype=np.float64)[sel],
        }
    )


def _pair_join_candidates(addresses: DataFrame, buildings: DataFrame,
                          level: int, knn_cutoff_m: float | None) -> DataFrame:
    """Shuffle strategy for J1/J2 at corpus scale: a Catalyst equi-join
    on FINE-level cells (addresses at their cell — or its 3×3
    neighborhood for kNN — against exploded building bbox-cover cells),
    a bbox predicate in the JVM, then a per-PAIR Arrow refine via
    mapInPandas. No applyInPandas groups exist, so there is no group
    that can outgrow an executor: skewed hot cells are ordinary join
    skew, which AQE's skew-join split handles. Shuffle volume carries
    each candidate pair's ring once; candidate counts stay near-linear
    because the fine cell (~1 km) bounds the match radius."""
    a = addresses.select("addr_id", "lat", "lon")
    if knn_cutoff_m is None:
        a = a.withColumn(
            "fcell", cells_sql.cell_expr(F.col("lat"), F.col("lon"), level)
        )
    else:
        # 3×3 fine-neighborhood expansion (valid while cutoff ≤ one fine
        # cell width — asserted by the caller), pruned to the neighbor
        # cells actually within the cutoff (conservative rect distance
        # under the refine's metric — typically 1–4 of 9 survive, which
        # shrinks the join's probe side proportionally). Arrow kernel,
        # not an all-expression explode (janino method-size limit).
        cutoff = knn_cutoff_m

        def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                if b.empty:
                    continue
                plat = b["lat"].to_numpy(np.float64)
                plon = b["lon"].to_numpy(np.float64)
                fine = cells.encode(plat, plon, level)
                nb = cells.neighbors(fine).reshape(-1)  # (n*9,)
                idx9 = np.repeat(np.arange(len(b)), 9)
                b0, b1, b2, b3 = cells.cell_bounds(nb)
                keep = cells.rect_dist_m(
                    plat[idx9], plon[idx9], b0, b1, b2, b3
                ) <= cutoff
                rep = b.iloc[idx9[keep]].reset_index(drop=True)
                rep["fcell"] = nb[keep]
                yield rep

        a = a.mapInPandas(
            expand, schema="addr_id long, lat double, lon double, fcell long"
        )

    b = buildings.select(
        "building_id", "ring_lats", "ring_lons", "hole_lats", "hole_lons",
        "area_m2",
        F.col("min_lat").alias("b_min_lat"), F.col("min_lon").alias("b_min_lon"),
        F.col("max_lat").alias("b_max_lat"), F.col("max_lon").alias("b_max_lon"),
    ).withColumn(
        "fcell",
        F.explode(
            cells_sql.bbox_cover_cells_expr(
                F.col("b_min_lat"), F.col("b_min_lon"),
                F.col("b_max_lat"), F.col("b_max_lon"), level,
            )
        ),
    )

    if knn_cutoff_m is None:
        bbox_pred = (
            (F.col("lat") >= F.col("b_min_lat")) & (F.col("lat") <= F.col("b_max_lat"))
            & (F.col("lon") >= F.col("b_min_lon")) & (F.col("lon") <= F.col("b_max_lon"))
        )
    else:
        pad_lat = F.lit(knn_cutoff_m / config.DEG_TO_M)
        pad_lon = F.lit(knn_cutoff_m) / (
            F.lit(config.DEG_TO_M) * F.cos(F.radians(F.col("lat")))
        )
        bbox_pred = (
            (F.col("lat") >= F.col("b_min_lat") - pad_lat)
            & (F.col("lat") <= F.col("b_max_lat") + pad_lat)
            & (F.col("lon") >= F.col("b_min_lon") - pad_lon)
            & (F.col("lon") <= F.col("b_max_lon") + pad_lon)
        )

    # a building cover spanning several (neighbor) cells can duplicate a
    # pair; identical rows are harmless for the top-1 window, so no
    # dedup shuffle here
    cand = a.join(b, "fcell").filter(bbox_pred).select(
        "addr_id", "lat", "lon",
        "building_id", "ring_lats", "ring_lons", "hole_lats", "hole_lons",
        "area_m2",
    )
    cutoff = knn_cutoff_m

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            flat_lat, flat_lon, ring_off, poly_off = geom.flatten_polys(
                pdf["ring_lats"].to_numpy(), pdf["ring_lons"].to_numpy(),
                pdf["hole_lats"].to_numpy(), pdf["hole_lons"].to_numpy(),
            )
            idx = np.arange(len(pdf), dtype=np.int64)
            plat = pdf["lat"].to_numpy(dtype=np.float64)
            plon = pdf["lon"].to_numpy(dtype=np.float64)
            if cutoff is None:
                hit = geom.pairs_points_in_polys(
                    plat, plon, idx, idx, flat_lat, flat_lon, ring_off, poly_off
                )
                out = _flat_pair_frame(pdf, mask=hit)
            else:
                d = geom.pairs_point_to_polys_dist_m(
                    plat, plon, idx, idx, flat_lat, flat_lon, ring_off, poly_off
                )
                out = _flat_pair_frame(pdf, dists=d, mask=d <= cutoff)
            if not out.empty:
                yield out

    return cand.mapInPandas(refine, schema=CAND_SCHEMA)


def pip_candidates(addresses: DataFrame, buildings: DataFrame,
                   broadcast_index: BldIndex | None = None,
                   salt_threshold: int = config.SALT_THRESHOLD,
                   strategy: str = config.SPATIAL_JOIN_STRATEGY) -> DataFrame:
    """J1: (addr, containing-building) candidate pairs.

    Strategies: broadcast (small building side, no shuffle at all),
    pair-join (default shuffle path — fine-cell equi-join + per-pair
    refine, skew handled by AQE), cogroup (salted applyInPandas groups —
    kept for the explicit hot-cell-salting strategy and tests)."""
    if broadcast_index is not None:
        return _broadcast_refine(addresses, broadcast_index, _pip_pairs)
    if strategy == "cogroup":
        return _cogroup_refine(addresses, buildings, _pip_kernel, salt_threshold)
    return _pair_join_candidates(
        addresses, buildings, config.REFINE_INDEX_LEVEL, knn_cutoff_m=None
    )


def knn_candidates(addresses: DataFrame, buildings: DataFrame,
                   cutoff_m: float = config.KNN_CUTOFF_M,
                   level: int = config.CELL_LEVEL,
                   broadcast_index: BldIndex | None = None,
                   salt_threshold: int = config.SALT_THRESHOLD,
                   strategy: str = config.SPATIAL_JOIN_STRATEGY) -> DataFrame:
    """J2 candidates: addresses matched against building cover cells in
    their 3×3 cell neighborhood (T3). Same strategy set as
    :func:`pip_candidates`."""
    if broadcast_index is not None:
        assert cells.min_cell_width_m(broadcast_index.level, 80.0) >= cutoff_m, (
            "kNN cutoff exceeds one fine-cell width — neighborhood incomplete (§8.5)"
        )
        pair_fn = lambda plat, plon, ids, idx: _knn_pairs(plat, plon, ids, idx, cutoff_m)
        return _broadcast_refine(addresses, broadcast_index, pair_fn)
    if strategy != "cogroup":
        assert cells.min_cell_width_m(config.REFINE_INDEX_LEVEL, 80.0) >= cutoff_m, (
            "kNN cutoff exceeds one fine-cell width — neighborhood incomplete (§8.5)"
        )
        return _pair_join_candidates(
            addresses, buildings, config.REFINE_INDEX_LEVEL, knn_cutoff_m=cutoff_m
        )

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
    b_exp = _pack_holes(buildings).select(
        F.explode("cells").alias("cell"), *_BLD_COGROUP_COLS
    )
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


def pick_knn_topk(cands: DataFrame, k: int,
                  unique_pairs: bool = False) -> DataFrame:
    """Generic k-nearest (k ≥ 1) with the §8.4 deterministic tie order —
    the reference needs only k=1 (pick_knn_winner), but the candidate
    generation is k-agnostic (every building within the cutoff surfaces
    as a candidate), so top-k is just a wider window. Candidates can
    arrive duplicated (a cover spanning several neighbor cells), so
    they are deduped per (addr, building) first — row_number over
    identical rows would otherwise consume ranks.

    ``unique_pairs=True`` is the caller's promise that each
    (addr_id, building_id) appears at most once — true by construction
    for ``flat_grid_candidates`` output (the probe side carries exactly
    one grid cell, the neighbor copies live on the build side, so every
    pair joins exactly once). The promise removes the dedup groupBy,
    which on unique input is a no-op that still costs a full shuffle +
    hash aggregate of the candidate mass BEFORE the window's own
    shuffle — one exchange instead of two on the operator's dominant
    data volume (measured on knn_topk_suppliers, BENCH/BASELINE.md r5).
    Results are identical on unique input (asserted in
    tests/test_spatial_join.py)."""
    w = Window.partitionBy("addr_id").orderBy(F.asc("dist_m"), F.asc("building_id"))
    dedup = cands if unique_pairs else cands.groupBy(
        "addr_id", "building_id").agg(
        F.min("dist_m").alias("dist_m"), F.first("area_m2").alias("area_m2")
    )
    return (
        dedup.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("addr_id", "building_id", "knn_rank", "dist_m")
    )


def flat_grid_candidates(a: DataFrame, b: DataFrame,
                         cutoff_m: float, cos_lat0: float,
                         a_lat: str = "a_lat", a_lon: str = "a_lon",
                         b_lat: str = "b_lat", b_lon: str = "b_lon",
                         broadcast_b: bool = False) -> DataFrame:
    """Point↔point candidate pairs within ``cutoff_m`` as a pure
    EQUI-JOIN (J2 family, point-point specialization): bucket both
    sides on a flat-projection grid whose cell size equals the cutoff,
    explode the (smaller) ``b`` side to its 3×3 neighborhood, and join
    on the grid key. Any pair within the cutoff differs by at most one
    cell per axis, so the neighborhood is complete; the exact
    ``dist_m <= cutoff_m`` refine keeps results identical to the
    brute-force formulation while the plan stays a shuffle/broadcast
    HASH join — no nested loop, no cartesian, scales to both sides
    being large.

    ``cos_lat0`` is the flat-projection latitude factor (small-area
    assumption, same contract as geom_sql.flat_dist_m_expr — the
    distance is bit-exact cross-engine)."""
    from mergeaddressesandbuildings_spark.functions import geom_sql

    dlat = cutoff_m / config.DEG_TO_M
    dlon = cutoff_m / (config.DEG_TO_M * cos_lat0)
    offsets = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
        for i in (-1, 0, 1) for j in (-1, 0, 1)
    ])
    b9 = (
        b.withColumn("_o", F.explode(offsets))
        .withColumn("_gx", F.floor(F.col(b_lat) / F.lit(dlat)) + F.col("_o.i"))
        .withColumn("_gy", F.floor(F.col(b_lon) / F.lit(dlon)) + F.col("_o.j"))
        .drop("_o")
    )
    a_g = (
        a.withColumn("_gx", F.floor(F.col(a_lat) / F.lit(dlat)))
        .withColumn("_gy", F.floor(F.col(a_lon) / F.lit(dlon)))
    )
    d = geom_sql.flat_dist_m_expr(
        F.col(a_lat), F.col(a_lon), F.col(b_lat), F.col(b_lon),
        F.lit(cos_lat0),
    )
    if broadcast_b:
        # small b side: broadcast the exploded buckets — the join stays
        # a HASH join (one probe per a-row) and the big side never
        # shuffles; with broadcast_b=False both sides shuffle on the
        # grid key (the both-sides-large path).
        b9 = F.broadcast(b9)
    return (
        a_g.join(b9, ["_gx", "_gy"])
        .withColumn("dist_m", d)
        .filter(F.col("dist_m") <= F.lit(cutoff_m))
        .drop("_gx", "_gy")
    )
