"""The flagship plan: full address↔building merge pipeline
(SURVEY.md §3.2 E3; BASELINE.json:6 north_star).

    pages ──F9──► extract (S3) ──► addresses ──J4 dedupe──┐
                              └──► new buildings ──J3─────┤
    existing_osm ─────────────► existing tables ──────────┤
                                                          ▼
                      buildings universe = survivors ∪ existing ways
                                                          │
        J1 PIP cogroup-on-cell ──► winners ──┐            │
        J2 kNN on the unmatched remainder ───┤◄───────────┘
                                             ▼
              decisions (A1/J5) ──► assignments + output sets
                                             ▼
                    tiling (T4/T5) ──► tile column, budgeted

Every stage is a DataFrame; the only Python crossings are the Arrow
kernels (extraction, PIP/kNN refine, tile encode).
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark import StorageLevel

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.operators import (
    decisions as dec,
    dedupe,
    extract,
    spatial_join as sj,
    tiling,
)


@dataclass
class MergeResult:
    addresses: DataFrame
    buildings: DataFrame
    assignments: DataFrame
    sets: DataFrame
    tiles: DataFrame  # assignments+buildings with tile column
    tile_points: DataFrame  # the tile universe (elem_id, lat, lon, kind)
    tile_map: DataFrame  # distinct fine-cell → tile map (computed ONCE;
    # consumers that know a row's coordinates join this small map
    # directly instead of re-deriving it — jobs/merge.py)


def _lineage_barrier(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` to scratch parquet and re-read it — truncating plan
    lineage. The merge DAG fans each intermediate table into several
    consumers; without a barrier every downstream action re-analyzes the
    FULL upstream logical plan (hundreds of operators), and on this
    pipeline the driver-side planning cost dominates small-scale runs
    (~4-8 s per action measured at 20k pages even with every input
    cached). The barriered tables (addresses, buildings, assignments)
    are orders of magnitude smaller than the raw pages input, so at
    cluster scale the extra write is modest and buys O(1) plan size for
    the whole downstream DAG plus restartability. (`localCheckpoint`
    would do the same but materializes via the non-AQE `.rdd` path,
    measured ~7x slower — parquet round-trip is the fast barrier.)"""
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_merge(
    spark: SparkSession,
    pages: DataFrame,
    existing_osm: DataFrame | None = None,
    level: int = config.CELL_LEVEL,
    budget: int = config.TILE_MAX_ELEMS,
    knn_cutoff_m: float = config.KNN_CUTOFF_M,
    salt_threshold: int = config.SALT_THRESHOLD,
    broadcast_max: int = config.BROADCAST_BUILDINGS_MAX,
    county_ring: tuple | None = None,
    barrier_dir: str | None = "auto",
) -> MergeResult:
    """See module docstring. ``barrier_dir``: scratch directory for
    lineage barriers (parquet write + re-read of the small intermediate
    tables); ``"auto"`` creates a temp dir, ``None`` disables barriers
    (pure-lazy mode — correct but slow, the persisted frames keep full
    lineage and every downstream action pays plan re-analysis)."""
    # parquet splitting is SIZE-based; page html is small but extraction
    # is CPU-heavy per row, so a compact fixture scan yields far fewer
    # partitions than cores and the Arrow kernels run almost serial.
    # Fan the input out to the session's parallelism first (tiny shuffle
    # of raw bytes, repaid immediately by the extraction stage).
    par = spark.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < par:
        pages = pages.repartition(par * 2)
    if existing_osm is not None and existing_osm.rdd.getNumPartitions() < par:
        existing_osm = existing_osm.repartition(par * 2)

    if barrier_dir == "auto":
        barrier_dir = tempfile.mkdtemp(prefix="merge_barrier_")

    records = extract.extract_records(pages, level=level)
    # materialize the extraction once: addresses & buildings both branch
    # from it, and persisting here keeps `html` out of every later scan.
    # NOT a parquet barrier: records still carries the page-sized
    # payload columns, and writing them to scratch parquet costs more
    # than the planning time the barrier saves (measured round 4 at
    # 20k pages/local[32]: parquet-barriered records pushed the merge
    # median from ~18 s to ~30 s). The plan-size cap happens at
    # barrier #1 below, where addresses/buildings are payload-free.
    records = records.persist(StorageLevel.MEMORY_AND_DISK)

    addresses, new_buildings = extract.split_records(records)

    if county_ring is not None:
        # P3: drop elements outside the county polygon (reference
        # behavior) — bbox pushdown + exact PIP refine
        from mergeaddressesandbuildings_spark.operators import boundary
        rlat, rlon = county_ring
        addresses = boundary.filter_in_boundary(addresses, rlat, rlon)
        new_buildings = boundary.filter_in_boundary(
            new_buildings, rlat, rlon,
            lat_col="centroid_lat", lon_col="centroid_lon",
        )

    if existing_osm is not None:
        ex_nodes, ex_ways = extract.existing_to_tables(existing_osm, level=level)
        ex_ways = ex_ways.persist(StorageLevel.MEMORY_AND_DISK)
        addresses = dedupe.dedupe_addresses(addresses, ex_nodes)
        new_buildings = dedupe.dedupe_buildings(new_buildings, ex_ways)
        buildings = new_buildings.unionByName(ex_ways)
    else:
        buildings = new_buildings

    if barrier_dir is not None:
        # lineage barrier #1: addresses/buildings feed four downstream
        # consumers each (PIP, kNN, decisions, tiling) — cap the plan
        # they all inherit. This is also the cache-consistency barrier
        # (parquet is immutable, so the parallel stage submission race
        # that lazily-persisted frames suffer cannot occur).
        addresses = _lineage_barrier(spark, addresses, f"{barrier_dir}/addresses")
        buildings = _lineage_barrier(spark, buildings, f"{barrier_dir}/buildings")
    else:
        addresses = addresses.persist(StorageLevel.MEMORY_AND_DISK)
        buildings = buildings.persist(StorageLevel.MEMORY_AND_DISK)

    # J6 broadcast decision: small building side → ship as closure, no
    # shuffle at all. (On a cluster this is the per-region fast path.)
    n_bld = buildings.count()
    broadcast_idx = None
    if n_bld <= broadcast_max:
        broadcast_idx = sj.build_broadcast_index(
            buildings.select(
                "building_id", "ring_lats", "ring_lons",
                "hole_lats", "hole_lons",
                "min_lat", "min_lon", "max_lat", "max_lon", "area_m2",
            ).toPandas()
        )

    pip = sj.pip_candidates(addresses, buildings, broadcast_index=broadcast_idx,
                            salt_threshold=salt_threshold)
    # winners feed three consumers (unmatched anti-join, decisions,
    # output sets) — persist AND materialize eagerly: a lazily-persisted
    # frame referenced from several branches of one downstream job gets
    # recomputed per branch (parallel stage submission races the cache),
    # so each hot frame is counted once right after persist. The counts
    # are the materialization passes, not extra work.
    pip_winners = sj.pick_pip_winner(pip).persist(StorageLevel.MEMORY_AND_DISK)
    pip_winners.count()

    unmatched = addresses.join(pip_winners.select("addr_id"), "addr_id", "left_anti")
    knn = sj.knn_candidates(unmatched, buildings, cutoff_m=knn_cutoff_m,
                            level=level, broadcast_index=broadcast_idx,
                            salt_threshold=salt_threshold)
    knn_winners = sj.pick_knn_winner(knn).persist(StorageLevel.MEMORY_AND_DISK)
    knn_winners.count()

    assignments = dec.assign(addresses, pip_winners, knn_winners, buildings)
    if barrier_dir is not None:
        # lineage barrier #2: assignments fan into output sets, tiling,
        # and the caller's writes.
        assignments = _lineage_barrier(
            spark, assignments, f"{barrier_dir}/assignments")
    else:
        assignments = assignments.persist(StorageLevel.MEMORY_AND_DISK)
        assignments.count()  # see pip_winners note: materialize before fan-out
    sets = dec.output_sets(assignments, buildings)

    points = tiling.tile_points(assignments, buildings)
    tm = tiling.tile_map(points, budget=budget, level=level)
    tiles = tiling.assign_tiles(points, budget=budget, level=level, tm=tm)

    return MergeResult(
        addresses=addresses,
        buildings=buildings,
        assignments=assignments,
        sets=sets,
        tiles=tiles,
        tile_points=points,
        tile_map=tm,
    )
