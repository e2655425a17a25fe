"""Incremental merge: recompute proportional to the page DELTA, not
the corpus (SURVEY.md §3.2 E3 + §2.5 S5 carried to its cluster-scale
conclusion; BASELINE.json north_star "resumable from per-tile
checkpoints" — this is the re-RUN side of resumability).

At 10^12 pages a crawl increment touches a vanishing fraction of
urls; re-running the full pipeline to absorb it wastes O(corpus)
extraction + spatial-join work. This plan keeps the expensive stages'
results in snapshot-versioned tables (sources/snapshots.py) keyed so
a url-level change set can be SPLICED in:

    state tables (all under one state dir)
      records      extract_records output, keyed by url   [O(pages)]
      addresses    post-J4 address rows, keyed by url     [O(elems)]
      buildings    post-J3 survivors ∪ existing ways,
                   keyed by url ('osm://existing' rows
                   are the static OSM state)              [O(elems)]
      pip_winners  §8.4(1) winners + the address CELL,
                   keyed and range-clustered by cell      [O(elems)]
      knn_winners  §8.4(2) winners, same layout           [O(elems)]
      ex_nodes     existing OSM address nodes (static)
      meta.json    the merge parameters the state was built with
                   (level, cutoff, …) — an increment MUST reuse them

Change propagation is bounded by the same invariant the spatial join
already asserts (§8.5: kNN cutoff ≤ one cell width at ``level``), so
Morton-ring expansion gives an EXACT affected closure:

    base   = cells touched by the changed urls' old ∪ new records
             (address cells + full building bbox covers)
    ring1  = base ∪ its 8-neighbors   → every address whose effective
             candidate set (PIP containment or kNN ≤ cutoff) can have
             changed has cell ∈ ring1
    ring2  = ring1 ∪ its 8-neighbors  → every building that can be a
             candidate for a ring1 address has a cover cell ∈ ring2

so the spatial join re-runs ONLY over (addresses in ring1) ×
(buildings covering ring2), and the winner tables are spliced BY
CELL: every winner that can change sits in a ring1 cell (sub
addresses by construction; removed urls' addresses because their
cells are in base ⊆ ring1), so "delete ring1 cells, insert the
sub-run's winners" is exact — and since the winner tables are
range-clustered by cell, the copy-on-write rewrite touches only the
ring-intersecting files, not the table (an addr_id key would
hash-scatter a spatially-local purge across EVERY file). Decisions
CANNOT be spliced — §8.4's per-building vote
(conflict/keep-node/merged) aggregates over ALL addresses assigned to
a building, so one spliced winner can flip the decision of an
untouched address — therefore decisions/output-sets/tiling recompute
globally from the spliced winner tables. Those stages are
element-scale hash aggs + window passes (no html, no geometry
kernels): at the 10^12-page target they are noise next to the
extraction and PIP/kNN kernels this plan avoids re-running.

Exactness contract (tested: incremental == full rebuild, fingerprint
equal): J4/J3 dedupe are row-local given the static existing state,
winner picks are deterministic per candidate set, and the closure
above is a superset of every row whose candidate set changed.

The change-set contract: ``page_changes`` carries, per changed url,
the url's FULL new page state (its current latest capture; multiple
captures are latest-capture-reduced exactly like the full pipeline)
plus ``deleted=true`` rows for urls that left the corpus. Partial
deltas (an older capture of a url whose newest row is NOT in the
delta) violate latest-capture-wins and are the caller's bug.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells
from mergeaddressesandbuildings_spark.operators import (
    decisions as dec,
    dedupe,
    extract,
    spatial_join as sj,
    tiling,
)
from mergeaddressesandbuildings_spark.sources import snapshots as snap

_TABLES = ("records", "addresses", "buildings",
           "pip_winners", "knn_winners", "ex_nodes")


def _t(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "meta.json")


_LOCALIZE_CAP = 500_000


def _localize(df: DataFrame, cap: int = _LOCALIZE_CAP) -> DataFrame:
    """Collect a small frame into a driver-local leaf (an ExistingRDD
    scan; falls back to the distributed frame above ``cap`` rows).
    Local key sets broadcast in every downstream join and carry no
    upstream lineage — which immunizes the splice plans against the
    analyzer's attribute-deduplication defeating cache lookup on
    shared subtrees (apply_delta notes)."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        return df
    return df.sparkSession.createDataFrame(rows, df.schema)


def _closure_rings(cell_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """distinct base cells → (ring1, ring2): one and two rounds of
    8-neighbor Morton expansion (T3's numpy kernel, same
    pole/antimeridian clamping as the kNN expansion), in ONE pass.
    Expansion is pointwise (neigh(S) = ∪ neigh(s)), so per-partition
    expansion followed by a global distinct is exact; a cell reached
    at ring 1 by any partition lands in ring1 via min(ring)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            c = b["cell"].to_numpy(dtype=np.int64)
            if len(c) == 0:
                continue
            r1 = np.unique(cells.neighbors(c).ravel())
            r2 = np.unique(cells.neighbors(r1).ravel())
            yield pd.DataFrame({
                "cell": np.concatenate([r1, r2]),
                "ring": np.concatenate([
                    np.ones(len(r1), dtype=np.int32),
                    np.full(len(r2), 2, dtype=np.int32)]),
            })

    ringed = (cell_df.select("cell").distinct()
              .mapInPandas(run, "cell long, ring int")
              .groupBy("cell").agg(F.min("ring").alias("ring"))
              .persist())
    try:
        ring2 = _localize(ringed.select("cell"))
        ring1 = _localize(ringed.filter(F.col("ring") == 1)
                          .select("cell"))
    finally:
        ringed.unpersist()
    return ring1, ring2


def _record_cells(records: DataFrame) -> DataFrame:
    """One (cell) row per cell a record table touches: address cells
    plus every building bbox-cover cell (covers are frozen into the
    rows at the level the state was built with)."""
    addr = records.filter(F.col("kind") == "address").select("cell")
    bld = (records.filter(F.col("kind") == "building")
           .select(F.explode("cells").alias("cell")))
    return addr.unionByName(bld).distinct()


def _winners(spark: SparkSession, addresses: DataFrame,
             buildings: DataFrame, level: int, knn_cutoff_m: float,
             salt_threshold: int,
             broadcast_max: int) -> tuple[DataFrame, DataFrame]:
    """The J1→J2 winner pass of plans/merge.py over an arbitrary
    (addresses, buildings) slice — identical strategy choices, so the
    sub-run of an increment picks bit-identical winners. Winners come
    back with the address ``cell`` attached (the state tables' splice
    key)."""
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
    acells = addresses.select("addr_id", "cell")
    pip = sj.pip_candidates(addresses, buildings,
                            broadcast_index=broadcast_idx,
                            salt_threshold=salt_threshold)
    pip_w = sj.pick_pip_winner(pip).join(acells, "addr_id")
    pip_w = pip_w.persist()
    pip_w.count()
    unmatched = addresses.join(pip_w.select("addr_id"), "addr_id",
                               "left_anti")
    knn = sj.knn_candidates(unmatched, buildings, cutoff_m=knn_cutoff_m,
                            level=level, broadcast_index=broadcast_idx,
                            salt_threshold=salt_threshold)
    knn_w = sj.pick_knn_winner(knn).join(acells, "addr_id")
    return pip_w, knn_w


def full_build(spark: SparkSession, pages: DataFrame,
               existing_osm: DataFrame | None, state_dir: str,
               level: int = config.CELL_LEVEL,
               knn_cutoff_m: float = config.KNN_CUTOFF_M,
               salt_threshold: int = config.SALT_THRESHOLD,
               broadcast_max: int = config.BROADCAST_BUILDINGS_MAX) -> dict:
    """Run the full pipeline once and persist the incremental state
    tables. Returns {table: manifest} plus the run parameters."""
    os.makedirs(state_dir, exist_ok=True)

    # extraction is CPU-bound per row; fan a compact input out to the
    # session's parallelism first (plans/merge.py has the same prolog)
    par = spark.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < par:
        pages = pages.repartition(par * 2)

    # state tables are written CLUSTERED BY their splice key: a changed
    # key then hits O(1) data files, so replace_keys' copy-on-write
    # rewrites a bounded file set instead of the whole table (the same
    # reason Iceberg tables bucket by merge key)
    nfiles = par * 2

    records = extract.extract_records(pages, level=level) \
        .repartition(nfiles, "url")
    m_rec = snap.write_snapshot(records, _t(state_dir, "records"),
                                mode="overwrite", cluster_by=["url"])
    records = snap.read_snapshot(spark, _t(state_dir, "records"))

    addresses, new_buildings = extract.split_records(records)
    if existing_osm is not None:
        ex_nodes, ex_ways = extract.existing_to_tables(existing_osm,
                                                       level=level)
        addresses = dedupe.dedupe_addresses(addresses, ex_nodes)
        new_buildings = dedupe.dedupe_buildings(new_buildings, ex_ways)
        buildings = new_buildings.unionByName(ex_ways)
    else:
        ex_nodes = spark.createDataFrame(
            [], "addr_id long, lat double, lon double, "
                "housenumber string, street string")
        buildings = new_buildings
    snap.write_snapshot(ex_nodes, _t(state_dir, "ex_nodes"),
                        mode="overwrite")

    m_addr = snap.write_snapshot(addresses.repartition(nfiles, "url"),
                                 _t(state_dir, "addresses"),
                                 mode="overwrite", cluster_by=["url"])
    m_bld = snap.write_snapshot(buildings.repartition(nfiles, "url"),
                                _t(state_dir, "buildings"),
                                mode="overwrite", cluster_by=["url"])
    addresses = snap.read_snapshot(spark, _t(state_dir, "addresses"))
    buildings = snap.read_snapshot(spark, _t(state_dir, "buildings"))

    pip_w, knn_w = _winners(spark, addresses, buildings, level,
                            knn_cutoff_m, salt_threshold, broadcast_max)
    # RANGE-cluster the winner tables by cell: an increment's purge
    # set is a set of spatially-local cells, so range clustering keeps
    # the copy-on-write rewrite to the ring-intersecting files
    m_pip = snap.write_snapshot(
        pip_w.repartitionByRange(nfiles, "cell"),
        _t(state_dir, "pip_winners"), mode="overwrite",
        cluster_by=["cell"], cluster_kind="range")
    m_knn = snap.write_snapshot(
        knn_w.repartitionByRange(nfiles, "cell"),
        _t(state_dir, "knn_winners"), mode="overwrite",
        cluster_by=["cell"], cluster_kind="range")
    pip_w.unpersist()

    meta = {"level": level, "knn_cutoff_m": knn_cutoff_m,
            "salt_threshold": salt_threshold,
            "broadcast_max": broadcast_max}
    with open(_meta_path(state_dir), "w") as f:
        json.dump(meta, f)
    return {"records": m_rec, "addresses": m_addr, "buildings": m_bld,
            "pip_winners": m_pip, "knn_winners": m_knn, **meta}


def apply_delta(spark: SparkSession, page_changes: DataFrame,
                state_dir: str,
                deleted_col: str = "deleted") -> dict:
    """Splice a url-keyed page change set into the state (module
    docstring: contract, closure math). Returns delta metrics —
    notably ``n_affected_addresses`` / ``n_sub_buildings``, the actual
    recompute scope, vs ``n_addresses_total``."""
    import time as _time

    with open(_meta_path(state_dir)) as f:
        meta = json.load(f)
    level = meta["level"]
    timings: dict[str, float] = {}
    _t0 = _time.monotonic()

    def _lap(stage: str) -> None:
        nonlocal _t0
        now = _time.monotonic()
        timings[stage] = round(now - _t0, 2)
        _t0 = now

    has_del = deleted_col in page_changes.columns
    # LOCALIZE the changed-url set (delta-sized): a local frame
    # broadcasts in every downstream join, and — decisive here — its
    # plan shares no subtree with the insert frames' lineage. Shared
    # subtrees across a union/join make Spark's analyzer deduplicate
    # attribute ids, and the rewritten branch no longer matches its
    # cache entry, silently recomputing the whole upstream pipeline
    # (measured: a 0.3 s purge became 36 s). Same treatment for the
    # closure rings below.
    changed_urls = _localize(page_changes.select("url").distinct())
    upserts = page_changes
    if has_del:
        upserts = upserts.filter(
            ~F.coalesce(F.col(deleted_col), F.lit(False)))
    upserts = upserts.drop(deleted_col) if has_del else upserts
    par = spark.sparkContext.defaultParallelism
    if upserts.rdd.getNumPartitions() < par:
        upserts = upserts.repartition(par)

    new_records = extract.extract_records(upserts, level=level)
    new_records = new_records.persist()
    n_new_records = new_records.count()
    _lap("extract_delta")

    records_tbl = _t(state_dir, "records")
    old_changed = (snap.read_snapshot(spark, records_tbl)
                   .join(changed_urls, "url", "left_semi")
                   .persist())
    n_old_records = old_changed.count()
    _lap("old_records")

    # affected closure (module docstring): base → ring1 → ring2,
    # localized (see changed_urls note; ring sizes are O(25 × base))
    base = _record_cells(old_changed).unionByName(
        _record_cells(new_records)).distinct()
    ring1, ring2 = _closure_rings(base)
    _lap("closure_rings")

    # splice the element tables by url (replace_keys: delete-then-
    # insert). The three tables are independent — their commits run
    # concurrently (Spark schedules the jobs side by side; the
    # snapshot layer is single-writer PER TABLE, which threads here
    # respect). NOTE: ex_ways must come from the PRE-splice buildings
    # snapshot, so resolve the frozen file list before launching.
    addr_delta, bld_delta = extract.split_records(new_records)
    ex_nodes = snap.read_snapshot(spark, _t(state_dir, "ex_nodes"))
    ex_ways = (snap.read_snapshot(spark, _t(state_dir, "buildings"))
               .filter(F.col("existing")))
    addr_delta = dedupe.dedupe_addresses(addr_delta, ex_nodes)
    bld_delta = dedupe.dedupe_buildings(bld_delta, ex_ways)
    from concurrent.futures import ThreadPoolExecutor

    # inserts_covered: every insert row's url IS a changed url by
    # construction (the inserts derive from the upsert half of the
    # change set)
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(snap.replace_keys, spark, records_tbl, ["url"],
                        changed_urls, new_records,
                        inserts_covered=True),
            pool.submit(snap.replace_keys, spark,
                        _t(state_dir, "addresses"), ["url"],
                        changed_urls, addr_delta,
                        inserts_covered=True),
            pool.submit(snap.replace_keys, spark,
                        _t(state_dir, "buildings"), ["url"],
                        changed_urls, bld_delta,
                        inserts_covered=True),
        ]
        for f in futs:
            f.result()
    _lap("element_splices")
    new_records.unpersist()

    # recompute winners on the closure slice only
    addresses = snap.read_snapshot(spark, _t(state_dir, "addresses"))
    buildings = snap.read_snapshot(spark, _t(state_dir, "buildings"))
    n_addr_total = addresses.count()

    # widen the slices to the session's parallelism BEFORE caching:
    # the semi-join inherits the snapshot scan's partitioning (ring1
    # broadcasts), i.e. the table's FILE count — after maintenance
    # that can be far below the core count, and every map stage of the
    # winner recompute (pack/explode/salt before the cogroup shuffle)
    # would then run nearly serial. One bounded shuffle here buys full
    # parallelism for the expensive Arrow kernels downstream.
    par = spark.sparkContext.defaultParallelism
    sub_addr = addresses.join(ring1, "cell", "left_semi")
    if sub_addr.rdd.getNumPartitions() < par:
        sub_addr = sub_addr.repartition(par * 2)
    sub_addr = sub_addr.persist()
    n_sub_addr = sub_addr.count()
    sub_bld_ids = (buildings
                   .select("building_id", F.explode("cells").alias("cell"))
                   .join(ring2, "cell", "left_semi")
                   .select("building_id").distinct())
    sub_bld = buildings.join(sub_bld_ids, "building_id", "left_semi")
    if sub_bld.rdd.getNumPartitions() < par:
        sub_bld = sub_bld.repartition(par * 2)
    sub_bld = sub_bld.persist()
    n_sub_bld = sub_bld.count()
    _lap("closure_slices")

    pip_w, knn_w = _winners(spark, sub_addr, sub_bld, level,
                            meta["knn_cutoff_m"], meta["salt_threshold"],
                            meta["broadcast_max"])

    # splice winners BY CELL (module docstring): every winner that can
    # change sits in a ring1 cell, so the purge key set is ring1
    # itself — a few hundred rows — and the cell-range-clustered
    # tables rewrite only their ring-intersecting files
    knn_w = knn_w.persist()
    knn_w.count()  # materialize before the concurrent splices race it
    _lap("winners")
    # inserts_covered: every sub-run winner's cell ∈ ring1 (sub
    # addresses are the ring1 semi-join by construction)
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(snap.replace_keys, spark,
                        _t(state_dir, "pip_winners"), ["cell"],
                        ring1, pip_w, inserts_covered=True),
            pool.submit(snap.replace_keys, spark,
                        _t(state_dir, "knn_winners"), ["cell"],
                        ring1, knn_w, inserts_covered=True),
        ]
        for f in futs:
            f.result()
    _lap("winner_splices")
    pip_w.unpersist()
    knn_w.unpersist()
    sub_addr.unpersist()
    sub_bld.unpersist()
    old_changed.unpersist()
    out = {
        "n_changed_urls": changed_urls.count(),
        "n_new_records": n_new_records,
        "n_old_records": n_old_records,
        "n_affected_addresses": n_sub_addr,
        "n_sub_buildings": n_sub_bld,
        "n_addresses_total": n_addr_total,
        "affected_fraction": (n_sub_addr / n_addr_total
                              if n_addr_total else 0.0),
        "stage_s": timings,
    }
    return out


def current_outputs(spark: SparkSession, state_dir: str,
                    budget: int = config.TILE_MAX_ELEMS):
    """(assignments, sets, tiles, tile_map) from the current state —
    the same global decision/tiling tail as plans/merge.run_merge,
    over the spliced element tables (element-scale; no extraction, no
    geometry kernels). ``tile_map`` is the distinct fine-cell → tile
    map, the frame jobs/merge.py joins assignments against for the
    fingerprint-bearing flat output."""
    with open(_meta_path(state_dir)) as f:
        meta = json.load(f)
    addresses = snap.read_snapshot(spark, _t(state_dir, "addresses"))
    buildings = snap.read_snapshot(spark, _t(state_dir, "buildings"))
    # the stored winners carry their splice key (cell) — drop it
    # before assign, whose address join brings its own cell column
    pip_w = snap.read_snapshot(spark, _t(state_dir, "pip_winners")) \
        .drop("cell")
    knn_w = snap.read_snapshot(spark, _t(state_dir, "knn_winners")) \
        .drop("cell")

    assignments = dec.assign(addresses, pip_w, knn_w, buildings)
    assignments = assignments.persist()
    assignments.count()
    sets = dec.output_sets(assignments, buildings)
    points = tiling.tile_points(assignments, buildings)
    tm = tiling.tile_map(points, budget=budget, level=meta["level"])
    tiles = tiling.assign_tiles(points, budget=budget,
                                level=meta["level"], tm=tm)
    return assignments, sets, tiles, tm
