"""Incremental merge (plans/incremental.py): splicing a url-keyed page
delta into snapshot state must be EXACTLY equivalent to a full rebuild
over the post-delta corpus — same assignment fingerprint, same output
sets, same tile membership — while recomputing only the affected-cell
closure (asserted: the sub-run touches a strict subset of addresses).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import cells_sql
from mergeaddressesandbuildings_spark.plans import incremental as inc
from mergeaddressesandbuildings_spark.sources import pages as pg
from mergeaddressesandbuildings_spark.sources import snapshots as snap

N_PAGES = 140
# level 15 (~1.2 km × 600 m cells) instead of the default 12 (~10 km):
# the fixture county spans only a handful of level-12 cells, so a
# closure there covers everything and scope-boundedness would be
# unmeasurable; 15 still satisfies the §8.5 invariant
# (min_cell_width_m(15, 80°) = 212 m ≥ the 100 m kNN cutoff).
LEVEL = 15
MODIFIED = [5, 17, 29, 41, 53]
DELETED = [61, 73]
ADDED = list(range(N_PAGES, N_PAGES + 10))
DONOR_OFFSET = 10_000  # modified pages take content from far-away donors


def _url(i: int) -> str:
    return f"https://fixture.test/greenville/{i:08d}"


def _delta_pdf() -> pd.DataFrame:
    """The change set: modified urls carry a donor page's FULL content
    relabeled to the target url (content moved → old cells vacated,
    new cells populated), deletions are tombstone rows, additions are
    brand-new urls."""
    mod = pg.gen_pages_pdf([i + DONOR_OFFSET for i in MODIFIED])
    donor_to_target = {_url(i + DONOR_OFFSET): _url(i) for i in MODIFIED}
    mod["url"] = mod["url"].map(donor_to_target)
    add = pg.gen_pages_pdf(ADDED)
    upserts = pd.concat([mod, add], ignore_index=True)
    upserts["deleted"] = False
    tombs = pd.DataFrame({
        "url": [_url(i) for i in DELETED],
        "warc_ts": pd.Timestamp("2030-01-01"),
        "html": [b""] * len(DELETED),
        "text": [""] * len(DELETED),
        "lang": ["en"] * len(DELETED),
        "deleted": True,
    })
    return pd.concat([upserts, tombs], ignore_index=True)


def _pages_v2_pdf() -> pd.DataFrame:
    """The post-delta corpus, built independently of the engine."""
    keep = [i for i in range(N_PAGES)
            if i not in set(MODIFIED) | set(DELETED)]
    v1_kept = pg.gen_pages_pdf(keep)
    delta = _delta_pdf()
    ups = delta[~delta["deleted"]].drop(columns=["deleted"])
    return pd.concat([v1_kept, ups], ignore_index=True)


def _fingerprint(assignments, tile_map):
    tx, ty = cells_sql.xy_expr(F.col("lat"), F.col("lon"),
                               config.MAX_CELL_LEVEL)
    flat = (assignments.withColumn("_x", tx).withColumn("_y", ty)
            .join(tile_map, ["_x", "_y"]))
    row = flat.groupBy().agg(
        F.expr("bit_xor(xxhash64(addr_id, coalesce(building_id, -1), "
               "method, decision, tile))").alias("fp"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(row["fp"]), int(row["n"])


def _sets_rows(sets):
    return sorted(tuple(r) for r in sets.collect())


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    state_dir = os.path.join(str(root), "state")
    pages_v1 = pg.pages_df(spark, N_PAGES)
    existing = pg.existing_osm_df(spark, N_PAGES)
    inc.full_build(spark, pages_v1, existing, state_dir, level=LEVEL)
    delta = spark.createDataFrame(_delta_pdf())
    metrics = inc.apply_delta(spark, delta, state_dir)
    return state_dir, metrics, existing, str(root)


def test_delta_scope_is_bounded(state):
    _, m, _, _ = state
    assert m["n_changed_urls"] == len(MODIFIED) + len(DELETED) + len(ADDED)
    assert m["n_new_records"] > 0
    assert m["n_old_records"] > 0
    # the whole point: the spatial join re-ran over a small closure,
    # not the corpus
    assert 0 < m["n_affected_addresses"] < m["n_addresses_total"]
    assert m["affected_fraction"] < 0.6


def test_incremental_equals_full_rebuild(spark, state):
    state_dir, _, existing, root = state
    a_inc, sets_inc, _, tm_inc = inc.current_outputs(spark, state_dir)
    fp_inc, n_inc = _fingerprint(a_inc, tm_inc)

    full_dir = os.path.join(root, "state_full")
    pages_v2 = spark.createDataFrame(_pages_v2_pdf())
    inc.full_build(spark, pages_v2, existing, full_dir, level=LEVEL)
    a_full, sets_full, _, tm_full = inc.current_outputs(spark, full_dir)
    fp_full, n_full = _fingerprint(a_full, tm_full)

    assert n_inc == n_full
    assert fp_inc == fp_full
    assert _sets_rows(sets_inc) == _sets_rows(sets_full)
    a_inc.unpersist()
    a_full.unpersist()


def test_incremental_matches_run_merge(spark, state):
    """Tie the incremental path to the flagship plan: run_merge over
    the post-delta corpus yields the same fingerprint."""
    from mergeaddressesandbuildings_spark.plans.merge import run_merge

    state_dir, _, existing, _ = state
    a_inc, _, _, tm_inc = inc.current_outputs(spark, state_dir)
    fp_inc, n_inc = _fingerprint(a_inc, tm_inc)

    pages_v2 = spark.createDataFrame(_pages_v2_pdf())
    res = run_merge(spark, pages_v2, existing, level=LEVEL)
    fp_rm, n_rm = _fingerprint(res.assignments, res.tile_map)

    assert (fp_inc, n_inc) == (fp_rm, n_rm)
    a_inc.unpersist()


def test_deleted_url_rows_are_gone(spark, state):
    state_dir, _, _, _ = state
    for tbl in ("records", "addresses", "buildings"):
        df = snap.read_snapshot(spark, os.path.join(state_dir, tbl))
        gone = df.filter(F.col("url").isin([_url(i) for i in DELETED]))
        assert gone.count() == 0, tbl


def test_second_delta_stays_exact(spark, state, tmp_path):
    """Chained absorption: a SECOND delta applied to already-spliced
    state (whose files now mix clustered originals with rewrite
    commits) must still match a from-scratch rebuild exactly."""
    state_dir, _, existing, root = state
    import shutil

    chain_dir = os.path.join(str(tmp_path), "state_chain")
    shutil.copytree(state_dir, chain_dir)
    # a cp'd snapshot table still references the ORIGINAL's data files
    # (snapshots.py RELOCATION WARNING) — repoint the copy at its own
    # tree so this test models the supported relocation pattern
    for tbl in inc._TABLES:
        tdir = os.path.join(chain_dir, tbl)
        if snap.current_snapshot_id(tdir) is not None:
            assert snap.relocate(tdir, state_dir, chain_dir) > 0

    add2 = pg.gen_pages_pdf(range(N_PAGES + 50, N_PAGES + 60))
    add2["deleted"] = False
    tomb2 = pd.DataFrame({
        "url": [_url(ADDED[0]), _url(MODIFIED[0])],  # delete delta-1 rows
        "warc_ts": pd.Timestamp("2031-01-01"),
        "html": [b""] * 2, "text": [""] * 2, "lang": ["en"] * 2,
        "deleted": True,
    })
    delta2 = pd.concat([add2, tomb2], ignore_index=True)
    inc.apply_delta(spark, spark.createDataFrame(delta2), chain_dir)
    a_inc, _, _, tm_inc = inc.current_outputs(spark, chain_dir)
    fp_inc, n_inc = _fingerprint(a_inc, tm_inc)

    # v3 corpus = v2 minus the two newly deleted urls plus the ten new
    v2 = _pages_v2_pdf()
    v3 = pd.concat(
        [v2[~v2["url"].isin([_url(ADDED[0]), _url(MODIFIED[0])])],
         add2.drop(columns=["deleted"])], ignore_index=True)
    full_dir = os.path.join(str(tmp_path), "state_full3")
    inc.full_build(spark, spark.createDataFrame(v3), existing, full_dir,
                   level=LEVEL)
    a_full, _, _, tm_full = inc.current_outputs(spark, full_dir)
    fp_full, n_full = _fingerprint(a_full, tm_full)

    assert (fp_inc, n_inc) == (fp_full, n_full)
    a_inc.unpersist()
    a_full.unpersist()


def test_splice_plan_shape(spark, state):
    """The splice paths' scale discipline: localized key sets plan as
    LocalTableScan and their joins against state tables BROADCAST (no
    corpus shuffle to probe a delta-sized key set)."""
    state_dir, _, _, _ = state
    local = inc._localize(
        spark.createDataFrame([(1,), (2,)], "cell long"))
    plan = local._jdf.queryExecution().executedPlan().toString()
    # collected rows plan as a leaf scan with no upstream lineage
    # (PySpark renders driver-local data as an ExistingRDD scan)
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert "Exchange" not in plan

    addresses = snap.read_snapshot(spark,
                                   os.path.join(state_dir, "addresses"))
    semi = addresses.join(local, "cell", "left_semi")
    semi.collect()  # run THIS query execution so AQE finalizes it
    splan = semi._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" then "== Initial Plan ==" (the
    # pre-adaptive SMJ) — judge the final section only
    final = splan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    # and the whole closure-slice plan stays JVM-side (no Python eval)
    assert "PythonUDF" not in final


def test_localize_cap_falls_back(spark):
    df = spark.range(0, 50).selectExpr("id as cell")
    out = inc._localize(df, cap=10)
    assert out is df  # above cap: the distributed frame comes back
    small = inc._localize(df, cap=100)
    splan = small._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in splan or "LocalTableScan" in splan
    assert small.count() == 50


def test_records_table_commit_is_file_level(state):
    """The records splice must be copy-on-write: the new snapshot
    keeps at least one untouched v1 data file by reference."""
    state_dir, _, _, _ = state
    log = snap.snapshot_log(os.path.join(state_dir, "records"))
    assert [e["operation"] for e in log] == ["overwrite", "replace"]
    cur = snap.current_snapshot_id(os.path.join(state_dir, "records"))
    m = snap._load_manifest(os.path.join(state_dir, "records"), cur)
    assert m["n_kept_files"] >= 1
    assert m["n_rewritten_files"] >= 1
