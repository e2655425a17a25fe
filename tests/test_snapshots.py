"""Snapshot table layer (sources/snapshots.py): append/overwrite
chains, time travel, incremental changes-reads, commit atomicity
(orphan files invisible), schema freeze, concurrent-writer guard."""

from __future__ import annotations

import json
import os

import pytest

from mergeaddressesandbuildings_spark.sources import snapshots as S


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def test_append_chain_and_time_travel(spark, tdir):
    a = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    b = spark.createDataFrame([(3, "c")], ["id", "v"])
    m1 = S.write_snapshot(a, tdir)
    m2 = S.write_snapshot(b, tdir)
    assert (m1["snapshot_id"], m2["snapshot_id"]) == (1, 2)
    assert m2["parent_id"] == 1 and m2["n_rows"] == 3
    assert rows_of(S.read_snapshot(spark, tdir)) == \
        [(1, "a"), (2, "b"), (3, "c")]
    assert rows_of(S.read_snapshot(spark, tdir, snapshot_id=1)) == \
        [(1, "a"), (2, "b")]


def test_overwrite_keeps_history(spark, tdir):
    S.write_snapshot(spark.createDataFrame([(1,)], ["id"]), tdir)
    S.write_snapshot(spark.createDataFrame([(9,)], ["id"]),
                     tdir, mode="overwrite")
    assert rows_of(S.read_snapshot(spark, tdir)) == [(9,)]
    assert rows_of(S.read_snapshot(spark, tdir, 1)) == [(1,)]
    log = S.snapshot_log(tdir)
    assert [e["operation"] for e in log] == ["append", "overwrite"]
    assert [e["n_rows"] for e in log] == [1, 1]


def test_read_changes_incremental(spark, tdir):
    for i in range(3):
        S.write_snapshot(
            spark.createDataFrame([(i * 10 + j,) for j in range(2)],
                                  ["id"]), tdir)
    assert rows_of(S.read_changes(spark, tdir, 1, 3)) == \
        [(10,), (11,), (20,), (21,)]
    assert S.read_changes(spark, tdir, 2, 2).count() == 0
    S.write_snapshot(spark.createDataFrame([(99,)], ["id"]),
                     tdir, mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        S.read_changes(spark, tdir, 1, 4)


def test_orphan_files_invisible_and_retry_clean(spark, tdir):
    S.write_snapshot(spark.createDataFrame([(1,)], ["id"]), tdir)
    # simulate a crashed half-commit: data written, no manifest swap
    crash_dir = os.path.join(tdir, "data", "s2-deadbeef")
    spark.createDataFrame([(666,)], ["id"]).write.parquet(crash_dir)
    assert rows_of(S.read_snapshot(spark, tdir)) == [(1,)]
    # the retry commits cleanly into its own attempt dir and the
    # orphan rows stay invisible forever
    S.write_snapshot(spark.createDataFrame([(2,)], ["id"]), tdir)
    assert rows_of(S.read_snapshot(spark, tdir)) == [(1,), (2,)]


def test_concurrent_writer_guard(spark, tdir):
    S.write_snapshot(spark.createDataFrame([(1,)], ["id"]), tdir)
    # a racing writer already committed manifest 2
    with open(os.path.join(tdir, "snap", "2.json"), "w") as f:
        json.dump({}, f)
    with pytest.raises(RuntimeError, match="concurrent writer"):
        S.write_snapshot(spark.createDataFrame([(2,)], ["id"]), tdir)


def test_missing_snapshot_errors(spark, tdir):
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, tdir)
    S.write_snapshot(spark.createDataFrame([(1,)], ["id"]), tdir)
    with pytest.raises(FileNotFoundError, match="snapshot 7"):
        S.read_snapshot(spark, tdir, 7)


def test_schema_frozen_per_snapshot(spark, tdir):
    S.write_snapshot(spark.createDataFrame([(1, "x")], ["id", "v"]), tdir)
    m = S._load_manifest(tdir, 1)
    names = [f["name"] for f in m["schema"]["fields"]]
    assert names == ["id", "v"]


# -------------------------------------------------------- merge_upsert


def _seed(spark, tdir):
    """Two appends with disjoint key ranges -> two file groups."""
    S.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), tdir)
    S.write_snapshot(
        spark.createDataFrame([(10, "x"), (11, "y")], ["id", "v"]), tdir)


def test_merge_upsert_semantics(spark, tdir):
    _seed(spark, tdir)
    ch = spark.createDataFrame(
        [(2, "B!", False),    # update
         (99, "new", False),  # insert
         (10, None, True),    # delete
         (555, None, True)],  # delete of absent key: no-op
        "id bigint, v string, is_del boolean")
    m = S.merge_upsert(ch, tdir, ["id"], delete_col="is_del")
    assert m["operation"] == "merge" and m["n_rows"] == 4
    assert rows_of(S.read_snapshot(spark, tdir)) == \
        [(1, "a"), (2, "B!"), (11, "y"), (99, "new")]
    # time travel across the merge still sees the old state
    assert rows_of(S.read_snapshot(spark, tdir, 2)) == \
        [(1, "a"), (2, "b"), (10, "x"), (11, "y")]


def test_merge_upsert_rewrites_only_affected_files(spark, tdir):
    _seed(spark, tdir)
    before = S._load_manifest(tdir, 2)
    # snapshot 1's files hold ids {1,2}; touch only id 10 (snapshot 2's)
    ch = spark.createDataFrame([(10, "X")], ["id", "v"])
    m = S.merge_upsert(ch, tdir, ["id"])
    s1_files = set(S._load_manifest(tdir, 1)["files"])
    assert s1_files <= set(m["files"])          # untouched: by reference
    # granularity is per FILE, not per commit: of snapshot 2's part
    # files only the one(s) containing id 10 get rewritten
    kept_old = set(before["files"]) & set(m["files"])
    assert m["n_rewritten_files"] == \
        len(before["files"]) - len(kept_old) >= 1
    assert m["n_kept_files"] == len(kept_old)
    rewritten_rows = spark.read.parquet(
        *(set(before["files"]) - kept_old)).collect()
    assert any(r["id"] == 10 for r in rewritten_rows)
    assert rows_of(S.read_snapshot(spark, tdir)) == \
        [(1, "a"), (2, "b"), (10, "X"), (11, "y")]


def test_merge_upsert_insert_only_touches_nothing(spark, tdir):
    _seed(spark, tdir)
    m = S.merge_upsert(
        spark.createDataFrame([(50, "q")], ["id", "v"]), tdir, ["id"])
    assert m["n_rewritten_files"] == 0 and m["n_rows"] == 5


def test_merge_upsert_guards(spark, tdir):
    _seed(spark, tdir)
    with pytest.raises(ValueError, match="duplicate keys"):
        S.merge_upsert(
            spark.createDataFrame([(1, "p"), (1, "q")], ["id", "v"]),
            tdir, ["id"])
    with pytest.raises(ValueError, match="columns"):
        S.merge_upsert(
            spark.createDataFrame([(1,)], ["id"]), tdir, ["id"])
    with pytest.raises(FileNotFoundError):
        S.merge_upsert(
            spark.createDataFrame([(1, "a")], ["id", "v"]),
            str(tdir) + "_absent", ["id"])


def test_read_changes_rejects_merge(spark, tdir):
    _seed(spark, tdir)
    S.merge_upsert(spark.createDataFrame([(1, "z")], ["id", "v"]),
                   tdir, ["id"])
    with pytest.raises(ValueError, match="append-only"):
        S.read_changes(spark, tdir, 1, 3)


# ------------------------------------------- compaction + expiry


def test_compact_preserves_rows_and_prunes_files(spark, tdir):
    for i in range(4):  # 4 tiny appends -> many small files
        S.write_snapshot(
            spark.createDataFrame([(i * 10 + j, f"v{i}{j}")
                                   for j in range(3)], ["id", "v"]),
            tdir)
    before = rows_of(S.read_snapshot(spark, tdir))
    pm = S._load_manifest(tdir, 4)
    m = S.compact_files(spark, tdir, small_file_bytes=32 << 20)
    assert m["operation"] == "compact"
    assert m["n_compacted_files"] == len(pm["files"])
    assert len(m["files"]) < len(pm["files"])
    assert m["n_rows"] == pm["n_rows"]
    assert rows_of(S.read_snapshot(spark, tdir)) == before
    # history before the compaction still readable
    assert len(rows_of(S.read_snapshot(spark, tdir, 2))) == 6


def test_compact_skips_big_files(spark, tdir):
    S.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), tdir)
    m = S.compact_files(spark, tdir, small_file_bytes=1)  # all "big"
    assert m["snapshot_id"] == 1  # no-op: parent manifest returned


def test_expire_snapshots_reclaims_unreferenced_files(spark, tdir):
    S.write_snapshot(
        spark.createDataFrame([(1, "a")], ["id", "v"]), tdir)
    S.write_snapshot(
        spark.createDataFrame([(1, "A2")], ["id", "v"]),
        tdir, mode="overwrite")
    S.write_snapshot(
        spark.createDataFrame([(2, "b")], ["id", "v"]), tdir)
    s1_files = S._load_manifest(tdir, 1)["files"]
    r = S.expire_snapshots(tdir, keep_last=2)
    assert r["expired_snapshot_ids"] == [1]
    # snapshot 1's files are unreferenced by 2/3 -> deleted from disk
    assert r["n_deleted_files"] == len(s1_files)
    assert not any(os.path.exists(f) for f in s1_files)
    # retained chain intact, current readable, expired id errors cleanly
    assert rows_of(S.read_snapshot(spark, tdir)) == [(1, "A2"), (2, "b")]
    assert rows_of(S.read_snapshot(spark, tdir, 2)) == [(1, "A2")]
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, tdir, 1)
    assert [e["snapshot_id"] for e in S.snapshot_log(tdir)] == [2, 3]


def test_expire_keeps_files_still_referenced(spark, tdir):
    # append chain: snapshot 3 references snapshots 1-3's files, so
    # expiring 1 and 2 must delete NOTHING
    for i in range(3):
        S.write_snapshot(
            spark.createDataFrame([(i, "x")], ["id", "v"]), tdir)
    r = S.expire_snapshots(tdir, keep_last=1)
    assert r["expired_snapshot_ids"] == [1, 2]
    assert r["n_deleted_files"] == 0
    assert rows_of(S.read_snapshot(spark, tdir)) == \
        [(0, "x"), (1, "x"), (2, "x")]


def test_expire_guard(spark, tdir):
    S.write_snapshot(spark.createDataFrame([(1, "a")], ["id", "v"]),
                     tdir)
    with pytest.raises(ValueError):
        S.expire_snapshots(tdir, keep_last=0)


# ------------------------------------- clustering-contract survival


def test_cluster_by_survives_maintenance(spark, tdir):
    """The manifest's cluster_by contract (write_snapshot docstring)
    must survive replace_keys rewrites and compact_files, files must
    come out locally SORTED by the cluster columns (parquet encoding),
    and compaction must not collapse a multi-MB table below the
    session's scan parallelism (the measured 4x winner-recompute
    slowdown: floor-less bin-packing left 5 unsplittable files, so
    every pre-shuffle map stage ran ~serial)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # ~400k rows with an incompressible payload -> a table big enough
    # (>#cores MiB) for the parallelism floor to be observable
    df = (spark.range(400_000)
          .withColumn("url", F.concat(F.lit("u"),
                                      (F.col("id") % 1000).cast("string")))
          .withColumn("payload", F.sha2(F.col("id").cast("string"), 256)))
    m0 = S.write_snapshot(df.repartition(8, "url"), tdir,
                          mode="overwrite", cluster_by=["url"])
    assert m0["cluster_by"] == {"cols": ["url"], "kind": "hash"}

    # keyed splice: contract carried, rewrite locally sorted
    keys = spark.createDataFrame([("u7",), ("u13",)], ["url"])
    ins = (spark.range(50)
           .withColumn("url", F.lit("u7"))
           .withColumn("payload", F.lit("x"))
           .select("id", "url", "payload"))
    m1 = S.replace_keys(spark, tdir, ["url"], keys, ins)
    assert m1["cluster_by"] == {"cols": ["url"], "kind": "hash"}

    before = S.read_snapshot(spark, tdir)
    n_before = before.count()
    m2 = S.compact_files(spark, tdir, small_file_bytes=512 << 20)
    assert m2["cluster_by"] == {"cols": ["url"], "kind": "hash"}
    assert S.read_snapshot(spark, tdir).count() == n_before

    # parallelism floor: a ~25 MB table must not collapse to 1-2 files
    dp = spark.sparkContext.defaultParallelism
    total_mb = sum(os.path.getsize(f) for f in m2["files"]) >> 20
    assert len(m2["files"]) >= min(dp, max(1, total_mb))

    # every compacted file is internally sorted by the cluster column
    # (what keeps RLE/dictionary pages long-run across maintenance)
    for f in m2["added_files"]:
        urls = pq.read_table(f, columns=["url"])["url"].to_pylist()
        assert urls == sorted(urls), f"unsorted cluster col in {f}"

    # hash clustering: each key maps to exactly one compacted file
    hits = {}
    for f in m2["added_files"]:
        for u in set(pq.read_table(f, columns=["url"])["url"].to_pylist()):
            hits.setdefault(u, set()).add(f)
    assert all(len(fs) == 1 for fs in hits.values()), \
        "a url hash bucket was split across compacted files"


def test_racing_commits_conflict_not_lost_update(spark, tdir):
    """Round-3 verdict task 7: two writers that both planned from the
    same parent must NOT both commit — the loser raises
    SnapshotConflictError at the exclusive manifest create, the
    winner's rows are intact, and the pointer never regresses."""
    S.write_snapshot(spark.createDataFrame([(1, "a")], ["id", "v"]), tdir)
    pm = S._load_manifest(tdir, 1)
    # two racing writers both compute sid=2 from parent=1; writer A
    # lands first through the public path
    a = spark.createDataFrame([(2, "A")], ["id", "v"])
    S.write_snapshot(a, tdir)
    # writer B raced: it already passed planning (sid computed before
    # A's commit) and now reaches the commit point with stale state
    files_b, n_b = S._write_data_dir(
        spark.createDataFrame([(3, "B")], ["id", "v"]), tdir, 2)
    with pytest.raises(S.SnapshotConflictError, match="concurrent"):
        S._commit(tdir, 2, 1, "append", pm["files"] + files_b, files_b,
                  pm["n_rows"] + n_b, n_b, pm["schema"])
    # lost-update impossibility: A's commit is the live state, B's
    # rows are invisible orphans
    assert S.current_snapshot_id(tdir) == 2
    assert rows_of(S.read_snapshot(spark, tdir)) == [(1, "a"), (2, "A")]


def test_stale_writer_cannot_regress_pointer(spark, tdir):
    """A writer whose snapshot id was freed by expiry must not move
    the pointer backwards: the expected-parent re-check fires."""
    for i in range(3):
        S.write_snapshot(spark.createDataFrame([(i,)], ["id"]), tdir)
    pm = S._load_manifest(tdir, 3)
    S.expire_snapshots(tdir, keep_last=1)  # frees manifests 1 and 2
    files, n = S._write_data_dir(
        spark.createDataFrame([(9,)], ["id"]), tdir, 2)
    with pytest.raises(S.SnapshotConflictError, match="parent"):
        S._commit(tdir, 2, 1, "append", files, files, n, n, pm["schema"])
    assert S.current_snapshot_id(tdir) == 3
    # the conflicted manifest was rolled back, not left blocking id 2
    assert not os.path.exists(os.path.join(tdir, "snap", "2.json"))


def test_replace_keys_prunes_via_hash_buckets(spark, tdir):
    """ADVICE round 3 (medium): keyed splices must NOT scan the key
    column of every live file — hash-clustered tables prune via the
    manifest's per-file xxhash64 bucket sets, so commit I/O is
    O(delta + hit files)."""
    from pyspark.sql import functions as F

    df = (spark.range(4000)
          .withColumn("url", F.concat(F.lit("u"),
                                      (F.col("id") % 500).cast("string"))))
    m0 = S.write_snapshot(df.repartition(16, "url"), tdir,
                          mode="overwrite", cluster_by=["url"])
    assert len(m0["files"]) == 16
    assert all(f in m0["file_buckets"] for f in m0["files"])

    keys = spark.createDataFrame([("u7",)], ["url"])
    ins = spark.createDataFrame([(999_999, "u7")], ["id", "url"])
    m1 = S.replace_keys(spark, tdir, ["url"], keys, ins)
    # one key -> one bucket -> at most a couple of candidate files;
    # the rest were pruned from the scan entirely
    assert m1["n_pruned_files"] >= 13, m1["n_pruned_files"]
    assert m1["n_rewritten_files"] >= 1
    got = S.read_snapshot(spark, tdir)
    assert got.filter("url = 'u7'").count() == 1
    assert got.count() == 4000 - 8 + 1  # 8 old u7 rows replaced by 1


def test_merge_upsert_prunes_via_range_stats(spark, tdir):
    """Range-clustered tables prune keyed merges via the manifest's
    footer min/max column bounds (precise bisect test under the
    key-collect cap)."""
    df = spark.range(10_000).withColumnRenamed("id", "cell") \
        .selectExpr("cell", "cast(cell * 2 as long) as v")
    m0 = S.write_snapshot(df.repartitionByRange(10, "cell"), tdir,
                          mode="overwrite", cluster_by=["cell"],
                          cluster_kind="range")
    assert any("cell" in s for s in m0["file_stats"].values())
    ch = spark.createDataFrame([(5, 999)], ["cell", "v"])
    m1 = S.merge_upsert(ch, tdir, ["cell"])
    # key 5 lives in exactly one range file; the other 9 pruned
    assert m1["n_pruned_files"] >= 8, m1["n_pruned_files"]
    assert m1["n_rewritten_files"] == 1
    got = S.read_snapshot(spark, tdir)
    assert rows_of(got.filter("cell = 5")) == [(5, 999)]
    assert got.count() == 10_000


def test_overwrite_dropping_cluster_contract_warns(spark, tdir):
    """ADVICE round 3: an overwrite that silently omits cluster_by
    while the parent declared one reintroduces layout rot — warn; an
    explicit cluster_by=[] drops it silently."""
    df = spark.createDataFrame([(1, "u1")], ["id", "url"])
    S.write_snapshot(df, tdir, mode="overwrite", cluster_by=["url"])
    with pytest.warns(UserWarning, match="cluster_by"):
        S.write_snapshot(df, tdir, mode="overwrite")
    # re-establish, then drop deliberately: no warning
    S.write_snapshot(df, tdir, mode="overwrite", cluster_by=["url"])
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error")
        m = S.write_snapshot(df, tdir, mode="overwrite", cluster_by=[])
    assert m["cluster_by"] is None


def test_compaction_reclusters_spliced_files(spark, tdir):
    """Splice outputs drift off the clustering contract; the manifest
    ledger marks them and compact_files re-clusters them even when
    they exceed small_file_bytes — then drains the ledger."""
    from pyspark.sql import functions as F

    df = (spark.range(2000)
          .withColumn("url", F.concat(F.lit("u"),
                                      (F.col("id") % 100).cast("string"))))
    S.write_snapshot(df.repartition(4, "url"), tdir,
                     mode="overwrite", cluster_by=["url"])
    keys = spark.createDataFrame([("u3",), ("u42",)], ["url"])
    ins = spark.createDataFrame([(7777, "u3")], ["id", "url"])
    m1 = S.replace_keys(spark, tdir, ["url"], keys, ins)
    assert m1["spliced_files"] == sorted(m1["added_files"])

    n = S.read_snapshot(spark, tdir).count()
    # threshold of 1 byte: nothing qualifies as "small", so ONLY the
    # spliced ledger forces the rewrite
    m2 = S.compact_files(spark, tdir, small_file_bytes=1)
    assert m2["operation"] == "compact"
    assert m2["n_recl_spliced_files"] == len(m1["spliced_files"])
    assert m2["spliced_files"] == []  # ledger drained
    assert S.read_snapshot(spark, tdir).count() == n
    # re-clustered outputs honor the contract again: one file per key
    import pyarrow.parquet as pq

    hits = {}
    for f in m2["added_files"]:
        for u in set(pq.read_table(f, columns=["url"])["url"].to_pylist()):
            hits.setdefault(u, set()).add(f)
    spliced_urls = {u for f in m1["added_files"]
                    for u in pq.read_table(f, columns=["url"])["url"].to_pylist()}
    assert all(len(fs) == 1 for u, fs in hits.items() if u in spliced_urls)
