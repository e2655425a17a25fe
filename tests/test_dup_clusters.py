"""Connected components over near-dup pairs (doc_dedupe.dup_clusters):
hash-min label propagation must converge across multi-hop chains and
keep distinct components apart."""

from __future__ import annotations

from mergeaddressesandbuildings_spark.operators import doc_dedupe


def _clusters(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = doc_dedupe.dup_clusters(pairs).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_chain_and_separate_components(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_needs_many_rounds(spark):
    """A 120-node path: plain one-hop propagation would need 119 rounds
    (> max_iters=50), so full convergence here PROVES the path-halving
    pointer jump contracts chains geometrically."""
    edges = [(i, i + 1) for i in range(100, 219)]
    got = _clusters(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 120


def test_direction_agnostic(spark):
    """(a,b) vs (b,a) must produce the same components."""
    a = _clusters(spark, [(5, 2), (2, 9), (7, 9)])
    b = _clusters(spark, [(2, 5), (9, 2), (9, 7)])
    assert a == b == {2: 2, 5: 2, 7: 2, 9: 2}


def test_scratch_dir_cleanup_and_nonconvergence(spark, tmp_path):
    """Round-3 advisor: dup_clusters takes a scratch_dir (shared-FS
    path on a cluster), removes intermediates, and raises loudly on
    non-convergence instead of returning a partial clustering."""
    import os

    import pytest

    from pyspark.sql import functions as F

    scratch = str(tmp_path / "cc")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = doc_dedupe.dup_clusters(pairs, scratch_dir=scratch)
    assert {r["cluster_id"] for r in out.collect()} == {1}
    # all state under <scratch>/run; edges + superseded rounds deleted,
    # exactly the final round remains
    left = sorted(os.listdir(os.path.join(scratch, "run")))
    assert len(left) == 1 and left[0].startswith("labels_")

    # reusing the same scratch_dir wipes the previous run entirely —
    # no stale rounds accumulate call-over-call
    out2 = doc_dedupe.dup_clusters(pairs, scratch_dir=scratch)
    assert {r["cluster_id"] for r in out2.collect()} == {1}
    left2 = sorted(os.listdir(os.path.join(scratch, "run")))
    assert len(left2) == 1 and left2[0].startswith("labels_")

    # an empty pair graph is trivially converged (sum over 0 rows is
    # NULL, not 0 — must not be read as "changed")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    got = doc_dedupe.dup_clusters(empty, scratch_dir=str(tmp_path / "cc0"))
    assert got.count() == 0

    # a 2^6-node chain cannot converge in 2 rounds even with halving
    edges = [(i, i + 1) for i in range(64)]
    big = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        doc_dedupe.dup_clusters(big, max_iters=2,
                                scratch_dir=str(tmp_path / "cc2"))


def test_zero_rounds_requested_is_identity(spark, tmp_path):
    """max_iters=0 must return the initial (identity) labels and stay
    readable after the edges barrier is deleted — the zero-round
    lineage previously pointed at the removed edges parquet."""
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = doc_dedupe.dup_clusters(pairs, max_iters=0,
                                  scratch_dir=str(tmp_path / "cc0"))
    assert {r["doc_id"]: r["cluster_id"] for r in out.collect()} == {1: 1, 2: 2}
