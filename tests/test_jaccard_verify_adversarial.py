"""Round-4 verdict task 2: jaccard_verify must be dup-cluster-skew
proof.  Adversarial fixture: ONE boilerplate template cluster of 5,000
candidate docs that all share a single hot shingle ("boiler plate").
The retired round-4 shape (shingle SELF-join, then a post-hoc semi-join
against the candidate pairs) pays hot_shingle_count^2 = 25M
intermediate rows on that one key before it can prune; the
pair-anchored shape pays |pairs| * avg_shingles regardless of how many
candidate docs share any shingle.  This test (a) re-implements the old
shape verbatim as the oracle and asserts the PAIR SET IS IDENTICAL,
and (b) asserts the expected exact-dup pairs are all present — so the
skew fix can never silently change semantics.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import doc_dedupe

N_PAIRS = 2500  # 5,000 docs, all sharing the hot "boiler plate" shingle


def _fixture(spark):
    """2*N_PAIRS docs: docs 2i and 2i+1 are exact duplicates (so every
    pair is an LSH candidate and a verified dup), every doc starts with
    the same boilerplate bigram, and all other words are unique per
    pair — cross-pair Jaccard is 1/17, far below threshold."""
    rows = []
    for i in range(N_PAIRS):
        text = "boiler plate " + " ".join(f"w{i}x{j}" for j in range(8))
        rows.append((2 * i, text))
        rows.append((2 * i + 1, text))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(16)


def _old_jaccard_verify(sh, pairs, threshold):
    """The round-4 shape, verbatim: candidate-restricted shingle
    SELF-join on `shingle`, pair restriction via left_semi AFTER the
    join (it cannot push below — the pair keys exist only post-join)."""
    docs_in_play = pairs.select(F.col("doc_a").alias("doc_id")).union(
        pairs.select("doc_b")
    ).distinct()
    sh_c = sh.join(docs_in_play, "doc_id").persist()
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    common = (
        sh_c.alias("x")
        .join(sh_c.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .join(pairs, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("jaccard", F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard"
    )


def test_pair_anchored_verify_matches_self_join_on_template_cluster(spark):
    docs = _fixture(spark)
    sh = doc_dedupe.shingles(docs, n=2)
    sigs = doc_dedupe.minhash_signatures(sh, hash="xxhash64")
    cands = doc_dedupe.lsh_candidate_pairs(sigs, band_key="hash").persist()
    n_cands = cands.count()
    assert n_cands >= N_PAIRS  # every exact-dup pair is a candidate

    t0 = time.monotonic()
    new_rows = sorted(
        tuple(r) for r in doc_dedupe.jaccard_verify(sh, cands, 0.6).collect()
    )
    new_s = time.monotonic() - t0
    t1 = time.monotonic()
    old_rows = sorted(
        tuple(r) for r in _old_jaccard_verify(sh, cands, 0.6).collect()
    )
    old_s = time.monotonic() - t1

    assert new_rows == old_rows
    # every seeded exact-dup pair survives with jaccard exactly 1.0
    got_pairs = {(a, b) for a, b, *_ in new_rows}
    for i in range(N_PAIRS):
        assert (2 * i, 2 * i + 1) in got_pairs
    exact = [r for r in new_rows if r[5] == 1.0]
    assert len(exact) >= N_PAIRS
    # record the walls in the pytest output for the bench log; no hard
    # timing assert (host variance), but the new shape must at minimum
    # complete the adversarial cluster — the old one only does because
    # 25M rows is still tractable at test scale.
    print(f"verify walls: pair-anchored={new_s:.1f}s self-join={old_s:.1f}s")
    cands.unpersist()
    doc_dedupe.release_caches()
