"""Round-5 review finding: dedup cache lifetime must belong to the
invocation's RESULT, not to "whoever calls next".  The retired scheme
(each entry point release_caches()-ing the previous invocation's
handles) meant interleaved calls silently unpersisted each other's
still-unconsumed intermediates — p1 = dedupe(batch1); p2 =
dedupe(batch2); p1.count() re-ran batch1's whole shingle→band→verify
pipeline per consumer.  The fix ties each invocation's caches to its
returned DataFrame with a weakref finalizer: caches live exactly as
long as the result does.
"""

from __future__ import annotations

import gc

from pyspark import StorageLevel

from mergeaddressesandbuildings_spark.operators import doc_dedupe


def _docs(spark, offset):
    rows = []
    for i in range(40):
        text = " ".join(f"w{offset}x{i}y{j}" for j in range(6))
        rows.append((offset + 2 * i, text))
        rows.append((offset + 2 * i + 1, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _live_caches():
    return [
        c for c in doc_dedupe._CACHES
        if c.storageLevel != StorageLevel.NONE
    ]


def test_interleaved_invocations_keep_both_cache_sets(spark):
    doc_dedupe.release_caches()
    p1 = doc_dedupe.minhash_lsh_dedupe(_docs(spark, 0))
    n_after_first = len(_live_caches())
    assert n_after_first > 0  # cands + restricted shingle slice
    p2 = doc_dedupe.minhash_lsh_dedupe(_docs(spark, 1000))
    # the second invocation must NOT have released the first's caches
    assert len(_live_caches()) == 2 * n_after_first
    # both results still collect correctly with their caches intact
    assert p1.count() == 40
    assert p2.count() == 40
    del p1
    gc.collect()
    # dropping p1 released exactly its own slice
    assert len(_live_caches()) == n_after_first
    del p2
    gc.collect()
    assert len(_live_caches()) == 0
    assert doc_dedupe._CACHES == []


def test_explicit_release_still_works(spark):
    p = doc_dedupe.minhash_lsh_dedupe(_docs(spark, 5000))
    assert len(_live_caches()) > 0
    doc_dedupe.release_caches()
    assert doc_dedupe._CACHES == []
    # result is still correct after an explicit release (recompute)
    assert p.count() == 40
    del p
    gc.collect()  # finalizer on empty/foreign slice must be harmless
