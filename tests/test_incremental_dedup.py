"""O(delta) incremental near-dup absorption
(doc_dedupe.incremental_near_dup): the incremental pairs must equal
the full-rebuild pairs restricted to pairs touching the delta, the
returned delta signatures must equal the batch signature pass (so the
maintained signature table stays exact), and a SECOND delta deduped
against the updated signature table must stay exact — the same
chained-absorption discipline plans/incremental.py proves for the
merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import doc_dedupe

_SCHEMA = "doc_id long, text string"

_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a completely different document about spark streaming state"),
    (3, "rain in spain falls mainly on the plain every single year"),
    (4, "the quick brown fox jumps over the lazy dog again and again ok"),
]
_DELTA1 = [
    # near-dup of corpus docs 1/4
    (101, "the quick brown fox jumps over the lazy dog again and again yes"),
    # delta-internal near-dup pair
    (102, "entirely novel content that resembles only its own delta twin here"),
    (103, "entirely novel content that resembles only its own delta twin too"),
    # unique
    (104, "nothing in this sentence overlaps with anything else at all"),
]
_DELTA2 = [
    # near-dup of a DELTA-1 doc — only findable through the updated
    # signature table
    (201, "entirely novel content that resembles only its own delta twin now"),
    (202, "and a second fully unique document closing out the fixture"),
]


def _pairset(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def _full_touching(spark, all_rows, delta_ids, threshold=0.5):
    docs = spark.createDataFrame(all_rows, _SCHEMA)
    full = doc_dedupe.minhash_lsh_dedupe(docs, n=2, threshold=threshold)
    ids = list(delta_ids)
    return _pairset(full.filter(F.col("doc_a").isin(ids)
                                | F.col("doc_b").isin(ids)))


def test_incremental_equals_full_restricted(spark):
    corpus = spark.createDataFrame(_CORPUS, _SCHEMA)
    delta = spark.createDataFrame(_DELTA1, _SCHEMA)
    corpus_sigs = doc_dedupe.minhash_signatures(doc_dedupe.shingles(corpus, 2))

    pairs, delta_sigs = doc_dedupe.incremental_near_dup(
        delta, corpus, corpus_sigs, n=2, threshold=0.5)
    got = _pairset(pairs)
    want = _full_touching(spark, _CORPUS + _DELTA1,
                          [d[0] for d in _DELTA1])
    assert got == want and got  # non-vacuous: 1-101, 4-101, 102-103 live here

    # signature maintenance is exact: returned sigs == batch pass
    batch_sigs = doc_dedupe.minhash_signatures(doc_dedupe.shingles(delta, 2))
    assert sorted((r["doc_id"], tuple(r["sig"])) for r in delta_sigs.collect()) \
        == sorted((r["doc_id"], tuple(r["sig"])) for r in batch_sigs.collect())


def test_chained_delta_stays_exact(spark, tmp_path):
    """Delta 2 against the delta-1-updated signature table (round-
    tripped through parquet, as a maintained snapshot table would be)
    == full rebuild restricted to delta-2 pairs."""
    corpus1 = spark.createDataFrame(_CORPUS, _SCHEMA)
    delta1 = spark.createDataFrame(_DELTA1, _SCHEMA)
    sigs1 = doc_dedupe.minhash_signatures(doc_dedupe.shingles(corpus1, 2))
    _, dsigs1 = doc_dedupe.incremental_near_dup(delta1, corpus1, sigs1,
                                                n=2, threshold=0.5)

    sig_dir = str(tmp_path / "sigs")
    sigs1.union(dsigs1).write.parquet(sig_dir)

    corpus2 = corpus1.union(delta1)
    delta2 = spark.createDataFrame(_DELTA2, _SCHEMA)
    pairs2, _ = doc_dedupe.incremental_near_dup(
        delta2, corpus2, spark.read.parquet(sig_dir), n=2, threshold=0.5)
    got = _pairset(pairs2)
    want = _full_touching(spark, _CORPUS + _DELTA1 + _DELTA2,
                          [d[0] for d in _DELTA2])
    assert got == want and got  # non-vacuous: 102/103-201 live here
