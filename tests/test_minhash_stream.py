"""ST9 streaming MinHash near-dup (streaming/minhash_stream.py):
row-expression signature parity with the batch aggregate, cross-batch
near-dup detection, batch-split invariance (stream's final pair set ==
batch LSH candidates however the corpus is microbatched), and the loud
bucket-state cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import doc_dedupe
from mergeaddressesandbuildings_spark.streaming import minhash_stream

_SCHEMA = "doc_id long, text string"

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a completely different document about spark streaming state"),
    (3, "rain in spain falls mainly on the plain every single year"),
]
# near-dup of doc 1: one appended token — most shingles shared
_NEAR = (101, "the quick brown fox jumps over the lazy dog again and again ok")
_UNIQ = (102, "nothing here resembles any earlier document in this corpus")


def _drop(spark, src_dir, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src_dir)


def _run(spark, src, name, **kw):
    stream = minhash_stream.stream_near_dup(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src),
        **kw,
    )
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def _pairs(df):
    return {
        (r["matched_doc_id"], r["doc_id"])
        for r in df.filter(F.col("matched_doc_id").isNotNull())
        .select("matched_doc_id", "doc_id").distinct().collect()
    }


@pytest.mark.parametrize("hash", ["xxhash64", "sha256"])
def test_signature_expr_parity(spark, hash):
    """Per-row signature == agg-over-shingles signature, both hash
    families; short docs (no n-grams) → NULL."""
    docs = spark.createDataFrame(_DOCS + [(9, "solo")], _SCHEMA)
    agg = doc_dedupe.minhash_signatures(
        doc_dedupe.shingles(docs, n=2), hash=hash)
    row = docs.select(
        "doc_id",
        doc_dedupe.minhash_signature_expr(
            F.col("text"), n=2, hash=hash).alias("sig"),
    )
    got = {r["doc_id"]: r["sig"] for r in row.collect()}
    want = {r["doc_id"]: r["sig"] for r in agg.collect()}
    assert got[9] is None  # agg path drops it via explode
    got.pop(9)
    assert got == want


def test_cross_batch_near_dup(spark, tmp_path):
    src = str(tmp_path / "src")
    _drop(spark, src, _DOCS)            # microbatch 1
    _drop(spark, src, [_NEAR, _UNIQ])   # microbatch 2

    out = _run(spark, src, "st9_cross")
    assert _pairs(out) == {(1, 101)}
    # the unique doc matched nothing in ANY band
    uniq = out.filter(F.col("doc_id") == _UNIQ[0])
    assert uniq.count() == doc_dedupe.N_BANDS
    assert uniq.filter(~F.col("is_first")).count() == 0


def test_batch_split_invariance_matches_batch_lsh(spark, tmp_path):
    """Stream over 1 batch vs 2 batches vs the batch operator: same
    final candidate-pair set."""
    rows = _DOCS + [_NEAR, _UNIQ,
                    (103, "a completely different document about flink streaming state")]
    one = str(tmp_path / "one")
    _drop(spark, one, rows)
    two = str(tmp_path / "two")
    _drop(spark, two, rows[:4])
    _drop(spark, two, rows[4:])

    p1 = _pairs(_run(spark, one, "st9_one"))
    p2 = _pairs(_run(spark, two, "st9_two"))

    docs = spark.createDataFrame(rows, _SCHEMA)
    batch = doc_dedupe.lsh_candidate_pairs(
        doc_dedupe.minhash_signatures(doc_dedupe.shingles(docs, n=2)))
    want = {(r["doc_a"], r["doc_b"]) for r in batch.collect()}
    assert p1 == p2 == want


@pytest.mark.parametrize("hash", ["xxhash64", "sha256"])
def test_batch_rowexpr_mode_bit_identical(spark, hash):
    """minhash_lsh_dedupe(sig_mode='rowexpr') — zero-shuffle signatures,
    candidate-only shingling — returns the exact same verified pairs as
    the agg formulation, short docs included."""
    rows = _DOCS + [_NEAR, _UNIQ, (7, "tiny")]
    docs = spark.createDataFrame(rows, _SCHEMA)
    agg = doc_dedupe.minhash_lsh_dedupe(docs, n=2, threshold=0.5, hash=hash)
    row = doc_dedupe.minhash_lsh_dedupe(docs, n=2, threshold=0.5, hash=hash,
                                        sig_mode="rowexpr")
    assert sorted(map(tuple, row.collect())) == \
        sorted(map(tuple, agg.collect()))


def test_bucket_overflow_is_loud(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    _drop(spark, src, [(i, _DOCS[0][1]) for i in range(5)])  # 5 identical
    with pytest.raises(StreamingQueryException, match="max_bucket"):
        _run(spark, src, "st9_cap", max_bucket=2)


@pytest.mark.parametrize("coarse", [None, 1, 8192])
def test_coarse_keying_bit_identical(spark, tmp_path, coarse):
    """Exact per-bucket keying, the degenerate 1-group coarse key, and
    the default coarse keying must produce the IDENTICAL output row set
    (not just the pair set): coarsening moves work between Python
    dispatches, never changes what a bucket sees or in what order."""
    rows = _DOCS + [_NEAR, _UNIQ,
                    (103, "a completely different document about flink streaming state")]
    src = str(tmp_path / f"src_{coarse}")
    _drop(spark, src, rows[:4])
    _drop(spark, src, rows[4:])
    out = _run(spark, src, f"st9_coarse_{coarse}", coarse_buckets=coarse)
    got = sorted(
        tuple(r) for r in out.select(
            "band_id", "band_hash", "doc_id", "matched_doc_id",
            "n_equal_slots", "is_first").collect()
    )
    if not hasattr(test_coarse_keying_bit_identical, "_ref"):
        test_coarse_keying_bit_identical._ref = got
    assert got == test_coarse_keying_bit_identical._ref
    assert len(got) > 0
