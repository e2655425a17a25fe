"""ST6 streaming document dedup: cross-microbatch exact dedup with
keyed state — duplicates arriving in LATER microbatches must be caught
(the part a per-batch dropDuplicates cannot do), and the surviving doc
per content must be the deterministic lowest-doc_id winner."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark import schemas
from mergeaddressesandbuildings_spark.streaming import doc_stream


def _drop_docs(spark, src_dir: str, rows) -> None:
    df = spark.createDataFrame(
        [(i, t, "en", "fixture", len(t)) for i, t in rows],
        schema=schemas.DOCUMENTS,
    ).coalesce(1)
    df.write.mode("append").parquet(src_dir)


def _run(stream, name: str):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_cross_batch_dedupe(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: docs 1-3, content A appears twice (2 wins over 5 later)
    _drop_docs(spark, src, [(2, "content A"), (3, "content B"), (4, "content A")])
    # batch 2 (separate file): content A AGAIN + new content C
    _drop_docs(spark, src, [(5, "content A"), (6, "content C")])

    stream = doc_stream.stream_exact_dedupe(
        doc_stream.docs_stream(spark, src, max_files_per_trigger=1))
    _run(stream, "st6_dedupe")

    rows = spark.sql("select * from st6_dedupe").collect()
    firsts = [r for r in rows if r["is_first"]]
    # exactly one global first per distinct content
    assert sorted(r["doc_id"] for r in firsts) == [2, 3, 6]
    # the cross-batch duplicate (doc 5) was recognized as a dup:
    # content A's second appearance is NOT first and counts 2 dups total
    a_hash = [r["content_hash"] for r in firsts if r["doc_id"] == 2][0]
    later = [r for r in rows if r["content_hash"] == a_hash and not r["is_first"]]
    assert len(later) == 1 and later[0]["n_dups_so_far"] == 2

    # keep-is_first consumers see each content exactly once, matching
    # the batch dedup's winner rule (min doc_id per content)
    batch = (
        spark.read.schema(schemas.DOCUMENTS).parquet(src)
        .groupBy(F.xxhash64("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert sorted(r["doc_id"] for r in batch.collect()) == \
        sorted(r["doc_id"] for r in firsts)


def test_restart_resumes_state(spark, tmp_path):
    """With a checkpoint, a restarted query still knows batch-1 contents:
    a duplicate arriving after restart is not re-emitted as first.
    (foreachBatch sink — the memory sink does not support checkpoint
    recovery.)"""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        stream = doc_stream.stream_exact_dedupe(
            doc_stream.docs_stream(spark, src))

        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(out)

        q = (stream.writeStream.foreachBatch(sink)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    _drop_docs(spark, src, [(10, "seen once")])
    run_once()
    _drop_docs(spark, src, [(11, "seen once"), (12, "brand new")])
    run_once()

    rows = spark.read.parquet(out).collect()
    firsts = sorted(r["doc_id"] for r in rows if r["is_first"])
    assert firsts == [10, 12]  # doc 11 recognized as dup ACROSS restart
    dup = [r for r in rows if not r["is_first"]]
    assert len(dup) == 1 and dup[0]["n_dups_so_far"] == 1
