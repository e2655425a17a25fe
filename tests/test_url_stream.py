"""Streaming URL latest-capture-wins (streaming/url_stream.py):
cross-microbatch winner updates, stale late arrivals must not regress
the winner, messy URL variants must collapse to one canonical key, and
the final stream state must equal the batch group-by over the full
capture log."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import webpipe
from mergeaddressesandbuildings_spark.streaming import url_stream

_SCHEMA = "url string, warc_ts long, doc_id long"


def _drop(spark, src_dir: str, rows) -> None:
    spark.createDataFrame(rows, _SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src_dir)


def _run(stream, name: str) -> None:
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()


def test_latest_capture_wins_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: /x captured twice via DIFFERENT messy variants (same
    # canonical), /y once
    _drop(spark, src, [
        ("HTTP://a.COM:80/x?b=2&a=1", 100, 1),
        ("http://A.com/x?a=1&utm_source=f&b=2", 200, 2),
        ("http://a.com/y", 150, 3),
    ])
    # batch 2: newer capture of /x (winner must update) + STALE late
    # arrival for /y (winner must NOT regress)
    _drop(spark, src, [
        ("http://a.com/x?a=1&b=2", 300, 4),
        ("http://a.com/y", 50, 5),
    ])

    captures = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    _run(url_stream.stream_url_latest(captures), "url_latest")

    rows = spark.sql("select * from url_latest").collect()
    # final update per key = the one with the highest running count
    final = {}
    for r in rows:
        cur = final.get(r["canonical_url"])
        if cur is None or r["n_captures_so_far"] > cur["n_captures_so_far"]:
            final[r["canonical_url"]] = r

    x = final["http://a.com/x?a=1&b=2"]
    assert (x["winner_doc_id"], x["winner_ts"], x["n_captures_so_far"]) == (4, 300, 3)
    y = final["http://a.com/y"]
    # stale batch-2 capture counted but did not steal the win
    assert (y["winner_doc_id"], y["winner_ts"], y["n_captures_so_far"]) == (3, 150, 2)

    # replay determinism: final state == batch group-by over the log
    log = spark.read.schema(_SCHEMA).parquet(src)
    batch = (
        log.select(webpipe.canonical_url(F.col("url")).alias("canonical_url"),
                   "warc_ts", "doc_id")
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n"),
             # min over (-ts, doc_id) = max ts, ties to lowest doc_id
             F.min_by(F.struct("doc_id", "warc_ts"),
                      F.struct((-F.col("warc_ts")).alias("nts"),
                               F.col("doc_id"))).alias("w"))
    )
    want = {r["canonical_url"]: (r["w"]["doc_id"], r["w"]["warc_ts"], r["n"])
            for r in batch.collect()}
    got = {k: (v["winner_doc_id"], v["winner_ts"], v["n_captures_so_far"])
           for k, v in final.items()}
    assert got == want


def test_ties_break_to_lowest_doc_id(spark, tmp_path):
    src = str(tmp_path / "src")
    _drop(spark, src, [("http://a.com/t", 100, 7),
                       ("http://a.com/t", 100, 2),
                       ("http://a.com/t", 99, 1)])
    captures = spark.readStream.schema(_SCHEMA).parquet(src)
    _run(url_stream.stream_url_latest(captures), "url_tie")
    r = spark.sql("select * from url_tie").collect()
    assert len(r) == 1
    assert (r[0]["winner_doc_id"], r[0]["winner_ts"],
            r[0]["n_captures_so_far"]) == (2, 100, 3)


def test_malformed_captures_dropped_not_poisonous(spark, tmp_path):
    """Null url/ts/doc_id rows are dropped JVM-side before the state
    worker — one bad capture must not kill the stream."""
    src = str(tmp_path / "src")
    _drop(spark, src, [
        (None, 100, 1),                  # null url
        ("http://a.com/x", None, 2),     # null ts
        ("http://a.com/x", 300, None),   # null doc id
        ("http://a.com/x", 200, 4),      # the only well-formed capture
    ])
    captures = spark.readStream.schema(_SCHEMA).parquet(src)
    _run(url_stream.stream_url_latest(captures), "url_latest_nulls")
    rows = spark.sql("select * from url_latest_nulls").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["canonical_url"], r["winner_doc_id"], r["winner_ts"],
            r["n_captures_so_far"]) == ("http://a.com/x", 4, 200, 1)
