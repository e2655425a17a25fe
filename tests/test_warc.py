"""WARC container source (sources/warc.py): byte-exact payload
round-trip in plain and per-record-gzip layouts, multi-file parallel
read, record-type filtering, and WARC → pages parity against the
deterministic page fixture generator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.sources import pages, warc

_RECORDS = [
    {"url": "http://a.example.com/x", "ts": "2025-01-01T00:00:01Z",
     "html": b"<html><body>alpha \xe2\x9c\x93</body></html>"},
    {"url": "http://b.example.com/y", "ts": "2025-01-01T00:00:02Z",
     "html": b"bytes \x00\x01\xff here", "status": 404},
]


def _roundtrip(spark, tmp_path, gz):
    p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    assert warc.write_warc(p, _RECORDS, gzip_members=gz) == 2
    return {r["url"]: r for r in warc.read_warc(spark, p).collect()}


def test_roundtrip_plain_and_gzip(spark, tmp_path):
    for gz in (False, True):
        got = _roundtrip(spark, tmp_path, gz)
        assert set(got) == {r["url"] for r in _RECORDS}
        for r in _RECORDS:
            g = got[r["url"]]
            assert bytes(g["payload"]) == r["html"]  # byte-exact
            assert g["content_length"] == len(r["html"])
            assert g["http_status"] == r.get("status", 200)
            assert g["record_type"] == "response"
            assert g["warc_ts"] == dt.datetime.fromisoformat(
                r["ts"].replace("Z", ""))


def test_warcinfo_filtered_by_default_but_readable(spark, tmp_path):
    p = str(tmp_path / "t.warc")
    warc.write_warc(p, _RECORDS)
    assert warc.read_warc(spark, p).count() == 2
    every = warc.read_warc(spark, p, record_types=())
    types = {r["record_type"] for r in every.collect()}
    assert types == {"warcinfo", "response"}
    assert every.count() == 3


def test_multifile_parallel_read(spark, tmp_path):
    for i in range(3):
        warc.write_warc(
            str(tmp_path / f"part{i}.warc.gz"),
            [{"url": f"http://s{i}.com/p", "ts": "2025-01-01T00:00:00Z",
              "html": f"doc {i}".encode()}],
            gzip_members=True)
    df = warc.read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert df.count() == 3
    # one input file per task — file-level parallelism
    assert df.select("path").distinct().count() == 3


def test_warc_to_pages_fixture_parity(spark, tmp_path):
    """The deterministic pages fixture, written out as a WARC archive
    and read back, must reproduce (url, warc_ts, html) byte-for-byte —
    WARC ingestion composes with the §8.2 extraction invariant."""
    pdf = pages.gen_pages_pdf(range(0, 20))
    p = str(tmp_path / "pages.warc.gz")
    warc.write_warc(
        p,
        [{"url": r.url, "ts": r.warc_ts, "html": bytes(r.html)}
         for r in pdf.itertuples()],
        gzip_members=True)
    got = warc.warc_to_pages(warc.read_warc(spark, p)) \
        .orderBy("url").collect()
    assert len(got) == len(pdf)
    want = pdf.sort_values("url").reset_index(drop=True)
    for i, row in enumerate(got):
        assert row["url"] == want.loc[i, "url"]
        assert bytes(row["html"]) == bytes(want.loc[i, "html"])
        ts = want.loc[i, "warc_ts"]
        if getattr(ts, "tzinfo", None) is not None:
            ts = ts.replace(tzinfo=None)
        assert row["warc_ts"] == ts


def test_write_warc_df_distributed(spark, tmp_path):
    """Distributed writer (write_warc_df): one archive per shard, a
    shard never splits across files, bytes parallelism-invariant, and
    the read-back is byte-exact."""
    import hashlib
    import os

    rows = [(i % 3, f"http://s{i % 3}.example.com/{i}",
             f"2025-01-01T00:00:{i:02d}Z",
             f"payload {i} ✓".encode("utf-8"))
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "shard int, url string, ts string, html binary")

    out1 = str(tmp_path / "w1")
    os.makedirs(out1)
    man = {r["shard"]: r for r in
           warc.write_warc_df(df, out1, gzip_members=True).collect()}
    assert set(man) == {0, 1, 2}
    assert sum(r["n_records"] for r in man.values()) == 20
    # read-back: every payload byte-exact, url->shard file consistent
    got = warc.read_warc(spark, os.path.join(out1, "*.warc.gz"))
    by_url = {r["url"]: r for r in got.collect()}
    assert len(by_url) == 20
    for shard, url, ts, html in rows:
        assert bytes(by_url[url]["payload"]) == html
        assert by_url[url]["path"].endswith(f"shard{shard}.warc.gz")

    # parallelism invariance: 1-partition input -> identical bytes
    out2 = str(tmp_path / "w2")
    os.makedirs(out2)
    warc.write_warc_df(df.coalesce(1), out2, gzip_members=True).collect()
    for k in (0, 1, 2):
        h1 = hashlib.sha256(
            open(os.path.join(out1, f"shard{k}.warc.gz"), "rb").read())
        h2 = hashlib.sha256(
            open(os.path.join(out2, f"shard{k}.warc.gz"), "rb").read())
        assert h1.hexdigest() == h2.hexdigest(), k
