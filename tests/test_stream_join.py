"""ST8 stream-stream interval join (streaming/stream_join.py): static
semantics vs brute force (inclusive bounds), the disjoint-name guard,
and a REAL two-microbatch streaming run whose result must equal the
batch join — including a pair whose halves arrive in different
microbatches (both-sided state).
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.streaming import stream_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


ERRORS = [(1, 100, _ts(0)), (1, 101, _ts(30)), (2, 102, _ts(5))]
CLICKS = [
    (1, 200, _ts(0)),    # delta 0 → inclusive lower bound
    (1, 201, _ts(10)),   # delta 10 min → inclusive upper bound (600 s)
    (1, 202, _ts(11)),   # outside the window of error 100
    (1, 203, _ts(29)),   # BEFORE error 101 → never pairs with it
    (2, 204, _ts(16)),   # outside error 102's window (11 min)
    (3, 205, _ts(1)),    # user with no errors
]


def _brute(max_delta_s=600):
    return sorted(
        (eu, eid, cid)
        for eu, eid, ets in ERRORS
        for cu, cid, cts in CLICKS
        if eu == cu and 0 <= (cts - ets).total_seconds() <= max_delta_s
    )


def _frames(spark):
    e = spark.createDataFrame(
        ERRORS, "e_uid long, error_id long, e_ts timestamp")
    c = spark.createDataFrame(
        CLICKS, "c_uid long, click_id long, c_ts timestamp")
    return e, c


def test_interval_join_static_matches_brute(spark):
    e, c = _frames(spark)
    got = stream_join.interval_join(
        e, c, left_key="e_uid", right_key="c_uid",
        left_ts="e_ts", right_ts="c_ts", max_delta_s=600)
    rows = sorted((r["e_uid"], r["error_id"], r["click_id"])
                  for r in got.collect())
    assert rows == _brute()
    assert (1, 100, 200) in rows and (1, 100, 201) in rows  # both bounds


def test_interval_join_rejects_overlapping_names_and_bad_delta(spark):
    e, _ = _frames(spark)
    with pytest.raises(ValueError, match="disjoint"):
        stream_join.interval_join(e, e, left_key="e_uid",
                                  right_key="e_uid", left_ts="e_ts",
                                  right_ts="e_ts", max_delta_s=600)
    e2, c2 = _frames(spark)
    with pytest.raises(ValueError, match="positive"):
        stream_join.interval_join(e2, c2, left_key="e_uid",
                                  right_key="c_uid", left_ts="e_ts",
                                  right_ts="c_ts", max_delta_s=0)


def test_streaming_run_equals_batch_join_across_microbatches(spark):
    # batch 1: error 100 (user 1, t=0); its matching click 201 (t=10)
    # arrives only in batch 2 → the pair requires buffered left state
    b1 = [(100, _ts(0), 1, "error"), (200, _ts(0), 1, "click"),
          (102, _ts(5), 2, "error")]
    b2 = [(201, _ts(10), 1, "click"), (101, _ts(30), 1, "error"),
          (204, _ts(35), 1, "click"), (205, _ts(50), 2, "click")]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    src_dir = tempfile.mkdtemp(prefix="sj_test_")
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(os.path.join(src_dir, name))
    flat = tempfile.mkdtemp(prefix="sj_test_flat_")
    for sub in ("b1", "b2"):
        d = os.path.join(src_dir, sub)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(d, f),
                           os.path.join(flat, f"{sub}.parquet"))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(flat))
    errors = src.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_uid"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"))
    clicks = src.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"))
    joined = stream_join.interval_join(
        errors, clicks, left_key="e_uid", right_key="c_uid",
        left_ts="e_ts", right_ts="c_ts", max_delta_s=600)
    q = (joined.writeStream.format("memory").queryName("sj_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["e_uid"], r["error_id"], r["click_id"])
                 for r in spark.table("sj_test").collect())
    # batch reference over the same log
    all_rows = b1 + b2
    want = sorted(
        (eu, eid, cid)
        for eid, ets, eu, et in all_rows if et == "error"
        for cid, cts, cu, ct in all_rows if ct == "click"
        if eu == cu and 0 <= (cts - ets).total_seconds() <= 600
    )
    assert got == want
    assert (1, 100, 201) in got  # the cross-microbatch pair
