"""Streaming URL-level dedup with latest-capture-wins semantics — the
incremental twin of ``operators/webpipe.url_dedup_groups`` and the
streaming side of crawl ingestion: captures of the same page arrive
hours or months apart (re-crawls), and consumers want exactly one
current row per canonical URL (F9 latest-capture-wins, SURVEY.md §2.8),
updated as newer captures land.

Shape mirrors ST6 (``streaming/doc_stream.py``): the canonical URL is
computed JVM-side (pure column expressions, ``webpipe.canonical_url``)
BEFORE the state operator, so Python only sees the handful of rows per
key per microbatch; state per key is (best_ts, best_doc, n_captures) —
O(distinct URLs), independent of capture count, TTL-evictable for
unbounded crawls. Each microbatch emits the key's current winner, so a
downstream upsert sink converges to the latest capture per URL.

Winner rule: max capture timestamp, ties to the LOWEST doc id — the
same deterministic tie order as the batch operators, so a replay (or
the batch group-by over the full capture log) reproduces the stream's
final state exactly (asserted in tests and oracle-paired in the driver
registry: ``url_stream_latest``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mergeaddressesandbuildings_spark.operators import webpipe

_OUT = ("canonical_url STRING, winner_doc_id LONG, winner_ts LONG, "
        "n_captures_so_far LONG")
_STATE = "best_ts LONG, best_doc LONG, n LONG"


def stream_url_latest(captures: DataFrame,
                      url_col: str = "url",
                      ts_col: str = "warc_ts",
                      id_col: str = "doc_id",
                      ttl_minutes: int | None = None) -> DataFrame:
    """Stateful latest-capture-wins per canonical URL over a capture
    stream. ``ts_col`` is an epoch-seconds LONG (the registry's
    timestamp discipline). Output: one row per (canonical URL,
    microbatch-appearance) carrying the winner AFTER that batch and the
    running capture count — the final update per key is the stream's
    answer, equal to the batch group-by over the same capture log."""
    keyed = captures.select(
        webpipe.canonical_url(F.col(url_col)).alias("canonical_url"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).cast("long").alias("ts"),
    ).filter(
        # a null/uncastable ts or id would raise int(NaN) inside the
        # state worker and kill the whole query — drop malformed
        # captures JVM-side instead of letting one bad row poison the
        # stream (a null url canonicalizes to NULL and is dropped too)
        F.col("canonical_url").isNotNull()
        & F.col("doc_id").isNotNull() & F.col("ts").isNotNull()
    )

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)

    def latest(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        # batch-local winner: max ts, tie lowest doc_id (stable sort)
        batch = batch.sort_values(["ts", "doc_id"],
                                  ascending=[False, True], kind="mergesort")
        cand_ts = int(batch.iloc[0]["ts"])
        cand_doc = int(batch.iloc[0]["doc_id"])
        if state.exists:
            best_ts, best_doc, n = state.get
        else:
            best_ts, best_doc, n = None, None, 0
        n += len(batch)
        if (best_ts is None or cand_ts > best_ts
                or (cand_ts == best_ts and cand_doc < best_doc)):
            best_ts, best_doc = cand_ts, cand_doc
        state.update((int(best_ts), int(best_doc), int(n)))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({
            "canonical_url": [key[0]],
            "winner_doc_id": [int(best_doc)],
            "winner_ts": [int(best_ts)],
            "n_captures_so_far": [int(n)],
        })

    return (
        keyed.groupBy("canonical_url")
        .applyInPandasWithState(
            latest,
            outputStructType=_OUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
