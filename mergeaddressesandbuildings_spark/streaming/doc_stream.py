"""ST6: streaming document dedup for the training-data pipeline
(SURVEY.md §2.10 ext) — the incremental twin of
``operators/textstats.exact_dedupe``: as document batches arrive, emit
each distinct content exactly once, across microbatch boundaries.

A plain ``dropDuplicates`` inside ``foreachBatch`` only dedupes WITHIN
a batch; cross-batch duplicates (the common case — re-crawls arrive
hours apart) need keyed state. This uses ``applyInPandasWithState``
keyed by the 64-bit content hash:

- state per key is (first_seen flag, dup count) — O(distinct contents),
  independent of row count, and evictable via a processing-time TTL for
  corpora where re-crawls have a bounded horizon;
- within a batch, the deterministic winner is the lowest ``doc_id``
  (same tie rule as the batch dedup), so output is replay-stable;
- the content hash is computed JVM-side (``xxhash64(text)``) before
  the state operator — Python only ever sees the few colliding rows
  per key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mergeaddressesandbuildings_spark import schemas

_OUT = ("content_hash LONG, doc_id LONG, lang STRING, n_chars LONG, "
        "n_dups_so_far LONG, is_first BOOLEAN")
_STATE = "seen BOOLEAN, n_dups LONG"


def docs_stream(spark: SparkSession, input_dir: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """Incremental document ingest (frozen DOCUMENTS schema — never
    inferred)."""
    reader = spark.readStream.schema(schemas.DOCUMENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_exact_dedupe(docs: DataFrame,
                        ttl_minutes: int | None = None,
                        hash: str = "xxhash64") -> DataFrame:
    """Streaming exact dedup by content hash.

    Output: one row per (content_hash, microbatch-appearance) with
    ``is_first`` marking the single global first occurrence — consumers
    keep ``is_first`` rows and get an exactly-once corpus; the
    non-first rows carry the running duplicate count for monitoring.

    ``ttl_minutes`` bounds state for unbounded corpora: a key idle
    longer than the TTL is evicted (a duplicate arriving after that
    re-emits — the standard state-size/completeness trade, documented
    rather than hidden).
    """
    if hash == "xxhash64":  # the scale default
        key = F.xxhash64("text")
    else:  # "sha256" — the engine-reproducible oracle family (ids_sql)
        from mergeaddressesandbuildings_spark.functions import ids_sql
        key = ids_sql.sha256_hash60_expr(F.col("text"))
    hashed = docs.select(
        key.alias("content_hash"), "doc_id", "lang", "n_chars",
    )

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)

    def dedupe(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values("doc_id", kind="mergesort")
        seen, n_dups = state.get if state.exists else (False, 0)
        is_first = not seen
        n_dups += len(batch) - (1 if is_first else 0)
        state.update((True, int(n_dups)))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        first = batch.iloc[0]
        yield pd.DataFrame({
            "content_hash": [key[0]],
            "doc_id": [int(first["doc_id"])],
            "lang": [first["lang"]],
            "n_chars": [int(first["n_chars"])],
            "n_dups_so_far": [int(n_dups)],
            "is_first": [is_first],
        })

    return (
        hashed.groupBy("content_hash")
        .applyInPandasWithState(
            dedupe,
            outputStructType=_OUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
