"""ST9: streaming MinHash near-duplicate detection — the incremental
twin of ``operators/doc_dedupe.lsh_candidate_pairs`` (SURVEY.md §2.10
ext). ST6 catches exact re-crawls by content hash; this catches NEAR
duplicates (boilerplate swaps, small edits) as documents arrive,
against the growing corpus of everything seen so far — the shape a
training-data ingest actually needs, since near-dup mass arrives
spread over months of crawls, not inside one batch.

Plan shape (all pre-state work is JVM column expressions):

1. per-row MinHash signature via ``doc_dedupe.minhash_signature_expr``
   — no shuffle, no Python; short docs (no n-grams) are dropped
   JVM-side exactly as the batch path drops them;
2. explode each signature into its ``n_bands`` LSH band keys (same
   slice/keying as ``doc_dedupe.banded_signatures``) — ``n_bands``
   rows per doc;
3. ``groupBy(band_id, band_hash).applyInPandasWithState``: state per
   bucket is the (doc_id, signature) list of bucket members seen so
   far. A new doc emits one match row per stored member with
   ``>= min_equal_slots`` equal signature slots (same-bucket already
   implies the band's ``k/n_bands`` consecutive slots are equal), or
   one ``is_first`` row if the bucket had no match.

Cross-batch determinism: within a microbatch, docs are processed in
ascending ``doc_id`` order and also compared against earlier docs of
the SAME batch, so the stream's final distinct (matched_doc_id,
doc_id) set equals the batch LSH candidate set over the full corpus —
independent of how the corpus was split into microbatches (asserted in
tests/test_minhash_stream.py, oracle-paired in the driver registry as
``doc_stream_near_dup``). Caveat on ORIENTATION: which member of a
pair is ``matched_doc_id`` (the earlier arrival) vs ``doc_id`` depends
on the batch split — the ORDERED pair is split-invariant only for
doc_id-monotone splits (every cluster member lands in ascending-id
batch order). Comparisons across arbitrary splits must normalize first
(least/greatest), as jobs/st9_bench.py's primary fingerprint does.

State size: O(corpus) doc-id+signature entries spread over the band
key space — the measured band-bucket skew profile (BENCH/BASELINE.md:
mean 1.06, p99.9 = 3 members per bucket at 1M docs) makes the per-key
state tiny; ``max_bucket`` is the loud cap for pathological key
families (a corpus that is mostly ONE near-dup cluster), and
``ttl_minutes`` bounds total state for unbounded crawls with a bounded
re-crawl horizon (same trade as ST6, documented not hidden).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mergeaddressesandbuildings_spark.operators import doc_dedupe

_OUT = ("band_id INT, band_hash STRING, doc_id LONG, "
        "matched_doc_id LONG, n_equal_slots LONG, is_first BOOLEAN")
_STATE = "doc_ids ARRAY<LONG>, sigs ARRAY<LONG>, n LONG"
_STATE_COARSE = ("band_ids ARRAY<INT>, band_hashes ARRAY<STRING>, "
                 "doc_ids ARRAY<LONG>, sigs ARRAY<LONG>, n LONG")

MAX_BUCKET_STATE = 256  # loud cap — see module docstring
COARSE_BUCKETS = 8192  # default state-key coarsening — see stream_near_dup


def stream_near_dup(docs: DataFrame,
                    k: int = doc_dedupe.N_MINHASH,
                    n_bands: int = doc_dedupe.N_BANDS,
                    n: int = 2,
                    min_equal_slots: int | None = None,
                    hash: str = "xxhash64",
                    band_key: str = "hash",
                    ttl_minutes: int | None = None,
                    max_bucket: int = MAX_BUCKET_STATE,
                    coarse_buckets: int | None = COARSE_BUCKETS) -> DataFrame:
    """Stateful streaming near-dup over a document stream
    (``doc_id LONG, text STRING`` at minimum).

    Output: per (band bucket, microbatch-appearance) rows — match rows
    carry the stored member matched and the pair's equal-slot count
    (estimated Jaccard = n_equal_slots/k); ``is_first`` rows mark docs
    that matched nothing in that bucket. Global pairs = distinct
    (matched_doc_id, doc_id) across buckets; a globally-new doc is one
    with no match row in ANY of its bands.

    ``min_equal_slots`` defaults to the band width (k // n_bands) —
    i.e. every bucket cohabitant is a candidate, the LSH banding
    guarantee; raise it toward k to demand higher estimated Jaccard
    before pairing. ``hash``/``band_key`` choose the xxhash64 scale
    family or the sha256/string oracle family, exactly as in the batch
    operator.

    ``coarse_buckets`` (default on): the stateful operator is keyed by
    ``pmod(xxhash64(band_id, band_hash), coarse_buckets)`` instead of
    the exact band bucket, and the exact per-bucket logic runs INSIDE
    the Python function over the coarse group. applyInPandasWithState
    pays one Python dispatch per KEY per microbatch; with exact keying
    and the measured ~1.06 mean bucket size that is ~n_bands
    dispatches per doc — the measured r4 throughput floor (208-335
    docs/s at 30k docs, BENCH/BASELINE.md). Coarse keying caps
    dispatches at min(coarse_buckets, batch band rows) per microbatch —
    measured 2.2x docs/s at local[4] / 1.4x at local[16] on the 60k-doc
    interleaved series (up to 3.4x in matched windows at the r4 30k
    protocol; the residual at high core counts is per-doc Python work +
    state serde, which coarsening does not touch) — while the emitted
    rows, pair set, is_first semantics and per-bucket max_bucket cap
    are IDENTICAL — buckets never mix, they are separated again inside
    the group. Trade, documented not hidden: a touched coarse key
    deserializes its whole group state (~corpus·n_bands/coarse_buckets
    entries), so for very large corpora with tiny deltas raise
    coarse_buckets (or pass None for exact keying) to keep per-key
    state cache-sized; TTL expiry also coarsens to the group.
    ``coarse_buckets=None`` restores exact per-bucket keying."""
    if min_equal_slots is None:
        min_equal_slots = k // n_bands
    rows_per_band = k // n_bands

    sig = doc_dedupe.minhash_signature_expr(F.col("text"), k=k, n=n, hash=hash)
    sigs = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), sig.alias("sig")
    ).filter(F.col("doc_id").isNotNull() & F.col("sig").isNotNull())

    def key_of(b: int):
        joined = F.concat_ws(",", F.transform(
            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
            lambda x: x.cast("string"),
        ))
        return F.xxhash64(joined).cast("string") if band_key == "hash" else joined

    bands = F.explode(F.array(*[
        F.struct(F.lit(b).cast("int").alias("band_id"),
                 key_of(b).alias("band_hash"))
        for b in range(n_bands)
    ]))
    banded = sigs.select("doc_id", "sig", bands.alias("b")).select(
        "doc_id", "sig", "b.band_id", "b.band_hash"
    )

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)

    def match(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        # ascending doc_id = the deterministic arrival order WITHIN a
        # batch; cross-batch order is microbatch order (state is older)
        batch = batch.sort_values("doc_id", kind="mergesort")
        if state.exists:
            doc_ids, flat, n_seen = state.get
            doc_ids = [int(d) for d in doc_ids]
            flat = [int(x) for x in flat]
        else:
            doc_ids, flat, n_seen = [], [], 0

        out_doc, out_match, out_eq, out_first = [], [], [], []
        for doc_id, sig_arr in zip(batch["doc_id"], batch["sig"]):
            s = np.asarray(list(sig_arr), dtype=np.int64)
            matched = False
            if doc_ids:
                stored = np.asarray(flat, dtype=np.int64).reshape(-1, k)
                eq = (stored == s).sum(axis=1)
                for i in np.flatnonzero(eq >= min_equal_slots):
                    out_doc.append(int(doc_id))
                    out_match.append(doc_ids[i])
                    out_eq.append(int(eq[i]))
                    out_first.append(False)
                    matched = True
            if not matched:
                out_doc.append(int(doc_id))
                out_match.append(None)
                out_eq.append(0)
                out_first.append(True)
            if len(doc_ids) >= max_bucket:
                raise ValueError(
                    f"minhash_stream: bucket {key} exceeds max_bucket="
                    f"{max_bucket} members — a near-dup cluster this hot "
                    "should be drained by exact dedup (ST6) upstream, or "
                    "raise n_bands/max_bucket explicitly"
                )
            doc_ids.append(int(doc_id))
            flat.extend(int(x) for x in s)

        state.update((doc_ids, flat, int(n_seen) + len(batch)))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({
            "band_id": np.int32(key[0]),
            "band_hash": str(key[1]),
            "doc_id": pd.array(out_doc, dtype="int64"),
            "matched_doc_id": pd.array(out_match, dtype="Int64"),
            "n_equal_slots": pd.array(out_eq, dtype="int64"),
            "is_first": out_first,
        })

    def match_coarse(key: tuple, pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        # same arrival-order contract as exact keying: within a batch,
        # ascending doc_id; state members are strictly older
        batch = batch.sort_values("doc_id", kind="mergesort")
        if state.exists:
            s_bids, s_bhs, s_docs, s_flat, n_seen = state.get
            mem_bid = [int(x) for x in s_bids]
            mem_bh = [str(x) for x in s_bhs]
            mem_doc = [int(x) for x in s_docs]
            sig_mat = np.asarray(s_flat, dtype=np.int64).reshape(-1, k)
            mem_sig = [sig_mat[i] for i in range(sig_mat.shape[0])]
        else:
            mem_bid, mem_bh, mem_doc, mem_sig, n_seen = [], [], [], [], 0
        # exact (band_id, band_hash) buckets, re-separated inside the
        # coarse group — member lists are insertion-ordered, so state
        # order == arrival order exactly as with per-bucket keying
        buckets: dict[tuple, list[int]] = {}
        for i, (bid, bh) in enumerate(zip(mem_bid, mem_bh)):
            buckets.setdefault((bid, bh), []).append(i)

        out_bid: list[int] = []
        out_bh: list[str] = []
        out_doc: list[int] = []
        out_match: list[int | None] = []
        out_eq: list[int] = []
        out_first: list[bool] = []
        for doc_id, sig_arr, bid, bh in zip(
                batch["doc_id"], batch["sig"],
                batch["band_id"], batch["band_hash"]):
            kb = (int(bid), str(bh))
            idxs = buckets.setdefault(kb, [])
            s = np.asarray(list(sig_arr), dtype=np.int64)
            matched = False
            if idxs:
                stored = np.stack([mem_sig[i] for i in idxs])
                eq = (stored == s).sum(axis=1)
                for j in np.flatnonzero(eq >= min_equal_slots):
                    out_bid.append(kb[0])
                    out_bh.append(kb[1])
                    out_doc.append(int(doc_id))
                    out_match.append(mem_doc[idxs[j]])
                    out_eq.append(int(eq[j]))
                    out_first.append(False)
                    matched = True
            if not matched:
                out_bid.append(kb[0])
                out_bh.append(kb[1])
                out_doc.append(int(doc_id))
                out_match.append(None)
                out_eq.append(0)
                out_first.append(True)
            if len(idxs) >= max_bucket:
                raise ValueError(
                    f"minhash_stream: bucket {kb} exceeds max_bucket="
                    f"{max_bucket} members — a near-dup cluster this hot "
                    "should be drained by exact dedup (ST6) upstream, or "
                    "raise n_bands/max_bucket explicitly"
                )
            idxs.append(len(mem_doc))
            mem_bid.append(kb[0])
            mem_bh.append(kb[1])
            mem_doc.append(int(doc_id))
            mem_sig.append(s)

        state.update((
            mem_bid, mem_bh, mem_doc,
            (np.concatenate(mem_sig).tolist() if mem_sig else []),
            int(n_seen) + len(batch),
        ))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({
            "band_id": pd.array(out_bid, dtype="int32"),
            "band_hash": out_bh,
            "doc_id": pd.array(out_doc, dtype="int64"),
            "matched_doc_id": pd.array(out_match, dtype="Int64"),
            "n_equal_slots": pd.array(out_eq, dtype="int64"),
            "is_first": out_first,
        })

    if coarse_buckets:
        coarse = banded.withColumn(
            "coarse",
            F.pmod(F.xxhash64("band_id", "band_hash"),
                   F.lit(coarse_buckets)).cast("int"),
        )
        return (
            coarse.groupBy("coarse")
            .applyInPandasWithState(
                match_coarse,
                outputStructType=_OUT,
                stateStructType=_STATE_COARSE,
                outputMode="update",
                timeoutConf=timeout,
            )
        )
    return (
        banded.groupBy("band_id", "band_hash")
        .applyInPandasWithState(
            match,
            outputStructType=_OUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
