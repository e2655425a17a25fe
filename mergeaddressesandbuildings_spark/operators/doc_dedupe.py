"""Near-duplicate detection over documents: MinHash+LSH, SimHash, and
exact n-gram Jaccard (driver round spec: deduplication operators as
first-class components).

Scale design:
- shingling/hashing is all built-in expressions (xxhash64, transform,
  explode) — JVM-side, no Python;
- MinHash signatures come out of ONE hash aggregate (min of k
  independent hashes per doc — map-side combinable);
- LSH banding turns candidate generation into an equi-join on
  (band_id, band_hash): only same-bucket docs ever pair, so the
  quadratic blowup is confined to buckets (the standard banding
  guarantee); candidates are then verified with exact Jaccard via a
  shingle-set semi-join restricted to candidate pairs.
- SimHash is the one Arrow kernel here (bitwise majority vote over
  token hashes — not expressible with builtins efficiently).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band


def shingles(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, built with array
    lambdas (no Python)."""
    ws = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(n), F.size(ws)),
        lambda i: F.array_join(F.slice(ws, i - (n - 1), n), " "),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """(doc_id, sig: array<long>) — k min-hashes per doc in one agg."""
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(k)
    ]
    sig = F.array(*[F.col(f"h{j}") for j in range(k)])
    return sh.groupBy("doc_id").agg(*mins).select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """LSH banding: equal band-slice → candidate pair (doc_a < doc_b)."""
    k = N_MINHASH
    rows_per_band = k // n_bands
    bands = F.explode(
        F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ))
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ])
    )
    banded = sigs.select("doc_id", bands.alias("b")).select(
        "doc_id", "b.band_id", "b.band_hash"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for candidate pairs via shingle-set join.

    The shingle join is keyed by shingle but restricted to candidate
    docs (semi-join first), so cost is |candidate shingle lists|, not
    corpus-quadratic.
    """
    docs_in_play = pairs.select(F.col("doc_a").alias("doc_id")).union(
        pairs.select("doc_b")
    ).distinct()
    sh_c = sh.join(docs_in_play, "doc_id")
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    common = (
        sh_c.alias("x")
        .join(sh_c.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .join(pairs, ["doc_a", "doc_b"], "left_semi")  # only LSH candidates
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard"
    )


def minhash_lsh_dedupe(docs: DataFrame, n: int = 2, threshold: float = 0.6) -> DataFrame:
    """Full MinHash→LSH→verify pipeline → near-dup pairs above threshold."""
    sh = shingles(docs, n)
    sigs = minhash_signatures(sh)
    cands = lsh_candidate_pairs(sigs)
    return jaccard_verify(sh, cands, threshold)


def ngram_jaccard_pairs(docs: DataFrame, n: int = 2, min_common: int = 10) -> DataFrame:
    """Exact (no-LSH) n-gram overlap — the small-scale oracle-checkable
    variant: pairs sharing ≥ min_common distinct shingles."""
    sh = shingles(docs, n)
    return (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc (Arrow kernel: bit-majority of token
    hashes, vectorized with numpy over the batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_ids, out_hashes = [], []
            for doc_id, text in zip(b["doc_id"].to_numpy(), b["text"].to_numpy()):
                toks = text.split(" ")
                # deterministic 64-bit token hashes (FNV-1a, numpy-friendly)
                hs = np.zeros(len(toks), dtype=np.uint64)
                for t_i, t in enumerate(toks):
                    h = np.uint64(0xCBF29CE484222325)
                    for ch in t.encode():
                        h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                    hs[t_i] = h
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
                vote = (2 * bits - 1).sum(axis=0)
                sh_bits = (vote >= 0).astype(np.uint64)
                val = np.uint64(0)
                for bit_i in range(64):
                    val |= sh_bits[bit_i] << np.uint64(bit_i)
                out_ids.append(doc_id)
                out_hashes.append(np.int64(val.astype(np.int64)))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": np.asarray(out_hashes, dtype=np.int64)})

    return docs.select("doc_id", "text").mapInPandas(run, schema="doc_id long, simhash long")


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by SimHash: block on 16-bit chunks (pigeonhole:
    hamming ≤ 3 over 4 chunks → at least one chunk identical), verify
    hamming distance with bit_count — all builtins after the kernel."""
    s = simhash(docs)
    chunk = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
            )
            for i in range(4)
        ])
    )
    blocked = s.select("doc_id", "simhash", chunk.alias("c")).select(
        "doc_id", "simhash", "c.chunk_id", "c.chunk_val"
    )
    pairs = (
        blocked.alias("x")
        .join(blocked.alias("y"), ["chunk_id", "chunk_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
