"""Bloom-filter semi-join pruning (SURVEY.md §13): build a Bloom
bitmap over the small side's join keys, prune the big probe side with
it BEFORE the shuffle, then finish with the exact semi join.

This is the explicit, testable form of the runtime row-level filter
that engines inject for selective joins (Spark's
``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``, ORC/Iceberg
bloom indexes): at 10^12 probe rows the win is that pruned rows never
leave the scan stage — no shuffle write, no network, no build-side
probe — and a Bloom filter's one-sided error (false positives only)
makes the prune semantically free because the exact join re-checks
survivors. Output is therefore EXACTLY the plain semi join, which is
what the DuckDB oracle checks (the prune is invisible in the result,
visible in the plan and in `bloom_prune`'s row counts).

Representation: the bitmap is a DataFrame of ``(word_idx INT,
mask BIGINT)`` — 64 bits per row, only non-zero words materialized —
built with one explode + bit_or hash agg (associative, map-side
combinable) and broadcast to the probe side. The probe check is k
broadcast equi-joins (one per hash row, k is small) each testing one
bit with pure JVM bit arithmetic: no Python, no row expansion, no
driver-side bitset. m_bits=2^20 is 16K words ≈ 128 KiB broadcast.

Hash family: domain-separated ``bloom{i}|`` prefixes over the repo's
60-bit sha256 family (oracle-pairable) or xxhash64 (at-scale mode) —
doc_dedupe.py's convention. The final output is hash-independent, so
even the xxhash64 mode is exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mergeaddressesandbuildings_spark.functions import ids_sql
from mergeaddressesandbuildings_spark.operators.sketches import HASH_BITS

__all__ = ["bloom_build", "bloom_prune", "bloom_semi_join"]


def _hash60(i: int, v: Column, hash: str) -> Column:
    if hash == "xxhash64":
        return F.xxhash64(F.lit(f"bloom{i}|"), v).bitwiseAND(
            F.lit((1 << HASH_BITS) - 1))
    if hash == "sha256":
        return ids_sql.sha256_hash60_expr(v, prefix=f"bloom{i}|")
    raise ValueError(f"unknown hash mode {hash!r}")


def _check_params(m_bits: int, k: int) -> None:
    if m_bits < 64:
        raise ValueError("m_bits must be >= 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")


def bloom_build(build: DataFrame, key_col: str, m_bits: int = 1 << 20,
                k: int = 4, hash: str = "xxhash64") -> DataFrame:
    """→ (word_idx INT, mask BIGINT): sparse 64-bit words of the Bloom
    bitmap over ``build[key_col]``. One explode (k cells per row) into
    one bit_or hash agg — same shuffle shape as cms_counters, output
    size <= m_bits/64 rows regardless of build cardinality."""
    _check_params(m_bits, k)
    v = F.col(key_col).cast("string")
    pos = F.explode(F.array(*[
        (_hash60(i, v, hash) % m_bits).cast("long") for i in range(k)
    ])).alias("pos")
    return (
        build.select(pos)
        .select(F.shiftright(F.col("pos"), 6).cast("int").alias("word_idx"),
                F.col("pos").bitwiseAND(F.lit(63)).cast("int").alias("bit"))
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
             .alias("mask"))
    )


def bloom_prune(probe: DataFrame, key_col: str, bitmap: DataFrame,
                m_bits: int = 1 << 20, k: int = 4,
                hash: str = "xxhash64") -> DataFrame:
    """Probe rows whose key passes every one of the k bit tests — a
    SUPERSET of the true matches (Bloom filters have no false
    negatives), emitted with probe's original columns. Each test is a
    broadcast equi-join on word_idx plus a shift-and-mask; rows
    failing any test are dropped before any wide shuffle."""
    _check_params(m_bits, k)
    v = F.col(key_col).cast("string")
    out = probe
    for i in range(k):
        pos = (_hash60(i, v, hash) % m_bits).cast("long")
        out = (
            out.withColumn(f"__w{i}", F.shiftright(pos, 6).cast("int"))
            .withColumn(f"__b{i}", pos.bitwiseAND(F.lit(63)).cast("int"))
        )
        bi = F.broadcast(bitmap.select(
            F.col("word_idx").alias(f"__wi{i}"),
            F.col("mask").alias(f"__m{i}")))
        out = (
            out.join(bi, on=F.col(f"__w{i}") == F.col(f"__wi{i}"),
                     how="left")
            .filter(F.coalesce(F.col(f"__m{i}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), __b{i})")) != 0)
            .drop(f"__w{i}", f"__b{i}", f"__wi{i}", f"__m{i}")
        )
    return out


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, m_bits: int = 1 << 20, k: int = 4,
                    hash: str = "xxhash64") -> DataFrame:
    """Exact semi join ``probe ⋉ build`` with a Bloom pre-prune on the
    probe side: result rows are IDENTICAL to a plain left_semi join
    (false positives are removed by the final exact join), but at
    scale the probe shuffle only carries bloom survivors. The final
    join stays an equi-join (AQE picks broadcast when the build side
    is small enough)."""
    pruned = bloom_prune(probe, probe_key,
                         bloom_build(build, build_key, m_bits, k, hash),
                         m_bits, k, hash)
    keys = build.select(F.col(build_key).alias("__bloom_bk")).distinct()
    return pruned.join(keys,
                       on=F.col(probe_key) == F.col("__bloom_bk"),
                       how="left_semi")
