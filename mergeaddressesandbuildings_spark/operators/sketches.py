"""HyperLogLog / Count-Min distinct-count and frequency sketching
with ENGINE-EXACT registers.

The usual reason sketches can't be correctness-gated is that library
implementations (DataSketches, Algebird, DuckDB's approx_count_
distinct) differ in hash family and register layout, and float
estimate arithmetic drifts with merge order. This module splits the
sketch into:

1. **Registers** — per group, for every non-empty bucket j of m=2^p,
   the max rho (1 + leading-zero count of the hash suffix). Buckets,
   suffixes and rho are EXACT INTEGERS derived from the repo's
   sha256-based 60-bit hash (functions/ids_sql.py — the same
   bit-exact-in-DuckDB family MinHash/SimHash oracle modes use), so
   the register table is engine/parallelism/retry-invariant and
   driver-hashable. rho's leading-zero count is computed without
   float log2: bit_length(suffix) via the minimal binary-string
   length (Spark ``conv(x,10,2)`` == DuckDB ``bin(x)``), exact at
   every boundary where ``floor(log2())`` ulp-drifts.
2. **Estimate** — the standard HLL harmonic-mean formula applied to
   the register table driver-side (`hll_estimate`): float math over
   <= m numbers in a FIXED bucket order, deterministic, and
   accuracy-tested (~1.04/sqrt(m) relative error) rather than
   hash-compared.

Register max is an associative, commutative, map-side-combinable agg:
ONE hash agg over (group, bucket) regardless of input size — the
sketch property that matters at 10^12 rows. ``hash="xxhash64"``
(default) is the at-scale mode; ``hash="sha256"`` is the
oracle-pairable mode — same plan shape, only the hash kernel swaps
(doc_dedupe.py's convention).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from mergeaddressesandbuildings_spark.functions import ids_sql

__all__ = ["hll_registers", "hll_estimate",
           "cms_counters", "cms_point_estimate"]

HASH_BITS = 60  # ids_sql.sha256_hash60_expr width; xxhash64 masked to match


def hll_registers(df: DataFrame, keys: list[str], value_col: str,
                  p: int = 6, hash: str = "xxhash64") -> DataFrame:
    """→ (keys..., bucket INT, rho INT) for every non-empty bucket:
    sparse HLL registers per group. Dense 0-filled arrays are a
    presentation concern; the sparse long format is what shuffles,
    merges, and hash-compares exactly."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    sbits = HASH_BITS - p
    v = F.col(value_col).cast("string")
    if hash == "xxhash64":
        # mask to 60 bits so bucket/suffix geometry matches sha256 mode
        h = F.xxhash64(v).bitwiseAND(F.lit((1 << HASH_BITS) - 1))
    elif hash == "sha256":
        h = ids_sql.sha256_hash60_expr(v, prefix="hll|")
    else:
        raise ValueError(f"unknown hash mode {hash!r}")
    bucket = (h % m).cast("int")
    # shiftright, NOT h/m: double division is inexact above 2^53 and
    # h is 60-bit (h is always non-negative here, so >> is floor div)
    suffix = F.shiftright(h, p).cast("long")
    # bit_length via minimal binary string: exact, no float log2
    rho = (
        F.when(suffix == 0, F.lit(sbits + 1))
        .otherwise(F.lit(sbits + 1) - F.length(F.conv(suffix, 10, 2)))
    ).cast("int")
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], p: int = 6) -> float:
    """Standard HLL estimate (Flajolet et al. 2007) from a sparse
    (bucket, rho) register list for ONE group. Includes the small-
    range linear-counting correction; large-range correction is
    unnecessary at 60 hash bits."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    rho_by_bucket = dict(registers)
    if len(rho_by_bucket) != len(registers):
        raise ValueError("duplicate buckets in register list")
    s = sum(2.0 ** -rho_by_bucket.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len(rho_by_bucket)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est


def cms_counters(df: DataFrame, keys: list[str], value_col: str,
                 weight_col: str | None = None, d: int = 4, w: int = 64,
                 hash: str = "xxhash64") -> DataFrame:
    """Count-Min sketch counters (Cormode & Muthukrishnan 2005) with
    the same engine-exact split as :func:`hll_registers`: the COUNTER
    MATRIX is exact integers — ``(keys..., row_i INT, col INT,
    cnt BIGINT)`` where ``cnt = sum(weight)`` over items whose i-th
    hash lands in column ``col`` — so it is parallelism/merge-order/
    engine-invariant and driver-hashable; only the point ESTIMATE
    (:func:`cms_point_estimate`, a min over d exact counters) carries
    the sketch's approximation, and even that is integer-exact given
    the counters.

    Plan shape at 10^12 rows: a d-fold row expansion (explode of a
    d-element array built per row — no join, no shuffle) into ONE
    map-side-combinable hash agg on (keys, row_i, col). Sketch size
    d*w per group is independent of input size; counter add is
    associative and commutative, so partial aggregation does the heavy
    lifting and the shuffle carries at most d*w rows per group per
    map task. ``hash="xxhash64"`` is the at-scale mode;
    ``hash="sha256"`` is the oracle-pairable mode (doc_dedupe.py's
    convention — same plan, only the hash kernel swaps).

    Row hashes are independent by domain separation: row i uses
    prefix ``cms{i}|`` (sha256 mode) or seed column i (xxhash64 mode).
    """
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 hash rows and w >= 2 columns")
    v = F.col(value_col).cast("string")
    wt = (F.col(weight_col).cast("long") if weight_col
          else F.lit(1).cast("long"))
    if hash == "xxhash64":
        def h(i):
            return F.xxhash64(F.lit(f"cms{i}|"), v).bitwiseAND(
                F.lit((1 << HASH_BITS) - 1))
    elif hash == "sha256":
        def h(i):
            return ids_sql.sha256_hash60_expr(v, prefix=f"cms{i}|")
    else:
        raise ValueError(f"unknown hash mode {hash!r}")
    cells = F.array(*[
        F.struct(F.lit(i).cast("int").alias("row_i"),
                 (h(i) % w).cast("int").alias("col"))
        for i in range(d)
    ])
    cell = F.explode(cells).alias("cell")
    return (
        df.select(*keys, cell, wt.alias("wt"))
        .groupBy(*keys, F.col("cell.row_i").alias("row_i"),
                 F.col("cell.col").alias("col"))
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_point_estimate(counters: list[tuple[int, int, int]], item: str,
                       d: int = 4, w: int = 64,
                       hash: str = "sha256") -> int:
    """CMS point query for ONE group: min over rows of the counter in
    the item's column — never underestimates the true weight, and
    overestimates by at most eps*N (eps = e/w) with probability
    1 - (1/2)^d on adversarial input. ``counters`` is the sparse
    (row_i, col, cnt) list from :func:`cms_counters`; absent cells
    are zero. sha256 mode only (the estimate is a driver-side probe
    over <= d*w integers; at-scale probes join against the counter
    table instead)."""
    if hash != "sha256":
        raise ValueError("point probe supports the sha256 mode only")
    import hashlib

    cnt = {(r, c): n for r, c, n in counters}
    est = None
    for i in range(d):
        h60 = int(hashlib.sha256(
            f"cms{i}|{item}".encode()).hexdigest()[:15], 16)
        got = cnt.get((i, h60 % w), 0)
        est = got if est is None else min(est, got)
    return est
