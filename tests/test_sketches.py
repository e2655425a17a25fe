"""hll_registers vs a pure-Python register oracle (sha256 from
hashlib, explicit bit arithmetic) + estimate accuracy bounds."""

from __future__ import annotations

import hashlib

import pytest

from mergeaddressesandbuildings_spark.operators.sketches import (
    HASH_BITS, hll_estimate, hll_registers,
)


def py_hash60(s: str) -> int:
    return int(hashlib.sha256(f"hll|{s}".encode()).hexdigest()[:15], 16)


def brute_registers(rows, p):
    m = 1 << p
    sbits = HASH_BITS - p
    regs = {}
    for k, v in rows:
        h = py_hash60(str(v))
        bucket, suffix = h % m, h // m
        rho = sbits + 1 if suffix == 0 else sbits + 1 - suffix.bit_length()
        key = (k, bucket)
        regs[key] = max(regs.get(key, 0), rho)
    return regs


@pytest.fixture(scope="module")
def rows():
    return [(f"g{i % 3}", f"user{i * 7919 % 1000}") for i in range(5000)]


def test_sha256_mode_matches_python_oracle(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {(r["k"], r["bucket"]): r["rho"]
           for r in hll_registers(df, ["k"], "v", p=6,
                                  hash="sha256").collect()}
    assert got == brute_registers(rows, p=6)


def test_xxhash_mode_same_shape_and_merge(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    regs = hll_registers(df, ["k"], "v", p=6).collect()
    assert all(1 <= r["rho"] <= HASH_BITS - 6 + 1 for r in regs)
    assert all(0 <= r["bucket"] < 64 for r in regs)
    # registers of a union == elementwise max of the parts' registers
    half1 = spark.createDataFrame(rows[:2500], ["k", "v"])
    half2 = spark.createDataFrame(rows[2500:], ["k", "v"])
    merged = {}
    for part in (half1, half2):
        for r in hll_registers(part, ["k"], "v", p=6).collect():
            key = (r["k"], r["bucket"])
            merged[key] = max(merged.get(key, 0), r["rho"])
    assert merged == {(r["k"], r["bucket"]): r["rho"] for r in regs}


def test_estimate_accuracy(spark):
    # 3 groups with known distinct counts: HLL p=8 -> ~6.5% rel error;
    # allow 3 sigma
    rows = [(f"g{g}", f"val{g}_{i}") for g, n in ((0, 100), (1, 1000),
                                                  (2, 5000))
            for i in range(n)]
    df = spark.createDataFrame(rows * 2, ["k", "v"])  # dups: no effect
    regs = hll_registers(df, ["k"], "v", p=8, hash="sha256").collect()
    by_k = {}
    for r in regs:
        by_k.setdefault(r["k"], []).append((r["bucket"], r["rho"]))
    for k, truth in (("g0", 100), ("g1", 1000), ("g2", 5000)):
        est = hll_estimate(by_k[k], p=8)
        assert abs(est - truth) / truth < 0.20, (k, est, truth)


def test_parallelism_invariant(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    a = sorted(map(tuple, hll_registers(
        df.coalesce(1), ["k"], "v", p=6).collect()))
    b = sorted(map(tuple, hll_registers(
        df.repartition(8), ["k"], "v", p=6).collect()))
    assert a == b


def test_guards(spark, rows):
    df = spark.createDataFrame(rows[:10], ["k", "v"])
    with pytest.raises(ValueError):
        hll_registers(df, ["k"], "v", p=2)
    with pytest.raises(ValueError):
        hll_registers(df, ["k"], "v", hash="md5")
    with pytest.raises(ValueError):
        hll_estimate([(0, 1), (0, 2)])


# ---------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------

from collections import Counter

from mergeaddressesandbuildings_spark.operators.sketches import (
    cms_counters, cms_point_estimate,
)


def py_cms_hash(i: int, s: str) -> int:
    return int(hashlib.sha256(f"cms{i}|{s}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def cms_rows():
    # zipf-ish: item j appears ~ 3000/(j+1) times
    out = []
    for j in range(40):
        out += [("g0", f"item{j}", 2)] * (3000 // (j + 1))
    return out


def test_cms_sha256_matches_python_oracle(spark, cms_rows):
    d, w = 4, 32
    df = spark.createDataFrame(cms_rows, ["k", "v", "wt"])
    got = {(r["k"], r["row_i"], r["col"]): r["cnt"]
           for r in cms_counters(df, ["k"], "v", weight_col="wt",
                                 d=d, w=w, hash="sha256").collect()}
    brute = Counter()
    for k, v, wt in cms_rows:
        for i in range(d):
            brute[(k, i, py_cms_hash(i, v) % w)] += wt
    assert got == dict(brute)


def test_cms_never_underestimates_and_bounds(spark, cms_rows):
    d, w = 4, 64
    df = spark.createDataFrame(cms_rows, ["k", "v", "wt"])
    counters = [(r["row_i"], r["col"], r["cnt"])
                for r in cms_counters(df, [], "v", weight_col="wt",
                                      d=d, w=w, hash="sha256").collect()]
    truth = Counter()
    total = 0
    for _, v, wt in cms_rows:
        truth[v] += wt
        total += wt
    import math
    eps_n = math.e / w * total
    over_bound_ok = 0
    for v, t in truth.items():
        est = cms_point_estimate(counters, v, d=d, w=w)
        assert est >= t, (v, est, t)          # CMS never underestimates
        if est <= t + eps_n:
            over_bound_ok += 1
    # the eps*N bound holds with prob 1-(1/2)^d per query; with d=4
    # and 40 queries, allow a couple of exceedances
    assert over_bound_ok >= len(truth) - 2
    # each row's counters sum exactly to the total weight (exactness
    # of the counter matrix, not just the estimate)
    row_sums = Counter()
    for r, _, c in counters:
        row_sums[r] += c
    assert set(row_sums.values()) == {total}


def test_cms_parallelism_invariant_and_modes(spark, cms_rows):
    df = spark.createDataFrame(cms_rows, ["k", "v", "wt"])
    a = sorted(map(tuple, cms_counters(
        df.coalesce(1), ["k"], "v", d=3, w=16).collect()))
    b = sorted(map(tuple, cms_counters(
        df.repartition(8), ["k"], "v", d=3, w=16).collect()))
    assert a == b
    assert all(0 <= col < 16 and 0 <= ri < 3 for _, ri, col, _ in a)
    # unweighted counts sum to the row count per hash row
    n = len(cms_rows)
    sums = Counter()
    for _, ri, _, cnt in a:
        sums[ri] += cnt
    assert set(sums.values()) == {n}


def test_cms_guards(spark, cms_rows):
    df = spark.createDataFrame(cms_rows[:5], ["k", "v", "wt"])
    with pytest.raises(ValueError):
        cms_counters(df, [], "v", d=0)
    with pytest.raises(ValueError):
        cms_counters(df, [], "v", w=1)
    with pytest.raises(ValueError):
        cms_counters(df, [], "v", hash="md5")
    with pytest.raises(ValueError):
        cms_point_estimate([], "x", hash="xxhash64")
