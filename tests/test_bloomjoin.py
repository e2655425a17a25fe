"""Bloom semi-join pruning (operators/bloomjoin.py): bitmap parity vs
a pure-Python oracle, the no-false-negative guarantee, end-to-end
equality with a plain semi join, real pruning power, and the
broadcast plan shape."""

from __future__ import annotations

import hashlib

import pytest

from mergeaddressesandbuildings_spark.operators.bloomjoin import (
    bloom_build, bloom_prune, bloom_semi_join,
)


def py_pos(i: int, s: str, m_bits: int) -> int:
    return int(hashlib.sha256(
        f"bloom{i}|{s}".encode()).hexdigest()[:15], 16) % m_bits


M, K = 4096, 4


@pytest.fixture(scope="module")
def sides(spark):
    build = spark.createDataFrame(
        [(f"key{j * 13}",) for j in range(100)], ["bk"])
    probe = spark.createDataFrame(
        [(f"key{j}", j) for j in range(5000)], ["pk", "payload"])
    return build, probe


def test_bitmap_matches_python_oracle(spark, sides):
    build, _ = sides
    words = {}
    for j in range(100):
        for i in range(K):
            p = py_pos(i, f"key{j * 13}", M)
            words[p >> 6] = words.get(p >> 6, 0) | (1 << (p & 63))
    # python builds an unsigned word; Spark's BIGINT is signed
    signed = {w: m - (1 << 64) if m >= (1 << 63) else m
              for w, m in words.items()}
    got = {r["word_idx"]: r["mask"]
           for r in bloom_build(build, "bk", M, K,
                                hash="sha256").collect()}
    assert got == signed


def test_no_false_negatives_and_prune_power(spark, sides):
    build, probe = sides
    for mode in ("sha256", "xxhash64"):
        bm = bloom_build(build, "bk", M, K, hash=mode)
        kept = set(r["pk"] for r in
                   bloom_prune(probe, "pk", bm, M, K, hash=mode).collect())
        true = {f"key{j * 13}" for j in range(100)} & {
            f"key{j}" for j in range(5000)}
        assert true <= kept, mode  # every real match survives the prune
        # 100 keys in 4096 bits, k=4 -> fp rate ~7e-5; allow slack
        assert len(kept) <= len(true) + 5, mode


def test_semi_join_equals_plain_semi(spark, sides):
    build, probe = sides
    got = sorted(map(tuple, bloom_semi_join(
        probe, build, "pk", "bk", M, K).collect()))
    want = sorted(map(tuple, probe.join(
        build.distinct(), on=probe["pk"] == build["bk"],
        how="left_semi").collect()))
    assert got == want and len(got) > 0


def test_prune_is_broadcast_jvm_only(spark, sides):
    build, probe = sides
    bm = bloom_build(build, "bk", M, K)
    plan = bloom_prune(probe, "pk", bm, M, K)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_param_guards(spark, sides):
    build, probe = sides
    with pytest.raises(ValueError):
        bloom_build(build, "bk", m_bits=32)
    with pytest.raises(ValueError):
        bloom_build(build, "bk", k=0)
    with pytest.raises(ValueError):
        bloom_build(build, "bk", hash="md5")
