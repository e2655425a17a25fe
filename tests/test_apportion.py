"""apportion_budget (operators/sampling.py): Hamilton largest-
remainder quotas vs a pure-Python oracle, the sum(quota)==B
invariant, greedy-prefix draw semantics, parallelism invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators.sampling import (
    apportion_budget,
)


def py_hash(doc_id) -> int:
    return int(hashlib.sha256(
        f"budget|{doc_id}".encode()).hexdigest()[:15], 16)


def brute(rows, budget):
    # rows: (doc_id, src, tokens)
    totals = {}
    for _, s, t in rows:
        totals[s] = totals.get(s, 0) + t
    n = sum(totals.values())
    fl = {s: budget * t // n for s, t in totals.items()}
    rem = {s: budget * t % n for s, t in totals.items()}
    r = budget - sum(fl.values())
    order = sorted(totals, key=lambda s: (-rem[s], s))
    quota = {s: fl[s] + (1 if i < r else 0) for i, s in enumerate(order)}
    kept = set()
    for s in totals:
        cum = 0
        for d, _, t in sorted((x for x in rows if x[1] == s),
                              key=lambda x: (py_hash(x[0]), x[0])):
            if cum < quota[s]:
                kept.add(d)
            cum += t
    return quota, kept


@pytest.fixture(scope="module")
def rows():
    # skewed sources: src0 huge, src3 tiny — quotas must track shares
    out = []
    did = 0
    for s, n_docs, tok in (("src0", 60, 40), ("src1", 25, 30),
                           ("src2", 12, 25), ("src3", 3, 11)):
        for i in range(n_docs):
            out.append((did, s, tok + (did * 7) % 13))
            did += 1
    return out


def test_matches_python_oracle(spark, rows):
    budget = 700
    df = spark.createDataFrame(rows, ["doc_id", "src", "tok"])
    out = apportion_budget(df, budget, "tok",
                           F.col("src"), F.col("doc_id")).collect()
    quota, kept = brute(rows, budget)
    assert {r["doc_id"] for r in out} == kept
    assert {(r["src"], r["quota"]) for r in out} <= set(quota.items())
    assert sum(quota.values()) == budget  # Hamilton invariant
    # quotas proportional to shares: big source gets the biggest slice
    assert quota["src0"] > quota["src1"] > quota["src3"]


def test_parallelism_invariant(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "src", "tok"])
    a = sorted(map(tuple, apportion_budget(
        df.coalesce(1), 500, "tok",
        F.col("src"), F.col("doc_id")).collect()))
    b = sorted(map(tuple, apportion_budget(
        df.repartition(8), 500, "tok",
        F.col("src"), F.col("doc_id")).collect()))
    assert a == b and len(a) > 0


def test_budget_edge_cases(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "src", "tok"])
    assert apportion_budget(df, 0, "tok", F.col("src"),
                            F.col("doc_id")).count() == 0
    with pytest.raises(ValueError):
        apportion_budget(df, -1, "tok", F.col("src"), F.col("doc_id"))
    # budget of exactly 1: one source gets the whole seat, one doc out
    one = apportion_budget(df, 1, "tok", F.col("src"),
                           F.col("doc_id")).collect()
    assert len(one) == 1 and one[0]["quota"] == 1
