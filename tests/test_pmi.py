"""pmi_pairs (operators/textstats.py) vs a pure-Python PMI oracle:
exact integer threshold semantics, marginals from the bigram corpus,
short-doc guard, parallelism invariance."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from mergeaddressesandbuildings_spark.operators.textstats import pmi_pairs


def brute_pmi(texts, min_count, t):
    big = Counter()
    for s in texts:
        ws = [w for w in s.lower().split(" ") if w]
        big.update(zip(ws, ws[1:]))
    n = sum(big.values())
    cx, cy = Counter(), Counter()
    for (a, b), c in big.items():
        cx[a] += c
        cy[b] += c
    return {
        (a, b): (c, cx[a], cy[b], n)
        for (a, b), c in big.items()
        if c >= min_count and c * n > (1 << t) * cx[a] * cy[b]
    }


@pytest.fixture(scope="module")
def texts():
    # "new york" is a strong collocation; "the", "cat", "dog" fillers
    out = []
    for i in range(60):
        out.append("new york is the big apple in new york")
        out.append(f"the cat{i % 7} sat on the dog{i % 5} mat")
    out += ["hello", "", "one-word", "two words"]
    return out


def test_matches_python_oracle(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    got = {(r["w1"], r["w2"]): (r["c_xy"], r["c_x"], r["c_y"],
                                r["n_bigrams"])
           for r in pmi_pairs(df, min_count=5, threshold_log2=1).collect()}
    want = brute_pmi(texts, 5, 1)
    assert got == want
    assert ("new", "york") in got  # the planted collocation survives
    # and the integer filter means exactly pmi > 1 bit
    for (a, b), (c, cx, cy, n) in got.items():
        assert math.log2(c * n / (cx * cy)) > 1


def test_short_docs_do_not_crash(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "   "), (4, "a b a b a b a b a b")],
        ["doc_id", "text"])
    rows = pmi_pairs(df, min_count=2, threshold_log2=0).collect()
    # only doc 4 has bigrams; (a,b) repeats 5x, (b,a) 4x
    got = {(r["w1"], r["w2"]): r["c_xy"] for r in rows}
    assert got.get(("a", "b")) == 5


def test_parallelism_invariant(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    a = sorted(map(tuple, pmi_pairs(
        df.coalesce(1), 3, 0).collect()))
    b = sorted(map(tuple, pmi_pairs(
        df.repartition(8), 3, 0).collect()))
    assert a == b and len(a) > 0


def test_threshold_guard(spark, texts):
    df = spark.createDataFrame([(0, texts[0])], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pmi_pairs(df, threshold_log2=-1)
