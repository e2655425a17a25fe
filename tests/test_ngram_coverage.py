"""duplicated_ngram_coverage vs a brute-force pure-Python oracle.

The oracle materializes every interval [i, i+n-1] whose n-gram occurs
>= min_count times corpus-wide and unions them per doc — no
gaps-and-islands shortcut — so it independently checks the lag-window
union arithmetic, the short-doc guard, and internal-repetition
counting.
"""

from __future__ import annotations

from collections import Counter

import pytest

from mergeaddressesandbuildings_spark.operators.doc_dedupe import (
    duplicated_ngram_coverage,
)

DOCS = [
    # d1/d2 share a long run; d3 is unique; d4 repeats itself
    ("d1", "the quick brown fox jumps over the lazy dog tonight"),
    ("d2", "once more the quick brown fox jumps over the fence"),
    ("d3", "completely unrelated text with no overlap whatsoever here"),
    ("d4", "spam spam spam spam spam spam spam spam spam spam"),
    ("d5", "tiny"),          # < n tokens: zero grams
    ("d6", ""),              # split('') -> [''] : 1 token, zero grams
    ("d7", "a b c d e"),     # exactly n tokens, unique
]


def brute(docs, n=5, min_count=2):
    census = Counter()
    toks = {d: t.split(" ") for d, t in docs}
    for d, t in docs:
        w = toks[d]
        for i in range(len(w) - n + 1):
            census[" ".join(w[i:i + n])] += 1
    out = {}
    for d, t in docs:
        w = toks[d]
        covered = set()
        for i in range(len(w) - n + 1):
            if census[" ".join(w[i:i + n])] >= min_count:
                covered.update(range(i, i + n))
        out[d] = (len(w), len(covered))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.mark.parametrize("n", [2, 5])
def test_matches_brute_oracle(spark, docs_df, n):
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicated_ngram_coverage(docs_df, n=n).collect()
    }
    assert got == brute(DOCS, n=n)


def test_hashed_mode_same_answer(spark, docs_df):
    plain = sorted(map(tuple, duplicated_ngram_coverage(
        docs_df, n=3, hashed=False).collect()))
    fast = sorted(map(tuple, duplicated_ngram_coverage(
        docs_df, n=3, hashed=True).collect()))
    assert plain == fast


def test_internal_repetition_counts(spark, docs_df):
    got = {r["doc_id"]: r["dup_tokens"]
           for r in duplicated_ngram_coverage(docs_df, n=5).collect()}
    # d4 is 10x the same word: every 5-gram identical -> fully covered
    assert got["d4"] == 10
    # short and empty docs survive with zero coverage
    assert got["d5"] == 0 and got["d6"] == 0


def test_parallelism_invariant(spark, docs_df):
    a = sorted(map(tuple, duplicated_ngram_coverage(
        docs_df.coalesce(1), n=3).collect()))
    b = sorted(map(tuple, duplicated_ngram_coverage(
        docs_df.repartition(8), n=3).collect()))
    assert a == b
