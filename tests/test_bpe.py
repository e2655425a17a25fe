"""bpe_train vs a pure-Python classic-BPE oracle (Sennrich-style:
tuple-of-symbols words, explicit left-to-right non-overlapping merge
loop) — independently checks the sentinel-wrapped string-replace
trick, the (freq DESC, a, b) tie-break, and word-frequency weighting.
"""

from __future__ import annotations

from collections import Counter

import pytest

from mergeaddressesandbuildings_spark.operators.bpe import bpe_train


def brute(texts, n_merges, pattern_alpha=True):
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w and w.isalpha() and w.islower() and w.isascii():
                vocab[tuple(w)] += 1
    out = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), freq = min(pairs.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, a + b, freq))
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] += cnt
        vocab = new_vocab
    return out


TEXTS = [
    "the cat sat on the mat with the bat",
    "banana bandana banana cabana",
    "lower newer lowest newest low new",
    "aaa aaaa aa a",
    "the the the them theme",
    "xyz 123 MIXED Case-Words stay out",
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], ["text"])


@pytest.mark.parametrize("m", [1, 6, 12])
def test_matches_brute_oracle(spark, docs_df, m):
    got = [tuple(r) for r in bpe_train(docs_df, n_merges=m)
           .orderBy("rank").collect()]
    assert got == brute(TEXTS, m)


def test_repeated_symbol_merge_is_left_to_right(spark):
    # "aaaa" under merge (a,a): classic BPE -> [aa, aa]; the wrapped
    # string-replace must NOT stop after one merge per word
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], ["text"])
    got = [tuple(r) for r in bpe_train(df, n_merges=2)
           .orderBy("rank").collect()]
    # round 1: (a,a) freq = 3 words * 3 adjacent pairs = 9
    assert got[0] == (1, "a", "a", "aa", 9)
    # round 2: words are [aa, aa] -> (aa, aa) freq 3
    assert got[1] == (2, "aa", "aa", "aaaa", 3)


def test_exhausted_corpus_stops_early(spark):
    df = spark.createDataFrame([("ab ab",)], ["text"])
    got = bpe_train(df, n_merges=10).collect()
    # after (a,b) every word is a single symbol: no pairs remain
    assert len(got) == 1 and got[0]["merged"] == "ab"


def test_parallelism_invariant(spark, docs_df):
    a = [tuple(r) for r in bpe_train(docs_df.coalesce(1), 6)
         .orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_train(docs_df.repartition(8), 6)
         .orderBy("rank").collect()]
    assert a == b


def test_n_merges_guard(spark, docs_df):
    with pytest.raises(ValueError):
        bpe_train(docs_df, n_merges=0)
