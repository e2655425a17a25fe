"""bpe_train vs a pure-Python classic-BPE oracle (Sennrich-style:
tuple-of-symbols words, explicit left-to-right non-overlapping merge
loop) — independently checks the sentinel-wrapped string-replace
trick, the (freq DESC, a, b) tie-break, and word-frequency weighting.
"""

from __future__ import annotations

from collections import Counter

import pytest

from mergeaddressesandbuildings_spark.operators.bpe import bpe_encode, bpe_train


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


# ----------------------------------------------------------------- encode


def brute_encode(text, merges):
    """Reference ENCODE: the canonical min-rank-first greedy loop
    (GPT-2 encoder shape) — deliberately a DIFFERENT algorithm from
    the engine's rank-ordered replace passes, so parity checks the
    equivalence argument in bpe_encode's docstring, not the code."""
    rank_of = {(a, b): i for i, (_, a, b, _, _) in enumerate(merges)}
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        if not (w.isalpha() and w.islower() and w.isascii()):
            toks.append(w)
            continue
        syms = list(w)
        while len(syms) > 1:
            ranked = [(rank_of[(syms[i], syms[i + 1])], i)
                      for i in range(len(syms) - 1)
                      if (syms[i], syms[i + 1]) in rank_of]
            if not ranked:
                break
            r = min(ranked)[0]
            a, b = [m for m, k in rank_of.items() if k == r][0]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def docs_id_df(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)) + [(len(TEXTS), "")],
        "doc_id bigint, text string")


@pytest.mark.parametrize("mode", ["expr", "arrow"])
def test_encode_matches_brute(spark, docs_id_df, mode):
    merges_rows = brute(TEXTS, 8)
    merges = spark.createDataFrame(
        merges_rows, "rank int, lhs string, rhs string, "
                     "merged string, freq bigint")
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe_encode(docs_id_df, merges, mode=mode).collect()}
    for i, t in enumerate(TEXTS):
        want = brute_encode(t, merges_rows)
        assert got[i] == (want, len(want)), (mode, i, t)
    assert got[len(TEXTS)] == ([], 0)  # empty doc survives with 0 tokens


def test_encode_modes_parity(spark, docs_id_df):
    merges = bpe_train(docs_id_df, n_merges=6)
    a = sorted(map(tuple, bpe_encode(docs_id_df, merges,
                                     mode="expr").collect()))
    b = sorted(map(tuple, bpe_encode(docs_id_df, merges,
                                     mode="arrow").collect()))
    assert a == b


def test_encode_inline_cap(spark, docs_id_df):
    from mergeaddressesandbuildings_spark.operators.bpe import (
        MAX_INLINE_MERGES,
    )

    big = spark.createDataFrame(
        [(i, f"x{i}", "y", f"x{i}y", 1)
         for i in range(1, MAX_INLINE_MERGES + 2)],
        "rank int, lhs string, rhs string, merged string, freq bigint")
    with pytest.raises(ValueError, match="arrow"):
        bpe_encode(docs_id_df, big, mode="expr")
    with pytest.raises(ValueError, match="mode"):
        bpe_encode(docs_id_df, big, mode="nope")


def test_batch_kernel_matches_brute_at_50k_merges():
    """Round-3 verdict task 4: the numpy batch kernel must reproduce
    the canonical min-rank-first greedy loop at production merge-list
    size (50k synthetic merges, many unreachable — the kernel accepts
    arbitrary tables). Pure-kernel test, no Spark."""
    import random

    from mergeaddressesandbuildings_spark.operators.bpe import (
        _make_batch_encoder,
    )

    rng = random.Random(42)
    syms = [chr(c) for c in range(97, 123)]
    merge_rows, seen = [], set()
    while len(merge_rows) < 50_000:
        a, b = rng.choice(syms), rng.choice(syms)
        if (a, b) in seen or len(a) + len(b) > 24:
            continue
        seen.add((a, b))
        merge_rows.append((a, b))
        syms.append(a + b)
    rank_of = {p: i for i, p in enumerate(merge_rows)}

    def brute_min_rank(w):
        s = list(w)
        while len(s) > 1:
            best = None
            for i in range(len(s) - 1):
                r = rank_of.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = merge_rows[best]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    enc = _make_batch_encoder(merge_rows)
    words = ["".join(rng.choice("abcdefgh")
                     for _ in range(rng.randint(1, 30)))
             for _ in range(300)]
    words += ["a" * k for k in range(1, 12)]  # repeated-symbol chains
    words += ["zzqzzq", "xyxyxyxy"]
    got = enc(words)
    assert len(got) == len(words)
    for w, g in zip(words, got):
        assert "".join(g) == w, w  # tokens reassemble the word
        assert g == brute_min_rank(w), w  # exact greedy-order parity
        assert g == brute_min_rank(w), w
    # second call reuses worker-local interning state safely
    assert enc(["abba"])[0] == brute_min_rank("abba")
