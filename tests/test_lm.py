"""Bigram LM training + perplexity scoring (operators/lm.py):
hand-computed counts and cross-entropies on a tiny corpus, smoothing
fallbacks for unseen bigrams/contexts, short-doc drop semantics."""

from __future__ import annotations

import math

import pytest

from mergeaddressesandbuildings_spark.operators import lm


def _train(spark):
    ref = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran")],
        "doc_id long, text string")
    return lm.train_bigram_lm(ref)


def test_train_counts_and_vocab(spark):
    c12, c1, v = _train(spark)
    got12 = {(r["w1"], r["w2"]): r["c12"] for r in c12.collect()}
    assert got12 == {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}
    got1 = {r["w1"]: r["c1"] for r in c1.collect()}
    assert got1 == {"the": 2, "cat": 2}
    # continuation vocabulary: cat, sat, ran
    assert v == 3


def test_perplexity_hand_computed(spark):
    c12, c1, v = _train(spark)
    docs = spark.createDataFrame(
        [(10, "the cat sat"),       # all seen
         (11, "the dog"),           # seen context 'the', unseen bigram
         (12, "zz yy"),             # unseen context entirely
         (13, "one")],              # <2 words: dropped
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in lm.perplexity(docs, c12, c1, v, k=0.5).collect()}
    assert set(out) == {10, 11, 12}

    p_the_cat = (2 + 0.5) / (2 + 0.5 * 3)
    p_cat_sat = (1 + 0.5) / (2 + 0.5 * 3)
    h10 = -(math.log(p_the_cat) + math.log(p_cat_sat)) / 2
    assert out[10]["n_bigrams"] == 2
    assert out[10]["cross_entropy"] == pytest.approx(h10, rel=1e-12)
    assert out[10]["ppl"] == pytest.approx(math.exp(h10), rel=1e-12)

    h11 = -math.log((0 + 0.5) / (2 + 0.5 * 3))
    assert out[11]["cross_entropy"] == pytest.approx(h11, rel=1e-12)

    # unseen context: P = k / (0 + k*V) = 1/V
    h12 = -math.log(1 / 3)
    assert out[12]["cross_entropy"] == pytest.approx(h12, rel=1e-12)
    # and gibberish scores strictly worse than in-domain text
    assert out[12]["ppl"] > out[10]["ppl"]
