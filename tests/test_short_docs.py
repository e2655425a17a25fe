"""Short-document robustness (round-3 advisor findings): real corpora
always contain empty/1-word documents, and descending F.sequence()
ranges previously made repetition_stats and every shingle-based dedup
pipeline throw INVALID_ARRAY_INDEX / INVALID_PARAMETER_VALUE.START on
them while the DuckDB oracles (empty range) returned normally."""

from __future__ import annotations

import pandas as pd

from mergeaddressesandbuildings_spark.operators import doc_dedupe, textstats


def _docs(spark, texts):
    rows = [{"doc_id": i, "lang": "en", "text": t} for i, t in enumerate(texts)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_repetition_stats_short_docs_drop_not_crash(spark):
    docs = _docs(spark, ["", "hello", "a b a b", "one two"])
    got = {r["doc_id"]: r.asDict() for r in textstats.repetition_stats(docs).collect()}
    # bigram-less docs (<2 words) are dropped — the oracle's inner-join
    # semantics — and multi-word docs still produce exact counts
    assert set(got) == {2, 3}
    assert got[2]["top_bigram_n"] == 2 and got[2]["n_bigrams"] == 3
    assert got[3]["once_words"] == 2 and got[3]["n_distinct_words"] == 2


def test_shingles_short_docs_empty_not_crash(spark):
    docs = _docs(spark, ["", "hello", "a b c"])
    got = doc_dedupe.shingles(docs, n=2).collect()
    assert {r["doc_id"] for r in got} == {2}
    assert sorted(r["shingle"] for r in got) == ["a b", "b c"]


def test_minhash_pipeline_survives_short_docs(spark):
    """End-to-end MinHash→LSH→verify over a corpus containing empty and
    1-word docs: must not throw, and must still find the planted dup."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, ["", "hi", base, base + " tail"])
    pairs = doc_dedupe.minhash_lsh_dedupe(docs, threshold=0.5).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(2, 3)]


def test_ngram_pairs_survive_short_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = _docs(spark, ["solo", base, base])
    got = doc_dedupe.ngram_jaccard_pairs(docs, n=2, min_common=10).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]


def test_quality_filter_verdicts(spark):
    """Composite filter: every input doc gets exactly one verdict row
    (LEFT-join semantics keep bigram-less docs), and rule provenance
    fires as specified."""
    good = "key alpha beta gamma delta agg epsilon zeta row eta theta scan"
    docs = _docs(spark, [
        "",                       # too_short (+mean_word_short, no_stopword)
        "hi",                     # too_short + no_stopword
        good,                     # keep
        "x " * 499 + "x",         # 500 1-char words: mean_word_short...
        ("key agg " * 50).strip(),  # heavy bigram repetition
    ])
    got = {r["doc_id"]: r for r in textstats.quality_filter(docs).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[2]["keep"] is True and got[2]["reasons"] == ""
    assert "too_short" in got[0]["reasons"]
    assert "too_short" in got[1]["reasons"]
    assert got[3]["keep"] is False
    assert "mean_word_short" in got[3]["reasons"]
    assert "low_once_ratio" in got[3]["reasons"]
    assert "top_bigram_heavy" in got[4]["reasons"]


def test_quality_filter_null_text_is_too_short(spark):
    """NULL text must be DROPPED (too_short), not silently kept: a null
    n_words would otherwise skip every rule and pass the filter."""
    import pandas as pd

    rows = pd.DataFrame([{"doc_id": 0, "lang": "en", "text": None},
                         {"doc_id": 1, "lang": "en", "text": "hi"}])
    rows["text"] = rows["text"].astype(object)
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in textstats.quality_filter(docs).collect()}
    assert got[0]["keep"] is False and "too_short" in got[0]["reasons"]
    assert "too_short" in got[1]["reasons"]


def test_line_repetition_stats_exact(spark):
    """Gopher dup-line mass: hand-computed integer pairs, incl. the
    all-unique, all-duplicate, empty-line and single-line edges."""
    docs = spark.createDataFrame(
        [
            (1, "a\nb\nc"),            # no dups
            (2, "x\nx\nx"),            # 2 dup instances of 'x'
            (3, "ab\ncd\nab\n\n\ncd"), # dups: ab(+1), cd(+1), ''(+1)
            (4, "solo"),               # single line, no separator
            (5, ""),                   # split('') -> one empty line
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in textstats.line_repetition_stats(docs).collect()}
    assert got[1] == {"doc_id": 1, "n_lines": 3, "dup_line_instances": 0,
                      "n_line_chars": 3, "dup_line_chars": 0}
    assert got[2] == {"doc_id": 2, "n_lines": 3, "dup_line_instances": 2,
                      "n_line_chars": 3, "dup_line_chars": 2}
    assert got[3] == {"doc_id": 3, "n_lines": 6, "dup_line_instances": 3,
                      "n_line_chars": 8, "dup_line_chars": 4}
    assert got[4] == {"doc_id": 4, "n_lines": 1, "dup_line_instances": 0,
                      "n_line_chars": 4, "dup_line_chars": 0}
    assert got[5] == {"doc_id": 5, "n_lines": 1, "dup_line_instances": 0,
                      "n_line_chars": 0, "dup_line_chars": 0}


def test_line_repetition_stats_word_mode(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam ham")], "doc_id long, text string")
    r = textstats.line_repetition_stats(docs, sep=" ").collect()[0]
    assert (r["n_lines"], r["dup_line_instances"]) == (4, 2)
    assert (r["n_line_chars"], r["dup_line_chars"]) == (15, 8)


def test_line_repetition_stats_literal_metachar_sep(spark):
    """sep is matched literally (\\Q-quoted), not as a Java regex: "."
    must split on the DOT, not on every character, and "|" on the PIPE,
    not on the empty alternation — the DuckDB oracle's string_split
    semantics."""
    docs = spark.createDataFrame(
        [(1, "ab.cd.ab"), (2, "x|x|y")], "doc_id long, text string")
    dot = {r["doc_id"]: r.asDict()
           for r in textstats.line_repetition_stats(docs, sep=".").collect()}
    assert dot[1] == {"doc_id": 1, "n_lines": 3, "dup_line_instances": 1,
                      "n_line_chars": 6, "dup_line_chars": 2}
    pipe = textstats.line_repetition_stats(docs, sep="|").collect()
    r2 = next(r for r in pipe if r["doc_id"] == 2)
    assert (r2["n_lines"], r2["dup_line_instances"]) == (3, 1)


def test_line_repetition_stats_null_text(spark):
    """NULL text yields NULL stats (not size(NULL) = -1 leaking in as a
    line count)."""
    import pandas as pd

    rows = pd.DataFrame([{"doc_id": 1, "text": None},
                         {"doc_id": 2, "text": "a\na"}])
    rows["text"] = rows["text"].astype(object)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in textstats.line_repetition_stats(docs).collect()}
    assert got[1] == {"doc_id": 1, "n_lines": None,
                      "dup_line_instances": None, "n_line_chars": None,
                      "dup_line_chars": None}
    assert got[2]["dup_line_instances"] == 1
