"""BM25 inverted-index search (operators/search.py) vs a brute-force
Python oracle computing the same formula, plus plan-shape asserts
(everything broadcasts; no cartesian, no Python UDF).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import search

DOCS = [
    (0, "fast hash join beats slow sort merge join"),
    (1, "the stream window closes  fast"),          # double space → empty tok
    (2, "hash hash hash table scan"),
    (3, "merge sort window stream stream"),
    (4, "zebra"),                                   # matches nothing asked
]
QUERIES = [(1, "fast hash"), (2, "stream window"), (3, "missing terms")]


def py_bm25(docs, queries, k=5, k1=1.2, b=0.75):
    toks = {d: [t for t in txt.lower().split(" ") if t] for d, txt in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = []
    for qid, qtext in queries:
        qterms = {t for t in qtext.lower().split(" ") if t}
        scores = {}
        for d, ts in toks.items():
            s = 0.0
            for t in qterms:
                tf = ts.count(t)
                if not tf:
                    continue
                df = sum(1 for v in toks.values() if t in v)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl))
            if s:
                scores[d] = round(s * 1000)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, d, r + 1, s) for r, (d, s) in enumerate(ranked)]
    return sorted(out)


def _run(spark, k=5):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    got = search.bm25_topk(d, q, k=k)
    return sorted(tuple(r) for r in got.collect())


def test_bm25_matches_python_oracle(spark):
    assert _run(spark) == py_bm25(DOCS, QUERIES)


def test_bm25_k_truncates_and_absent_query_emits_nothing(spark):
    got = _run(spark, k=1)
    oracle = py_bm25(DOCS, QUERIES, k=1)
    assert got == oracle
    assert not [r for r in got if r[0] == 3]  # no term of q3 exists
    assert all(r[2] == 1 for r in got)


def test_bm25_plan_is_broadcast_shaped(spark):
    from tests.test_plan_shape import explain

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    plan = explain(search.bm25_topk(d, q))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_build_index_postings(spark):
    d = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["dl"])
            for r in search.build_index(d).collect()}
    assert rows[(2, "hash")] == (3, 5)
    assert rows[(0, "join")] == (2, 8)
    assert rows[(1, "fast")] == (1, 5)  # empty token dropped from dl
