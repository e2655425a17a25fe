"""Corpus search over the documents table: distributed inverted index
+ BM25 top-k ranking (SURVEY.md §2 webpipe family).

A curation pipeline needs keyword retrieval over the corpus it is
building — contamination audits ("which documents score high for this
benchmark question"), targeted quality probes, dataset cards. The
operator set is the classic two-phase shape, all JVM expressions:

1. ``build_index``: token length ``dl`` is computed BEFORE the
   explode (so it rides the groupBy keys — no per-doc window pass),
   then one map-side-combinable hash agg → ``(doc_id, term, tf, dl)``
   postings. ONE shuffle for the whole index.
2. ``bm25_topk``: the (tiny) query-term set is broadcast against the
   postings on ``term`` — the corpus-sized side is filtered before
   anything else happens to it; document frequencies are aggregated
   from the already-filtered postings (map-side combine keeps hot
   terms from skewing the term shuffle, and Catalyst's ReuseExchange
   dedupes the shared postings subtree). Corpus-level constants
   (``n_docs``, ``sum_dl``) come straight off the docs table with no
   shuffle; ``avgdl`` is derived as ``sum_dl / n_docs`` from EXACT
   integer totals so both engines divide identical numbers.

Determinism contract (what lets the driver hash-check this against a
DuckDB oracle): the final score is quantized to milli-units
(``ROUND(score * 1000) AS BIGINT``) BEFORE ranking, and ties break on
``doc_id`` — so rank order never depends on sub-milli double noise
(ln() may differ by 1 ulp between JVM and libm, and Spark's partial-
agg sum order is nondeterministic; both effects are ~1e-13 relative,
far under the quantum — the same rounding contract
doc_lm_perplexity's oracle pairing uses). Tokenization is a bare
lowercase split on single spaces, mirrored exactly by the oracle's
``string_split(lower(text), ' ')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_index", "bm25_topk"]


def _tokens(text: F.Column) -> F.Column:
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def build_index(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Inverted-index postings: one row per (doc, term) with the term
    frequency ``tf`` and the document's token length ``dl``."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens(F.col(text_col)).alias("toks"),
        )
        .select("doc_id", F.size("toks").alias("dl"),
                F.explode("toks").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
        .select("doc_id", "term", "tf", "dl")
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 5,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_id_col: str = "query_id",
              query_text_col: str = "qtext") -> DataFrame:
    """BM25 top-k per query → ``(query_id, doc_id, rank, score_milli)``.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the non-negative
    Robertson-Sparck Jones form); per-term contribution
    ``idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))``.
    ``queries`` must be small (it becomes a broadcast build side);
    the corpus side streams and is term-filtered before any shuffle.
    """
    postings = build_index(docs, text_col, id_col)
    # corpus constants: one bounded-metadata collect (2 numbers — the
    # lm.py vocab-size pattern), embedded as literals so the scoring
    # plan carries no constant-key join (which Catalyst would fold
    # into a nested-loop). avgdl = exact-int sum / exact-int count is
    # the same IEEE division the oracle performs — identical bits.
    n_docs, sum_dl = docs.select(
        F.size(_tokens(F.col(text_col))).alias("dl")
    ).agg(F.count("*").alias("n_docs"),
          F.sum("dl").alias("sum_dl")).collect()[0]
    avgdl = sum_dl / n_docs

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.split(F.lower(F.col(query_text_col)), " "))
            .alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    term_set = qterms.select("term").distinct()
    matched = postings.join(F.broadcast(term_set), "term")
    # df per query term, from the already-filtered postings (a term's
    # postings row count IS its document frequency)
    df_ = matched.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        matched
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .withColumn(
            "idf",
            F.log(F.lit(1.0)
                  + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5))),
        )
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
        .withColumn("score_milli",
                    F.round(F.col("score") * 1000).cast("long"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id",
                F.col("rank").cast("int").alias("rank"), "score_milli")
    )
