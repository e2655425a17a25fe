"""token_budget_sample (operators/sampling.py): absolute per-stratum
token budgets, stable hash ordering, parallelism-invariant membership."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import sampling


def _docs(spark, n=40, parts=1):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("src"),
        (F.lit(10) + F.col("id") % 7).alias("n_tok"),
    )


def test_budget_is_respected_and_tight(spark):
    df = _docs(spark)
    out = sampling.token_budget_sample(
        df, budget=60, tokens_col="n_tok",
        strat=F.col("src"), key=F.col("doc_id"))
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["sort_hash"], r["doc_id"]))
        # every kept row started strictly under budget...
        assert all(r["cum_before"] < 60 for r in rs)
        # ...and they form an exact prefix: cum_before chains
        cum = 0
        for r in rs:
            assert r["cum_before"] == cum
            cum += r["n_tok"]
        # the NEXT doc would have crossed the line (tight, not lazy)
        assert cum >= 60 or len(rs) == 20


def test_membership_is_parallelism_invariant(spark):
    pick = lambda df: sorted(  # noqa: E731
        r["doc_id"] for r in sampling.token_budget_sample(
            df, budget=60, tokens_col="n_tok",
            strat=F.col("src"), key=F.col("doc_id")).collect())
    assert pick(_docs(spark, parts=1)) == pick(_docs(spark, parts=16))
