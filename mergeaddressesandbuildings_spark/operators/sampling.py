"""Deterministic sampling / split operators for training-data
pipelines (driver round spec: first-class large-scale pipeline ops).

All decisions are pure functions of a stable content key — NOT
``rand()`` — so splits are reproducible across runs, engines, cluster
sizes, and re-partitionings (the same property the merge engine's
stable ids rely on, functions/ids_sql.py). The hash is the
sha256-hex-window family both Spark and DuckDB evaluate bit-identically
(ids_sql.sha256_hash60_expr), which makes every operator here
oracle-pairable.

Scale shape: each operator is a pure column expression over the input
scan — no shuffle, no Python, map-side only. A 100 TB split/sample is
exactly as parallel as the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mergeaddressesandbuildings_spark.functions import ids_sql


def split_pct_col(key: Column, prefix: str = "split|") -> Column:
    """Stable percentile bucket 0..99 for a key: hash60(prefix||key) % 100."""
    return ids_sql.sha256_hash60_expr(key.cast("string"), prefix=prefix) % 100


def with_split(df: DataFrame, key: Column,
               train: int = 80, val: int = 10,
               prefix: str = "split|") -> DataFrame:
    """Add ``split_pct`` (stable 0..99) and ``split``
    ('train' | 'val' | 'test') columns. Cuts are [0,train) train,
    [train,train+val) val, rest test."""
    pct = split_pct_col(key, prefix=prefix)
    split = (
        F.when(pct < train, F.lit("train"))
        .when(pct < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split_pct", pct).withColumn("split", split)


def stratified_sample(df: DataFrame, key: Column, strat: Column,
                      fractions: dict[str, float], default: float = 0.0,
                      prefix: str = "sample|") -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    ``hash60(prefix||key) % 10000 < fraction(stratum) * 10000``.
    Exact-rate control per stratum (e.g. downsample dominant languages,
    keep all of a rare one) with zero shuffles and reproducible
    membership."""
    h = ids_sql.sha256_hash60_expr(key.cast("string"), prefix=prefix) % 10000
    thresh = F.lit(int(round(default * 10000)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(strat == value, F.lit(int(round(frac * 10000)))) \
            .otherwise(thresh)
    return df.filter(h < thresh)


def token_budget_sample(df: DataFrame, budget: int, tokens_col: str,
                        strat: Column, key: Column,
                        prefix: str = "budget|") -> DataFrame:
    """Exact-size corpus curation: keep documents per stratum, in
    stable hash order, until a token budget is exhausted — a row is
    kept iff the cumulative token count of the rows BEFORE it (hash
    order, key tiebreak) is under ``budget``. Unlike the rate-based
    samplers above, this pins the ABSOLUTE number of tokens drawn from
    each stratum (the "2B tokens of wiki, 500M of forums" recipe),
    and the hash ordering makes the drawn set reproducible across
    runs, engines, and cluster sizes.

    Adds ``sort_hash`` (the 60-bit order key) and ``cum_before``
    columns. One window shuffle keyed by the stratum; for a stratum
    too hot for one partition, the range-partitioned distributed
    prefix sum in operators/packing.py is the drop-in template."""
    from pyspark.sql import Window

    h = ids_sql.sha256_hash60_expr(key.cast("string"), prefix=prefix)
    out = df.withColumn("sort_hash", h)
    w = Window.partitionBy(strat).orderBy(F.col("sort_hash").asc(),
                                          key.asc())
    cum_before = (F.sum(F.col(tokens_col)).over(w)
                  - F.col(tokens_col)).cast("long")
    return (
        out.withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") < budget)
    )


def apportion_budget(df: DataFrame, budget: int, tokens_col: str,
                     strat: Column, key: Column,
                     prefix: str = "budget|") -> DataFrame:
    """Proportional data-mixing: split one GLOBAL token budget across
    sources by the largest-remainder (Hamilton) method, then draw each
    source's quota deterministically.

    ``token_budget_sample`` pins per-source budgets you choose by
    hand; this derives them from the corpus itself — source s with
    n_s tokens of N total gets

        quota_s = floor(B * n_s / N)  (+1 token for each of the
                  r = B - sum(floor quotas) sources with the largest
                  remainder (B * n_s) mod N, ties broken by source)

    so sum(quota_s) == B EXACTLY (Hamilton's invariant: the floors
    sum to B - r with 0 <= r < S) and every step is integer
    arithmetic — engine-exact, no float proportions, oracle-pairable.
    Documents are then drawn per source in stable hash order until
    the quota is exhausted (the same greedy-prefix rule as
    ``token_budget_sample``: kept iff ``cum_before < quota``).

    Scale shape: one map-side-combinable agg to S source totals, the
    Hamilton arithmetic windowed over that S-row table (S is at most
    thousands — the single-partition window there is bounded
    metadata, like lm.py's corpus constants), a broadcast join of
    quotas back to the scan, and ONE window shuffle keyed by source
    for the prefix sums. Overflow: B * n_s must fit a signed 64-bit —
    keep B * N < 2^63 (apportion in kilotoken units beyond that).

    → input columns + ``quota``, ``sort_hash``, ``cum_before``,
    filtered to the drawn documents.
    """
    if budget < 0:
        raise ValueError("budget must be non-negative")
    from pyspark.sql import Window

    b = F.lit(budget).cast("long")
    totals = df.groupBy(strat.alias("__src")).agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__n"))
    w_all = Window.partitionBy()  # S rows: bounded
    w_rem = Window.orderBy(F.col("__rem").desc(), F.col("__src").asc())
    quotas = (
        totals
        .withColumn("__ntot", F.sum("__n").over(w_all).cast("long"))
        .withColumn("__b", b)
        # integer floor division (DIV) + pmod, NOT double /: (B*n)/N
        # as doubles is inexact above 2^53. NB "__ntot", not "__N":
        # Spark resolves column names case-insensitively, so "__N"
        # would silently REPLACE "__n" in withColumn
        .withColumn("__floor", F.expr("__b * __n DIV __ntot"))
        .withColumn("__rem", F.expr("pmod(__b * __n, __ntot)"))
        .withColumn("__r", (b - F.sum("__floor").over(w_all)).cast("long"))
        .withColumn("__rank", F.row_number().over(w_rem))
        .withColumn(
            "quota",
            (F.col("__floor")
             + F.when(F.col("__rank") <= F.col("__r"), 1).otherwise(0))
            .cast("long"))
        .select("__src", "quota")
    )
    h = ids_sql.sha256_hash60_expr(key.cast("string"), prefix=prefix)
    w = Window.partitionBy(strat).orderBy(F.asc("sort_hash"), key.asc())
    out = (
        df.join(F.broadcast(quotas), on=strat == F.col("__src"))
        .drop("__src")
        .withColumn("sort_hash", h)
    )
    cum_before = (F.sum(F.col(tokens_col)).over(w)
                  - F.col(tokens_col)).cast("long")
    return (
        out.withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") < F.col("quota"))
    )
