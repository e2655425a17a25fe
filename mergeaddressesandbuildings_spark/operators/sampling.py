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
