"""Similarity search over an embedding column (driver round spec:
brute-force cosine top-k baseline + an LSH-bucketed scale path).

Exactness discipline: dot products are sequential left-to-right folds
over double-cast elements (F.aggregate), so the value is bit-identical
to any other engine doing the same fold — which is exactly how the
DuckDB oracle is written (list_transform+list_sum). Top-k ties break on
vec_id.

Scale path: random-hyperplane LSH buckets (sign-bit sketch) — the join
becomes an equi-join on (plane-bucket), brute force only within bucket.
At 10^12 rows the baseline is infeasible; the bucketed variant's plan
(hash partition on bucket → per-bucket kernel) is the one that survives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a) -> F.Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(embeddings: DataFrame, queries: DataFrame,
                           k: int = 3) -> DataFrame:
    """Exact top-k cosine per query vector.

    queries(qid, q_embedding) is expected to be small → broadcast; the
    big side streams, never shuffles (map-side join + per-query window).
    """
    q = F.broadcast(queries.select(
        F.col("qid"), F.col("q_embedding"),
        _norm2(F.col("q_embedding")).alias("_qn"),
    ))
    scored = embeddings.crossJoin(q).filter(F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        (
            _dot(F.col("embedding"), F.col("q_embedding"))
            / F.sqrt(_norm2(F.col("embedding")) * F.col("_qn"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("cosine", 6).alias("cosine_r6"))
    )


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 8,
                       dim: int = 64, seed: int = 7) -> DataFrame:
    """Sign-bit LSH bucket per vector (Arrow kernel: one matmul per
    batch against a fixed random-plane matrix)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (batch, dim)
        signs = (m @ planes) >= 0.0  # (batch, n_planes)
        vals = (signs.astype(np.int64) * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
        return pd.Series(vals)

    return embeddings.withColumn("bucket", bucket(F.col("embedding")))


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                    n_planes: int = 6, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket — shuffles only bucket-partitioned
    vectors, never the full cross product)."""
    e_b = hyperplane_buckets(embeddings, n_planes, dim)
    q_b = hyperplane_buckets(
        queries.select(F.col("qid").alias("vec_id"), F.col("q_embedding").alias("embedding")),
        n_planes, dim,
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding"), "bucket")
    joined = e_b.join(F.broadcast(q_b), "bucket").filter(F.col("vec_id") != F.col("qid"))
    scored = joined.select(
        "qid", "vec_id",
        (
            _dot(F.col("embedding"), F.col("q_embedding"))
            / F.sqrt(_norm2(F.col("embedding")) * _norm2(F.col("q_embedding")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("cosine", 6).alias("cosine_r6"))
    )
