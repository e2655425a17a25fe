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


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a < b, cosine ≥ t).

    O(n²) baseline — correct at any n, feasible only on a capped subset;
    the LSH variant below is the 100 TB path. Norms are precomputed once
    per side (cheap vs recomputing inside the pair filter).
    """
    lhs = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
        _norm2(F.col("embedding")).alias("_na"),
    )
    rhs = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
        _norm2(F.col("embedding")).alias("_nb"),
    )
    pairs = lhs.join(rhs, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b",
            (_dot(F.col("emb_a"), F.col("emb_b"))
             / F.sqrt(F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine_r6"))
    )


def cosine_near_dup_lsh(embeddings: DataFrame, threshold: float = 0.95,
                        n_planes: int = 8, dim: int = 64,
                        n_tables: int = 4) -> DataFrame:
    """Scale path: near-dup pairs via multi-table hyperplane LSH.

    Each of ``n_tables`` independent plane sets buckets every vector;
    candidate pairs = same (table, bucket) — an equi-join whose shuffle
    moves each vector n_tables times, vs n² for brute force. Exact
    cosine refine + distinct de-dups pairs found by multiple tables.
    High-cosine pairs collide with prob (1 − θ/π)^planes per table;
    multiple tables recover the recall the per-table AND-construction
    costs.
    """
    tabbed = None
    for t in range(n_tables):
        b = hyperplane_buckets(embeddings, n_planes, dim, seed=7 + 13 * t) \
            .withColumn("table", F.lit(t))
        tabbed = b if tabbed is None else tabbed.unionByName(b)
    lhs = tabbed.select(
        "table", "bucket", F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    rhs = tabbed.select(
        "table", "bucket", F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    cands = (
        lhs.join(rhs, ["table", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "emb_a", "emb_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cands.select(
            "vec_a", "vec_b",
            (_dot(F.col("emb_a"), F.col("emb_b"))
             / F.sqrt(_norm2(F.col("emb_a")) * _norm2(F.col("emb_b")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine_r6"))
    )


def _seed_centroids(n_centroids: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def train_ivf_centroids(embeddings: DataFrame, n_centroids: int = 16,
                        dim: int = 64, n_iter: int = 2,
                        seed: int = 11) -> np.ndarray:
    """Spherical k-means for the IVF coarse quantizer — a few
    DISTRIBUTED Lloyd iterations (deterministic seed init):

    - assign: one matmul per Arrow batch (the same kernel ivf_assign
      uses) — no shuffle of the vectors themselves;
    - update: per-dimension sums via ``posexplode`` + hash aggregate
      (map-side combinable; shuffle volume = n_centroids × dim rows),
      collected to the driver (tiny) and renormalized to the sphere.
      Empty clusters keep their previous centroid.

    At 10^12 rows one would train on a sample; the plan shape (matmul
    assign + cell-keyed aggregate) is unchanged by sampling.
    """
    cents = _seed_centroids(n_centroids, dim, seed)
    for _ in range(n_iter):
        assigned = _with_nearest_list(embeddings, cents)
        rows = (
            assigned.select(
                "ivf_list", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("ivf_list", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        acc = np.zeros((n_centroids, dim))
        cnt = np.zeros(n_centroids)
        for r in rows:
            acc[r["ivf_list"], r["pos"]] = r["s"]
            cnt[r["ivf_list"]] = r["n"]
        new = cents.copy()
        nz = cnt > 0
        new[nz] = acc[nz] / cnt[nz, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        cents = new / norms
    return cents


def _with_nearest_list(embeddings: DataFrame, cents: np.ndarray) -> DataFrame:
    @F.pandas_udf("int")
    def nearest(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        sims = (m / nrm) @ cents.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return embeddings.withColumn("ivf_list", nearest(F.col("embedding")))


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16, dim: int = 64,
               seed: int = 11,
               centroids: np.ndarray | None = None) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: assign each vector to its nearest centroid
    (one matmul per Arrow batch). ``centroids=None`` falls back to the
    deterministic random-direction init — callers wanting a trained
    quantizer pass :func:`train_ivf_centroids` output."""
    cents = centroids if centroids is not None else _seed_centroids(
        n_centroids, dim, seed)
    return _with_nearest_list(embeddings, cents), cents


MAX_IVF_QUERIES = 100_000  # driver-side probe assignment cap (see below)


def cosine_topk_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                    n_centroids: int = 16, n_probe: int = 4,
                    dim: int = 64, train_iters: int = 2) -> DataFrame:
    """Approximate top-k via IVF: score only vectors whose inverted list
    is among the query's ``n_probe`` closest centroids. The big side is
    hash-partitioned by list id; each query probes n_probe/n_centroids
    of the data — the standard recall/cost dial. The quantizer is
    k-means-trained (``train_iters`` distributed Lloyd passes);
    ``train_iters=0`` reproduces the untrained random-direction
    quantizer.

    The query side is SMALL by contract: probe lists are assigned on
    the driver (one tiny matmul) and the probed queries are broadcast.
    The explicit ``MAX_IVF_QUERIES`` cap makes that assumption loud —
    above it, raise instead of silently materializing a huge query set
    on the driver (a large query side should go through
    :func:`hyperplane_buckets`-style distributed assignment instead)."""
    cents = (train_ivf_centroids(embeddings, n_centroids, dim, train_iters)
             if train_iters > 0 else None)
    e_l, cents = ivf_assign(embeddings, n_centroids, dim, centroids=cents)

    def probes(qe) -> list[int]:
        v = np.asarray(qe, dtype=np.float64)
        n = np.linalg.norm(v) or 1.0
        sims = (v / n) @ cents.T
        return [int(i) for i in np.argsort(-sims)[:n_probe]]

    # one scan enforces the cap AND fetches the rows: pull cap+1, and
    # the presence of the extra row proves the violation (a separate
    # count() would execute a potentially expensive query plan twice)
    q_pdf = (queries.select("qid", "q_embedding")
             .limit(MAX_IVF_QUERIES + 1).toPandas())
    if len(q_pdf) > MAX_IVF_QUERIES:
        raise ValueError(
            f"cosine_topk_ivf: query side exceeds MAX_IVF_QUERIES="
            f"{MAX_IVF_QUERIES} (driver-side probe assignment is a "
            "small-side contract); assign probe lists distributively "
            "for large query sets"
        )
    q_pdf["ivf_list"] = q_pdf["q_embedding"].map(probes)
    q = F.broadcast(
        queries.sparkSession.createDataFrame(q_pdf)
        .select("qid", "q_embedding", F.explode("ivf_list").alias("ivf_list"))
    )
    joined = e_l.join(q, "ivf_list").filter(F.col("vec_id") != F.col("qid"))
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
