"""Link-graph analytics over web corpora: host/document PageRank in
exact fixed-point arithmetic (SURVEY.md §2 webpipe family).

A crawl-curation pipeline ranks hosts/documents by link authority to
prioritize fetch frontiers and to weight quality sampling. At 100 TB
the link graph is billions of edges, so the operator is shaped like
``doc_dedupe.dup_clusters``: per iteration two equi-joins + one
map-side-combinable hash agg, with the rank vector parquet-barriered
every round (iterative self-joins otherwise grow the logical plan per
round — the plan-size pitfall measured in plans/merge.py).

Arithmetic is **fixed-point parts-per-million (BIGINT)**, not double:
integer sums are associative and order-independent, so the result is
bit-identical across engines (DuckDB oracle), parallelism levels, and
retries — float power iteration would drift by ulps per round and
could never be hash-checked. Contributions use integer division
(``rank div outdeg``); the mass lost to truncation (< outdeg ppm per
node per round) is deterministic and documented, not noise.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_counts"]


def pagerank(edges: DataFrame,
             iters: int = 5,
             damping_ppm: int = 850_000,
             src_col: str = "src",
             dst_col: str = "dst",
             scratch_dir: str | None = None) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list →
    ``(node, rank_ppm)`` with ranks in parts-per-million BIGINTs.

    Semantics (exactly mirrored by the DuckDB oracle SQL in
    plans/queries.py::doc_link_pagerank):

    - node set = distinct src ∪ dst; initial rank = 1_000_000 ppm;
    - per round, every node with out-edges sends
      ``rank div outdeg`` (BIGINT integer division) along each
      distinct out-edge;
    - new rank = ``(1e6 - damping_ppm) + (damping_ppm * in_sum)
      div 1e6`` — nodes with no in-edges hold the base term;
    - dangling mass (nodes without out-edges) is dropped, the
      standard simplification for frontier ranking where relative
      order is what's consumed.

    Every round is barriered to scratch parquet (shared-FS path
    required on a real cluster — same contract as
    ``dup_clusters``/``run_merge``); rounds are O(1) plan size, the
    whole job is ``iters`` × (2 equi-joins + 1 hash agg), and nothing
    ever reaches the driver (the return value is a lazy scan of the
    final round's parquet).
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    base = scratch_dir or tempfile.mkdtemp(prefix="pagerank_")
    scratch = f"{base}/run"

    def _rm(sub: str = "") -> None:
        target = f"{scratch}/{sub}" if sub else scratch
        try:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(target)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        except Exception:
            shutil.rmtree(target, ignore_errors=True)

    _rm()
    e.write.mode("overwrite").parquet(f"{scratch}/edges")
    e = spark.read.parquet(f"{scratch}/edges")

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    ranks = nodes.withColumn("rank_ppm", F.lit(1_000_000).cast("long"))
    ranks.write.mode("overwrite").parquet(f"{scratch}/ranks_init")
    ranks = spark.read.parquet(f"{scratch}/ranks_init")

    base_ppm = 1_000_000 - damping_ppm
    for it in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", F.expr("rank_ppm div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        stepped = (
            ranks.select("node")
            .join(contrib, ranks["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base_ppm)
                 + F.expr(f"({damping_ppm} * coalesce(in_sum, 0)) "
                          f"div 1000000")).cast("long").alias("rank_ppm"),
            )
        )
        stepped.write.mode("overwrite").parquet(f"{scratch}/ranks_{it}")
        ranks = spark.read.parquet(f"{scratch}/ranks_{it}")
        if it > 0:
            _rm(f"ranks_{it - 1}")
    if iters > 0:
        # the returned frame scans only ranks_{iters-1}; the edge copy
        # and round-0 input are no longer referenced
        _rm("edges")
        _rm("ranks_init")
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst",
                    rank_base: int = 1 << 32) -> DataFrame:
    """Exact per-node triangle counts → (node, triangles), BIGINT.

    Degree-ordered wedge counting (Schank & Wagner): canonicalize to
    an undirected simple graph, orient every edge from the lower- to
    the higher-(degree, id) endpoint, enumerate wedges at each
    vertex's out-neighborhood, and close them against the oriented
    edge set. Each triangle is found exactly once, at its
    lowest-ranked vertex — and because out-degrees under this
    orientation are bounded by O(sqrt(m)), the wedge blowup is
    O(m^1.5) worst case instead of the naive sum(deg^2): the reason
    this shape survives power-law web graphs where a hub's deg^2
    would explode.

    Plan: 2 hash aggs (degrees, final counts) + 3 equi-joins (rank
    attach x2 folded into one generated column, wedge self-join,
    closing-edge semi-join) — all exact integers, no floats anywhere,
    engine/parallelism/retry-invariant. ``rank_base`` builds the
    total order rank = deg * rank_base + node and must exceed the
    max node id (loudly guarded at plan time via raise_error)."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    und = (
        e.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"),
                F.greatest("u", "v").alias("v"))
        .distinct()
    )
    nodes = und.select(F.col("u").alias("node")).unionByName(
        und.select(F.col("v").alias("node"))).distinct()
    deg = (
        und.select(F.col("u").alias("node")).unionByName(
            und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("deg"))
    )
    guarded = F.when(
        F.col("node") < rank_base,
        F.col("deg") * F.lit(rank_base) + F.col("node"),
    ).otherwise(F.raise_error(F.lit(
        "triangle_counts: node id >= rank_base — raise rank_base")))
    rk = deg.select("node", guarded.alias("r"))
    withr = (
        und.join(rk.withColumnRenamed("node", "u")
                 .withColumnRenamed("r", "ru"), "u")
        .join(rk.withColumnRenamed("node", "v")
              .withColumnRenamed("r", "rv"), "v")
    )
    oriented = withr.select(
        F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v"))
        .alias("a"),
        F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u"))
        .alias("b"),
        F.least("ru", "rv").alias("ra"),
        F.greatest("ru", "rv").alias("rb"),
    )
    lo = oriented.select("a", F.col("b").alias("x"), F.col("rb").alias("rx"))
    hi = oriented.select("a", F.col("b").alias("y"), F.col("rb").alias("ry"))
    wedges = (
        lo.join(hi, "a")
        .filter(F.col("rx") < F.col("ry"))
        .select("a", "x", "y")
    )
    tris = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
    )
    per_node = (
        tris.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node").agg(F.count("*").cast("long").alias("triangles"))
    )
    return (
        nodes.join(per_node, "node", "left")
        .select(F.col("node"),
                F.coalesce("triangles", F.lit(0)).cast("long")
                .alias("triangles"))
    )
