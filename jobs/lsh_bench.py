"""spark-submit entry point: the MinHash-LSH dedup family at volume —
round-3 verdict task 5's scale probe. Runs the FULL pipeline the
100 TB path would run (shingle → minhash signatures → banded candidate
join → exact-Jaccard verify → connected-component clusters, all in
xxhash64 scale mode) over a replica-scaled 1M-doc corpus, and measures
the band-bucket skew profile that bounds the candidate join's cost.

    python jobs/lsh_bench.py --mult 200 --master 'local[4]'

Corpus construction (deterministic, no external data): each sf
document is replicated ``--mult`` times; replicas 0 and 1 keep the
text verbatim (an exact-dup pair) and replica 2 appends a short tail
(a near-dup, Jaccard ~0.9), so every original seeds one 3-doc cluster;
replicas >= 3 suffix EVERY word with the replica id, which makes all
their shingles globally unique — the realistic regime where dups are a
small fraction of a mostly-unique corpus (15k clustered docs in 1M at
mult=200, sf0.1).

Prints one JSON line {wall_s, phase_s, docs, n_candidates, n_pairs,
n_clustered_docs, n_clusters, bucket stats, fingerprint, master}. The
fingerprint (bit_xor of xxhash64 over the cluster assignment rows)
must be identical across parallelism levels for a scaling pair to be
valid. Band-bucket stats: max/p99.9/mean bucket size plus a log2
histogram over groupBy(band_id, band_hash) sizes — a bucket of size s
costs s^2 candidate-join work, so max_bucket^2 bounds the hottest
reduce task.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--master", default=None)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--skip-clusters", action="store_true",
                    help="stop after verified pairs (pairs-only timing)")
    ap.add_argument("--sig-mode", choices=["agg", "rowexpr"], default="agg",
                    help="signature formulation: shingle-explode + min "
                         "aggregate, or per-row array folds (zero-shuffle "
                         "signatures; corpus never explodes — shingles are "
                         "built only for candidate docs)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mergeaddressesandbuildings_spark.operators import doc_dedupe
    from mergeaddressesandbuildings_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="lsh-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    phases: dict[str, float] = {}

    base = spark.read.parquet(os.path.join(args.sf_dir,
                                           "documents.parquet"))
    rep = F.col("rep")
    uniq_text = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("_"), rep.cast("string"))),
        " ")
    docs = (
        base.withColumn("rep", F.explode(F.sequence(
            F.lit(0), F.lit(args.mult - 1))))
        .select(
            (F.col("doc_id") + rep * F.lit(1_000_000)).alias("doc_id"),
            F.when(rep <= 1, F.col("text"))               # exact-dup pair
            .when(rep == 2, F.concat(F.col("text"),       # near-dup
                                     F.lit(" near dup tail")))
            .otherwise(uniq_text)                         # globally unique
            .alias("text"),
        )
        .repartition(64, "doc_id")
    )

    if args.sig_mode == "rowexpr":
        sh = None
        sigs = docs.select(
            "doc_id",
            doc_dedupe.minhash_signature_expr(
                F.col("text"), n=2, hash="xxhash64").alias("sig"),
        ).filter(F.col("sig").isNotNull())
    else:
        sh = doc_dedupe.shingles(docs, n=2)
        sigs = doc_dedupe.minhash_signatures(sh, hash="xxhash64")
    # materialize signatures once: the banding histogram and the
    # candidate join both branch from here (and at cluster scale sigs
    # would be a persisted/bucketed table, not recomputed per consumer)
    sigs = sigs.persist()
    n_docs = sigs.count()
    phases["signatures"] = round(time.monotonic() - t0, 2)

    # --- band-bucket skew profile (the candidate join's cost model)
    t1 = time.monotonic()
    buckets = (
        doc_dedupe.banded_signatures(sigs, band_key="hash")
        .groupBy("band_id", "band_hash").count()
    )
    stats = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.avg("count").alias("mean_bucket"),
        F.expr("percentile_approx(count, 0.999, 10000)").alias("p999"),
        F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
    ).collect()[0]
    hist = {
        int(r["b"]): int(r["n"])
        for r in buckets.select(
            F.floor(F.log2("count")).alias("b")
        ).groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    phases["bucket_stats"] = round(time.monotonic() - t1, 2)

    # --- candidate → verify → clusters (the dedup data path)
    t2 = time.monotonic()
    cands = doc_dedupe.lsh_candidate_pairs(sigs, band_key="hash").persist()
    n_cands = cands.count()  # materializes: verify reuses, not recomputes
    phases["candidates"] = round(time.monotonic() - t2, 2)
    t2b = time.monotonic()
    if args.sig_mode == "rowexpr":
        in_play = cands.select(F.col("doc_a").alias("doc_id")).union(
            cands.select("doc_b")).distinct()
        sh_v = doc_dedupe.shingles(
            docs.join(in_play, "doc_id", "left_semi"), n=2)
        pairs = doc_dedupe.jaccard_verify(sh_v, cands, args.threshold,
                                          restrict=False)
    else:
        pairs = doc_dedupe.jaccard_verify(sh, cands, args.threshold)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    phases["verify"] = round(time.monotonic() - t2b, 2)

    fp_row = {"n_clustered": 0, "n_clusters": 0, "fp": 0}
    if not args.skip_clusters:
        t3 = time.monotonic()
        clusters = doc_dedupe.dup_clusters(pairs)
        agg = clusters.agg(
            F.bit_xor(F.xxhash64("doc_id", "cluster_id")).alias("fp"),
            F.count("*").alias("n_clustered"),
            F.count_distinct("cluster_id").alias("n_clusters"),
        ).collect()[0]
        fp_row = {"n_clustered": int(agg["n_clustered"]),
                  "n_clusters": int(agg["n_clusters"]),
                  "fp": int(agg["fp"])}
        phases["clusters"] = round(time.monotonic() - t3, 2)

    wall = round(time.monotonic() - t0, 2)
    print(json.dumps({
        "job": "lsh_bench",
        "wall_s": wall,
        # the dedup data path alone (what a production job runs; the
        # bucket histogram is probe instrumentation)
        "datapath_s": round(wall - phases["bucket_stats"], 2),
        "phase_s": phases,
        "docs": n_docs,
        "n_candidates": n_cands,
        "n_pairs": n_pairs,
        "n_clustered_docs": fp_row["n_clustered"],
        "n_clusters": fp_row["n_clusters"],
        "buckets": {
            "n": int(stats["n_buckets"]),
            "max": int(stats["max_bucket"]),
            "p999": int(stats["p999"]),
            "mean": round(float(stats["mean_bucket"]), 3),
            "sum_sq": int(stats["sum_sq"]),
            "log2_hist": hist,
        },
        "fingerprint": fp_row["fp"],
        "master": spark.sparkContext.master,
        "sig_mode": args.sig_mode,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
