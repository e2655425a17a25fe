"""spark-submit entry point for the composed WEB-CORPUS pipeline at
volume — the webtext twin of jobs/merge.py for the two-parallelism
scaling protocol (BASELINE.json north_rule; BENCH/BASELINE.md).

    python jobs/webpipe_bench.py --mult 200 --master 'local[4]'

Scales the sf documents table by ``--mult`` deterministic replicas
(10% exact duplicates so dedup stays non-trivial), then runs the full
curation chain every training-data pipeline composes:

    synthesize messy URLs → canonical URL dedup groups
    → per-source boilerplate strip (nav/footer enrichment)
    → exact content dedup on the cleaned text
    → bigram-LM trained on the even half, perplexity-scored odd half
    → one order-independent corpus fingerprint (bit_xor of xxhash64)

Prints one JSON line {wall_s, docs, rows_out, fingerprint, master} —
the fingerprint must be identical across parallelism levels for a
scaling pair to be valid.
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mergeaddressesandbuildings_spark.operators import lm, webpipe
    from mergeaddressesandbuildings_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="webpipe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()

    base = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    docs = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                    F.lit(args.mult - 1))))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(1_000_000))
            .alias("doc_id"),
            "source",
            # 10% exact replicas (dedup work), 90% distinct variants
            F.when(F.col("rep") % 10 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" v"),
                                F.col("rep").cast("string")))
            .alias("text"),
        )
        .repartition(64, "doc_id")
    )

    # 1) canonical-URL dedup over deterministically messy variants
    urls = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTP://WWW."), F.col("source"), F.lit(".Example.COM"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(":80"))
            .otherwise(F.lit("")),
            F.lit("/page/"), (F.col("doc_id") % 1000).cast("string"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("?utm_source=f&b=2&a=1"))
            .otherwise(F.lit("?b=2&a=1")),
        ),
    )
    url_groups = webpipe.url_dedup_groups(urls)

    # 2) boilerplate strip over nav/footer-enriched text
    enriched = docs.withColumn(
        "text",
        F.concat(F.lit("NAV "), F.col("source"), F.lit(" HOME\n"),
                 F.col("text"),
                 F.lit("\n(c) "), F.col("source"), F.lit(" footer")),
    )
    cleaned = webpipe.strip_boilerplate(enriched, min_docs=5)

    # 3) exact dedup on cleaned text (the 10% replicas collapse here)
    kept = (
        cleaned.groupBy("clean_text")
        .agg(F.min("doc_id").alias("doc_id"),
             F.count("*").alias("n_copies"))
    )

    # 4) LM: train on even ids, score odd ids
    scored_src = kept.select("doc_id",
                             F.col("clean_text").alias("text"))
    c12, c1, v = lm.train_bigram_lm(
        scored_src.filter(F.col("doc_id") % 2 == 0))
    scored = lm.perplexity(
        scored_src.filter(F.col("doc_id") % 2 == 1), c12, c1, v)

    # 5) one order-independent fingerprint over everything
    fp_urls = url_groups.agg(F.bit_xor(F.xxhash64(
        "canonical_url", "n_captures", "keep_doc_id")).alias("fp"),
        F.count("*").alias("n")).collect()[0]
    # ppl quantized to 3 dp for the fingerprint: double averages are
    # order-dependent at the last ulp, so a fine rounding boundary
    # could flip between parallelism levels and invalidate the pair
    fp_scored = scored.agg(F.bit_xor(F.xxhash64(
        "doc_id", "n_bigrams", F.round("ppl", 3))).alias("fp"),
        F.count("*").alias("n")).collect()[0]
    wall = time.monotonic() - t0

    print(json.dumps({
        "job": "webpipe_bench",
        "master": spark.sparkContext.master,
        "mult": args.mult,
        "docs": base.count() * args.mult,
        "url_groups": fp_urls["n"],
        "scored_docs": fp_scored["n"],
        "fingerprint": int(fp_urls["fp"]) ^ int(fp_scored["fp"]),
        "wall_s": round(wall, 2),
        "docs_per_sec": round(base.count() * args.mult / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
