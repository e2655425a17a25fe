"""spark-submit entry point: duplicated-substring coverage at volume
— the round-3 dedup kernel's datapoint for the two-parallelism
scaling protocol (BASELINE.json north_rule; BENCH/BASELINE.md).

    python jobs/dedup_bench.py --mult 50 --master 'local[4]'

Scales the sf documents table by ``--mult`` deterministic replicas
(every 10th replica keeps the original text verbatim so corpus-level
duplicated n-grams are dense), runs
operators/doc_dedupe.duplicated_ngram_coverage in the xxhash64 scale
mode, and prints one JSON line {wall_s, docs, rows_out, dup_docs,
fingerprint, master}. The fingerprint (bit_xor of xxhash64 over the
integer result rows) must be identical across parallelism levels for
a scaling pair to be valid.
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
    ap.add_argument("--mult", type=int, default=50)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mergeaddressesandbuildings_spark.operators import doc_dedupe
    from mergeaddressesandbuildings_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="dedup-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()

    base = spark.read.parquet(os.path.join(args.sf_dir,
                                           "documents.parquet"))
    docs = (
        base.withColumn("rep", F.explode(F.sequence(
            F.lit(0), F.lit(args.mult - 1))))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(1_000_000))
            .alias("doc_id"),
            # every 10th replica verbatim -> cross-doc duplicated
            # n-gram runs stay dense; others get a distinct suffix
            F.when(F.col("rep") % 10 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" variant "),
                                F.col("rep").cast("string")))
            .alias("text"),
        )
        .repartition(64, "doc_id")
    )

    cov = doc_dedupe.duplicated_ngram_coverage(docs, n=5, hashed=True)
    agg = cov.agg(
        F.bit_xor(F.xxhash64("doc_id", "n_tokens", "dup_tokens"))
        .alias("fp"),
        F.count("*").alias("rows_out"),
        F.sum((F.col("dup_tokens") > 0).cast("long")).alias("dup_docs"),
    ).collect()[0]

    print(json.dumps({
        "job": "dedup_bench",
        "wall_s": round(time.monotonic() - t0, 2),
        "docs": docs.count(),
        "rows_out": agg["rows_out"],
        "dup_docs": agg["dup_docs"],
        "fingerprint": agg["fp"],
        "master": spark.sparkContext.master,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
