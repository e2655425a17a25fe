"""spark-submit entry point: ST9 streaming MinHash near-dup at volume
— throughput + parallelism-invariance probe for the stateful streaming
path (streaming/minhash_stream.py), the incremental twin of
jobs/lsh_bench.py's batch probe.

    python jobs/st9_bench.py --mult 12 --batches 4 --master 'local[16]'

Corpus: the same deterministic replica scaling as lsh_bench.py (reps
0/1 verbatim = exact-dup pair, rep 2 = near-dup tail, reps >= 3
word-suffixed = globally unique), split round-robin by doc_id into
``--batches`` single-file microbatches (maxFilesPerTrigger=1) so the
stream exercises real cross-batch state, not one big batch.

Prints one JSON line {wall_s, docs, n_match_rows, n_pairs,
fingerprint, fingerprint_ordered, docs_per_sec, master, batches}.
``fingerprint`` (the scaling-pair validity check) is the bit_xor of
xxhash64 over the DISTINCT ORIENTATION-NORMALIZED pair set —
(least(matched,doc), greatest(matched,doc)) — so it is identical
across parallelism levels and across ANY --batches split.
``fingerprint_ordered`` hashes the raw (matched_doc_id, doc_id)
orientation; which member arrived first depends on the batch split,
so it is split-invariant ONLY for doc_id-monotone splits (--batches
dividing the 1,000,000 replica-id stride: 2, 4, 8, ...) — kept for
comparability with the round-4 record (5235891765343930830 at the
30k-doc protocol: ``--sf-dir /root/testdata/sf0.001 --mult 60
--batches 3``, recovered by fingerprint match in round 5; note
batches=3 is NOT id-monotone, so that ordered value is specific to
that split).

Cost model this probe measures: applyInPandasWithState invokes the
Python worker once per KEY per microbatch — with ~n_bands keys per
doc, the floor is per-key Python dispatch, not hashing. That overhead
is the price of cross-batch state; the batch path (lsh_bench) is the
right tool for full-corpus backfills, the stream for absorbing small
deltas continuously (and jobs/incremental.py's table-maintenance path
for batched deltas).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=12)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--master", default=None)
    ap.add_argument("--coarse", type=int, default=None,
                    help="state-key coarsening groups (default: the "
                         "operator default; 0 = exact per-bucket keys)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mergeaddressesandbuildings_spark.session import get_spark
    from mergeaddressesandbuildings_spark.streaming import minhash_stream

    spark = get_spark(master=args.master, app_name="st9-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
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
            F.when(rep <= 1, F.col("text"))
            .when(rep == 2, F.concat(F.col("text"), F.lit(" near dup tail")))
            .otherwise(uniq_text)
            .alias("text"),
        )
    )

    # corpus prep is NOT timed: write the microbatch files first
    src = tempfile.mkdtemp(prefix="st9_bench_")
    flat = tempfile.mkdtemp(prefix="st9_bench_flat_")
    n_docs = 0
    for b in range(args.batches):
        d = os.path.join(src, f"b{b}")
        part = docs.filter(F.pmod("doc_id", F.lit(args.batches)) == b)
        part.coalesce(1).write.mode("overwrite").parquet(d)
        n_docs += part.count()
        for f_ in sorted(os.listdir(d)):
            if f_.endswith(".parquet"):
                os.symlink(os.path.join(d, f_),
                           os.path.join(flat, f"b{b}.parquet"))

    t0 = time.monotonic()
    kw = {}
    if args.coarse is not None:
        kw["coarse_buckets"] = args.coarse or None
    stream = minhash_stream.stream_near_dup(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(flat),
        hash="xxhash64",
        **kw,
    )
    q = (stream.writeStream.format("memory").queryName("st9_bench")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("st9_bench")
    pairs = (out.filter(F.col("matched_doc_id").isNotNull())
             .select("matched_doc_id", "doc_id").distinct())
    norm = pairs.select(
        F.least("matched_doc_id", "doc_id").alias("lo"),
        F.greatest("matched_doc_id", "doc_id").alias("hi"),
    ).distinct()
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.bit_xor(F.xxhash64("matched_doc_id", "doc_id")),
                   F.lit(0)).alias("fp_ordered"),
    ).collect()[0]
    agg_n = norm.agg(
        F.coalesce(F.bit_xor(F.xxhash64("lo", "hi")), F.lit(0)).alias("fp"),
    ).collect()[0]
    n_match_rows = out.filter(F.col("matched_doc_id").isNotNull()).count()
    wall = round(time.monotonic() - t0, 2)

    print(json.dumps({
        "job": "st9_bench",
        "wall_s": wall,
        "docs": n_docs,
        "batches": args.batches,
        "n_match_rows": int(n_match_rows),
        "n_pairs": int(agg["n_pairs"]),
        "fingerprint": int(agg_n["fp"]),
        "fingerprint_ordered": int(agg["fp_ordered"]),
        "docs_per_sec": round(n_docs / wall, 1),
        "master": spark.sparkContext.master,
        "coarse": args.coarse,
    }))
    spark.stop()
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(flat, ignore_errors=True)


if __name__ == "__main__":
    main()
