"""Sequence packing for LLM training-data pipelines (driver round
spec: first-class large-scale pipeline ops): lay documents out as one
contiguous token stream in a deterministic global order and cut it
into fixed-budget training sequences — each doc gets (seq_id,
offset_in_seq); docs crossing a boundary span two sequences (the
standard packed-stream semantics).

Scale shape — a GLOBAL running sum without a global sort-to-one-
partition: classic distributed prefix sum.

1. range-partition by the order key (``repartitionByRange`` samples
   split points; no full sort);
2. per-partition running sum via a window PARTITIONED by the physical
   partition id (parallel, bounded memory);
3. per-partition totals → driver (one row per partition — bounded
   metadata, not data) → prefix offsets broadcast back as a tiny map
   join.

Every quantity is an integer, so the result is bit-exact against a
plain windowed cumulative sum (the DuckDB oracle formulation) at any
parallelism — asserted by the driver contract (plans/queries.py
``doc_pack_sequences``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(docs: DataFrame, budget: int,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   num_partitions: int | None = None) -> DataFrame:
    """→ (id, n_tokens, seq_id, offset_in_seq) with whitespace token
    counts; ``seq_id = floor(tokens_before / budget)``,
    ``offset_in_seq = tokens_before % budget`` over the ``id_col``
    global order."""
    spark = docs.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    d = docs.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    ).repartitionByRange(n_part, F.col(id_col))
    d = d.withColumn("_pid", F.spark_partition_id())

    w = Window.partitionBy("_pid").orderBy(id_col)
    d = d.withColumn("_cum_local", F.sum("n_tokens").over(w))

    # per-partition totals: one row per partition — driver-bounded
    totals = {
        r["_pid"]: r["_t"]
        for r in d.groupBy("_pid").agg(F.max("_cum_local").alias("_t")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )

    before = (F.col("_cum_local") + off_map[F.col("_pid")] - F.col("n_tokens"))
    return (
        d.withColumn("_before", before)
        .select(
            id_col, "n_tokens",
            # integral DIV, not double division: a correctly-rounded
            # float quotient can land on an integer and truncate wrong
            # once token counts pass 2^53/budget
            F.expr(f"_before DIV {int(budget)}").alias("seq_id"),
            (F.col("_before") % budget).alias("offset_in_seq"),
        )
    )
