"""Sequence packing (operators/packing.py): the distributed prefix sum
must be invariant to the number of range partitions, and the layout
must be a gapless contiguous token stream."""

from __future__ import annotations

from mergeaddressesandbuildings_spark.operators import packing


def _docs(spark, n=60):
    rows = [(i, " ".join(["w"] * ((i * 7) % 23 + 1))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_parallelism_invariant(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: (r["seq_id"], r["offset_in_seq"], r["n_tokens"])
         for r in packing.pack_sequences(docs, 64, num_partitions=1).collect()}
    b = {r["doc_id"]: (r["seq_id"], r["offset_in_seq"], r["n_tokens"])
         for r in packing.pack_sequences(docs, 64, num_partitions=7).collect()}
    assert a == b and len(a) == 60


def test_layout_is_gapless(spark):
    rows = sorted(
        packing.pack_sequences(_docs(spark), 64, num_partitions=5).collect(),
        key=lambda r: r["doc_id"],
    )
    pos = 0
    for r in rows:
        assert (r["seq_id"], r["offset_in_seq"]) == (pos // 64, pos % 64)
        pos += r["n_tokens"]
