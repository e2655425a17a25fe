"""Write-time clustering payoff (the reason hilbert.py exists):
sorting a table by Hilbert index before writing makes parquet
row-group min/max statistics selective for 2-D bbox scans — measured
here directly on the row-group stats, no flaky task metrics.

Method: the same points written two ways (unsorted-hash vs
Hilbert-sorted), same row-group size; for a small bbox query we count
the row groups whose [min, max] cell-range CAN contain any cell of
the bbox's Hilbert cover. Unit-step adjacency keeps a bbox's Hilbert
codes in few contiguous runs, so the sorted layout must prune the
overwhelming majority of row groups; a random layout prunes ~none
(every group's min/max spans nearly the whole curve)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.functions.hilbert import (
    hilbert_expr, xy_to_hilbert,
)

ORDER = 10
N = 20_000


@pytest.fixture(scope="module")
def pts(spark):
    rows = [(i, (i * 2654435761) % (1 << ORDER), (i * 40503) % (1 << ORDER))
            for i in range(N)]
    df = spark.createDataFrame(rows, ["i", "x", "y"])
    return df.withColumn(
        "cell", hilbert_expr(F.col("x"), F.col("y"), ORDER))


def _groups_touched(path: str, bbox_cells: set[int]) -> tuple[int, int]:
    """(row groups that can contain any bbox cell, total row groups)
    judged purely from parquet min/max stats on `cell`."""
    lo, hi = min(bbox_cells), max(bbox_cells)
    touched = total = 0
    for piece in pq.ParquetDataset(path).fragments:
        md = piece.metadata
        idx = md.schema.names.index("cell")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st.max >= lo and st.min <= hi and any(
                    st.min <= c <= st.max for c in bbox_cells):
                touched += 1
    return touched, total


def test_hilbert_sorted_layout_prunes_row_groups(spark, pts, tmp_path):
    spark.conf.set("spark.sql.parquet.block.size", 64 * 1024)
    sorted_dir = str(tmp_path / "sorted")
    random_dir = str(tmp_path / "random")
    (pts.repartition(1).sortWithinPartitions("cell")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(sorted_dir))
    (pts.repartition(1, F.xxhash64("i"))  # hash order ~ random layout
        .sortWithinPartitions(F.xxhash64("i"))
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(random_dir))

    # a 16x16 bbox in the middle of the order-10 grid
    bx, by = np.meshgrid(np.arange(400, 416), np.arange(700, 716))
    bbox_cells = set(
        xy_to_hilbert(bx.ravel(), by.ravel(), ORDER).tolist())

    s_touch, s_total = _groups_touched(sorted_dir, bbox_cells)
    r_touch, r_total = _groups_touched(random_dir, bbox_cells)
    assert s_total >= 8 and r_total >= 8  # row-group size took effect
    # random layout: nearly every group's span covers the bbox range
    assert r_touch >= 0.8 * r_total
    # hilbert-sorted: the bbox lives in a handful of contiguous groups
    assert s_touch <= 0.25 * s_total
    assert s_touch < r_touch
