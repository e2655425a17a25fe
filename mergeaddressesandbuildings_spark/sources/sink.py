"""S5: idempotent, resumable per-tile sink with lineage metrics
(SURVEY.md §2.1 S4/S5, §2.4 A3; BASELINE.json:6 "resumable from
per-tile checkpoints with per-partition lineage and row-count metrics").

Design:
- Output is hash-bucketed into ``n_batches`` tile groups
  (``pmod(xxhash64(tile), n)``) — NO driver-side tile list (at 10^12
  rows the tile set itself is too large to collect; everything here is
  a distributed plan).
- Each batch writes with **dynamic partition overwrite** (only the
  touched ``tile=`` directories are replaced), then appends one
  manifest row per tile: (tile, n_rows, fingerprint, batch_id). A
  batch that dies mid-write is simply re-run — overwrite makes the
  retry idempotent; tiles from completed batches are skipped via a
  left_anti join against the manifest.
- The fingerprint is ``bit_xor(xxhash64(...))`` — order-independent and
  overflow-free, so parallelism-invariance is checkable from the
  manifest alone (§5.2-5/6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _data_path(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _manifest_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def write_tiles(
    df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    n_batches: int = 4,
    fail_after_batches: int | None = None,
) -> dict:
    """Write ``df`` (must carry a ``tile`` column) partitioned by tile,
    resumably. ``key_cols`` feed the lineage fingerprint.

    ``fail_after_batches`` is a test hook simulating a mid-job crash.
    Returns {"batches_run": int, "rows_written": int, "tiles_skipped": int}.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    manifest = read_manifest(spark, out_dir)
    skipped = 0
    batch_offset = 0
    if manifest is not None:
        done_tiles = manifest.select("tile").distinct()
        skipped = done_tiles.count()
        df = df.join(done_tiles, "tile", "left_anti")
        batch_offset = int(manifest.agg(F.max("batch_id")).collect()[0][0] or 0) + 1

    fingerprint = F.expr(
        "bit_xor(xxhash64({}))".format(", ".join(key_cols))
    ).alias("fingerprint")

    batches_run = 0
    rows_written = 0
    bucket = F.pmod(F.xxhash64(F.col("tile")), F.lit(n_batches))
    for k in range(n_batches):
        if fail_after_batches is not None and batches_run >= fail_after_batches:
            raise RuntimeError(f"test hook: simulated crash after {batches_run} batches")
        bid = batch_offset + k
        batch = df.filter(bucket == k)
        # stable file bytes: sort within partitions (SURVEY.md §4)
        batch = batch.repartition(F.col("tile")).sortWithinPartitions("tile", *key_cols)
        batch.write.partitionBy("tile").mode("overwrite").parquet(_data_path(out_dir))
        # manifest: stats are computed ONCE (collect — one small row per
        # tile in the batch) and written back from the local rows, so the
        # batch plan runs twice total (data write + stats), never a
        # third time for a manifest re-read.
        stats = (
            batch.groupBy("tile")
            .agg(F.count("*").alias("n_rows"), fingerprint)
            .withColumn("batch_id", F.lit(bid))
        )
        stat_rows = stats.collect()
        if stat_rows:
            spark.createDataFrame(stat_rows, stats.schema) \
                .coalesce(1) \
                .write.mode("append").parquet(_manifest_path(out_dir))
        rows_written += sum(int(r["n_rows"]) for r in stat_rows)
        batches_run += 1

    return {
        "batches_run": batches_run,
        "rows_written": rows_written,
        "tiles_skipped": skipped,
    }


def lineage_metrics(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """A3: per-partition lineage — (partition_id, n_rows, fingerprint).
    Pure column expressions over ``spark_partition_id()``."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(xxhash64({}))".format(", ".join(key_cols))).alias("fingerprint"),
    )
