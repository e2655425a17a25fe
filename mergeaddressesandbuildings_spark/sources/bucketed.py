"""Bucketed (co-located) table surface — the shuffle-elimination lever
for REPEATED joins/aggregations on a stable key at 100 TB scale
(SURVEY.md §4 "partitioning & shuffle": bucketing for co-located
joins).

Why this exists: the merge pipeline's downstream consumers repeatedly
join/aggregate ``assignments`` on ``building_id`` (A1 counts, J5
conflicts, review exports) and dedup pipelines repeatedly join document
tables on content/doc keys. Every such join re-shuffles both sides
unless the storage layout already clusters rows by the join key. Spark
bucketing (`DataFrameWriter.bucketBy` + `saveAsTable`) persists that
clustering: two tables bucketed by the same key into the same bucket
count join with ZERO Exchange on either side — the scan itself delivers
co-partitioned, optionally co-sorted input (asserted by
tests/test_bucketed.py on the physical plan).

Bucket-count choice at scale: buckets are the unit of join parallelism
AND the file count per write, so pick ``n_buckets`` ≈ cluster cores ×
small-multiple, and keep it IDENTICAL across every table that must
co-join (Spark only elides the shuffle when counts match or divide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table (parquet under the
    session warehouse dir; on a cluster, point
    ``spark.sql.warehouse.dir`` at shared storage).

    ``sort_cols`` additionally sorts within each bucket file, which
    upgrades co-located joins to sort-merge WITHOUT a sort stage.

    Overwrites are made idempotent across SESSIONS: a managed table's
    location can survive in the warehouse dir after the (in-memory)
    metastore that knew about it is gone, and ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS even in overwrite mode — so the
    stale location is dropped first when the catalog has no entry."""
    if mode == "overwrite":
        spark = df.sparkSession
        if not spark.catalog.tableExists(table):
            wh = spark.conf.get("spark.sql.warehouse.dir")
            # managed-table layout: <warehouse>/<db>.db/<table> except
            # the default database, which lives at <warehouse>/<table>
            parts = table.lower().split(".")
            db = parts[-2] if len(parts) > 1 else \
                spark.catalog.currentDatabase().lower()
            prefix = "" if db == "default" else f"{db}.db/"
            loc = f"{wh}/{prefix}{parts[-1]}"
            jpath = spark._jvm.org.apache.hadoop.fs.Path(loc)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides the catalog entry,
    so the planner knows the layout — a plain parquet path read would
    NOT recover it)."""
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the final physical plan
    — the quantity bucketing is supposed to drive to zero. AQE rewrites
    plans at runtime, so read the executedPlan AFTER an action when
    exactness matters; for join-shape assertions the initial plan
    suffices (AQE never INTRODUCES a shuffle the initial plan lacks)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
