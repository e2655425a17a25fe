"""SparkSession factory with the engine's physical-layout defaults
(SURVEY.md §4: AQE on, skew-join on, Arrow on, shuffle partitions sized
to the workload, not left at 200)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app_name: str = "merge-engine",
              shuffle_partitions: int | None = None, **extra: str) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif (not os.environ.get("PYSPARK_GATEWAY_PORT")
          and not os.environ.get("SPARK_MASTER")
          and not os.environ.get("SPARK_SUBMIT_MASTER")):
        # default for in-process runs (tests, bench.py). Under
        # spark-submit the JVM gateway already carries --master from the
        # submit command line (PYSPARK_GATEWAY_PORT is set in that and
        # only that launch path — verified empirically), and
        # builder.master() here would silently override it.
        builder = builder.master(f"local[{cpus}]")
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or max(cpus * 2, 8)),
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        # parquet scans: keep partitions near a task-friendly size
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.parquet.compression.codec": "zstd",
    }
    conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
