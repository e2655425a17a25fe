"""Table-format abstraction (SURVEY.md §2.1 S1; BASELINE.json:15 —
production input is an Iceberg table of Common-Crawl-style pages).

The sandbox has no Iceberg runtime jars (SURVEY.md §9), so the default
format is parquet and the Iceberg branch is exercised only on clusters
where `iceberg-spark-runtime` is on the classpath (spark-submit
`--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:…` or a
catalog pre-configured via `spark.sql.catalog.*` conf).

Layout guidance for the 10^12-row corpus (SURVEY.md §4): create the
pages table with hidden partitioning `bucket(N, url)` +
`days(warc_ts)` so url-keyed dedupe joins prune buckets and
capture-time predicates prune days without user-visible partition
columns; the engine's own sinks stay parquet partitioned by `tile`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, location: str,
               fmt: str = "parquet") -> DataFrame:
    """Read an input table. ``location`` is a path (parquet) or a
    catalog table identifier (iceberg, e.g. ``cat.db.pages``)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    if fmt == "parquet":
        return spark.read.parquet(location)
    return spark.read.format(fmt).load(location)


def write_table(df: DataFrame, location: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.format("iceberg").saveAsTable(location)
    elif fmt == "parquet":
        w.parquet(location)
    else:
        w.format(fmt).save(location)
