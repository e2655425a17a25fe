"""Table-format abstraction (SURVEY.md §2.1 S1; BASELINE.json:15 —
production input is an Iceberg table of Common-Crawl-style pages).

Resolution order for ``fmt="iceberg"``:

1. a JVM Iceberg runtime, when ``location`` is a catalog identifier
   (``cat.db.pages``) or the classpath carries
   ``iceberg-spark-runtime`` — the production path on real clusters;
2. the repo's pure-Python Iceberg v2 layer (`sources/iceberg.py`),
   when ``location`` is a path whose ``metadata/version-hint.text``
   exists — full format semantics (snapshot isolation, manifest-only
   planning, MoR deletes, partition/bounds pruning) with no jars,
   which is what this sandbox has (SURVEY.md §9).

Layout guidance for the 10^12-row corpus (SURVEY.md §4): create the
pages table with hidden partitioning `bucket(N, url)` +
`days(warc_ts)` so url-keyed dedupe joins prune buckets and
capture-time predicates prune days without user-visible partition
columns; the engine's own sinks stay parquet partitioned by `tile`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _is_pyiceberg_table(location: str) -> bool:
    return os.path.exists(
        os.path.join(location, "metadata", "version-hint.text"))


def read_table(spark: SparkSession, location: str,
               fmt: str = "parquet") -> DataFrame:
    """Read an input table. ``location`` is a path (parquet, or an
    Iceberg table dir readable by the pure-Python layer) or a catalog
    table identifier (iceberg with runtime jars, e.g. ``cat.db.pages``)."""
    if fmt == "iceberg":
        if _is_pyiceberg_table(location):
            from . import iceberg as _ice
            return _ice.read_iceberg(spark, location)
        return spark.read.format("iceberg").load(location)
    if fmt == "parquet":
        return spark.read.parquet(location)
    return spark.read.format(fmt).load(location)


def write_table(df: DataFrame, location: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    if fmt == "iceberg" and (os.sep in location or "/" in location):
        # path-addressed iceberg table -> pure-Python v2 writer
        from . import iceberg as _ice
        if _is_pyiceberg_table(location):
            if mode != "append":
                raise ValueError(
                    "existing path-addressed iceberg tables only take "
                    "mode='append' (overwrite would orphan snapshots); "
                    "use a fresh dir or the JVM writer")
            _ice.append_iceberg(df, location)
        else:
            _ice.write_iceberg(df, location, partition_by=partition_by)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.format("iceberg").saveAsTable(location)
    elif fmt == "parquet":
        w.parquet(location)
    else:
        w.format(fmt).save(location)
