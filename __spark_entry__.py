"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship merge pipeline (BASELINE.json north_star):
                deterministic Common-Crawl-style pages fixture →
                extraction → PIP/kNN spatial join → decisions → tiles.
queries()     — one entry per implemented operator family
                (SURVEY.md §2); see plans/queries.py.
oracle_sql()  — DuckDB-equivalent ANSI SQL for every SQL-expressible
                entry; spatial/LSH entries are rows-only (exactness for
                those is covered by pytest goldens vs tests/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: which building does each address belong to —
    full merge on the deterministic 1k-page fixture (sf0.001-scale)."""
    from mergeaddressesandbuildings_spark.plans.merge import run_merge
    from mergeaddressesandbuildings_spark.sources import pages as pg

    p = pg.pages_df(spark, 1000)
    e = pg.existing_osm_df(spark, 1000)
    res = run_merge(spark, p, e)
    return res.assignments.select(
        "addr_id", "url", "record_idx", "building_id", "method", "dist_m",
        "decision", "cell",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mergeaddressesandbuildings_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mergeaddressesandbuildings_spark.plans.queries import ORACLE

    return dict(ORACLE)
