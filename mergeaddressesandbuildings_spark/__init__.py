"""PySpark-native address↔building merge engine (see README.md).

Public surface for the common paths — a reference-tool user switches
with:

    from mergeaddressesandbuildings_spark import run_merge, get_spark
    from mergeaddressesandbuildings_spark.sources import osm_xml, osm_pbf

    spark = get_spark(master="local[8]")
    existing = osm_xml.to_existing_table(
        osm_pbf.read_nodes(spark, "county.osm.pbf"),
        osm_pbf.read_ways(spark, "county.osm.pbf"),
        osm_pbf.read_relations(spark, "county.osm.pbf"),
    )
    res = run_merge(spark, pages, existing)

Submodules stay import-light: nothing here pulls in pyspark at package
import time beyond what the caller already uses.
"""

from __future__ import annotations

from mergeaddressesandbuildings_spark.plans.merge import MergeResult, run_merge
from mergeaddressesandbuildings_spark.session import get_spark

__all__ = ["MergeResult", "run_merge", "get_spark"]
