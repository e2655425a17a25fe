"""A1/J5/U1/U2: merge decisions and output sets (SURVEY.md §2.4 A1,
§2.3 J5, §2.9; semantics §8.4).

Per address: PIP winner else kNN winner else STANDALONE. Per building:
- any assigned address whose normalized housenumber differs from the
  building's existing ``addr:housenumber`` tag → the building is a
  CONFLICT for ALL its assigned addresses (building untouched,
  addresses kept as nodes);
- else exactly 1 assigned address → MERGED;
- else (≥2) → KEEP_NODE.

All pure DataFrame ops: one hash aggregate on building_id (map-side
combinable) + broadcast-sized joins back. No Python kernels here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.operators.dedupe import hn_norm_col


def assign(addresses: DataFrame, pip_winners: DataFrame,
           knn_winners: DataFrame, buildings: DataFrame) -> DataFrame:
    """→ assignments(addr_id, url, record_idx, lat, lon, building_id,
    method, dist_m, decision, cell)."""
    matched = pip_winners.unionByName(knn_winners)

    base = addresses.select(
        "addr_id", "url", "record_idx", "lat", "lon", "cell",
        hn_norm_col(F.col("housenumber")).alias("_hn"),
    ).join(matched, "addr_id", "left")

    b_tags = buildings.select(
        "building_id",
        hn_norm_col(F.col("tags")["addr:housenumber"]).alias("_ex_hn"),
    )
    base = base.join(b_tags, "building_id", "left")

    per_bld = (
        base.filter(F.col("building_id").isNotNull())
        .groupBy("building_id")
        .agg(
            F.count("*").alias("_n_addr"),
            F.max(
                (
                    F.col("_ex_hn").isNotNull()
                    & (F.col("_ex_hn") != "")  # empty tag value = no existing address
                    & (F.col("_ex_hn") != F.col("_hn"))
                ).cast("int")
            ).alias("_any_conflict"),
        )
    )
    out = base.join(per_bld, "building_id", "left")

    decision = (
        F.when(F.col("building_id").isNull(), config.DECISION_STANDALONE)
        .when(F.col("_any_conflict") == 1, config.DECISION_CONFLICT)
        .when(F.col("_n_addr") >= 2, config.DECISION_KEEP_NODE)
        .otherwise(config.DECISION_MERGED)
    )
    return out.select(
        "addr_id", "url", "record_idx", "lat", "lon", "building_id",
        F.coalesce(F.col("method"), F.lit(config.METHOD_NONE)).alias("method"),
        "dist_m",
        decision.alias("decision"),
        "cell",
    )


def output_sets(assignments: DataFrame, buildings: DataFrame) -> DataFrame:
    """U1/U2 → (elem_id, set) with set ∈ {merged, untouched, conflict,
    new_node, new_building}.

    - merged: buildings that absorb exactly their one address
    - conflict: buildings flagged by J5
    - untouched: existing buildings in neither of the above
    - new_building: new (extracted) buildings that survive J3 and are
      not merged (they are uploaded as-is)
    - new_node: addresses emitted as standalone nodes (KEEP_NODE,
      CONFLICT, STANDALONE)
    """
    merged_b = (
        assignments.filter(F.col("decision") == config.DECISION_MERGED)
        .select(F.col("building_id").alias("elem_id"))
        .distinct()
        .withColumn("set", F.lit("merged"))
    )
    conflict_b = (
        assignments.filter(F.col("decision") == config.DECISION_CONFLICT)
        .select(F.col("building_id").alias("elem_id"))
        .distinct()
        .withColumn("set", F.lit("conflict"))
    )
    decided = merged_b.select("elem_id").union(conflict_b.select("elem_id"))
    untouched = (
        buildings.filter(F.col("existing"))
        .select(F.col("building_id").alias("elem_id"))
        .join(decided, "elem_id", "left_anti")
        .withColumn("set", F.lit("untouched"))
    )
    new_b = (
        buildings.filter(~F.col("existing"))
        .select(F.col("building_id").alias("elem_id"))
        .join(merged_b.select("elem_id"), "elem_id", "left_anti")
        .join(conflict_b.select("elem_id"), "elem_id", "left_anti")
        .withColumn("set", F.lit("new_building"))
    )
    new_node = (
        assignments.filter(F.col("decision") != config.DECISION_MERGED)
        .select(F.col("addr_id").alias("elem_id"))
        .withColumn("set", F.lit("new_node"))
    )
    return (
        merged_b.unionByName(conflict_b)
        .unionByName(untouched)
        .unionByName(new_b)
        .unionByName(new_node)
    )
