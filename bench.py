"""Per-round benchmark (driver-run): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the flagship merge pipeline on the
deterministic pages fixture. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
MERGE_PAGES = int(os.environ.get("BENCH_MERGE_PAGES", "20000"))

HEADLINE = [
    "pricing_summary",
    "segment_revenue",
    "top_order_per_customer",
    "latest_event_per_user",
    "sessionize_events",
    "events_tumbling_hour",
    "error_click_pairs",
    "doc_token_counts",
    "doc_exact_dedup",
    "ann_cosine_topk",
    "minhash_lsh_pairs",
    "morton_cells",
    "broadcast_nation_join",
    "street_normalize",
    "top_revenue_orders",
    "knn_topk_suppliers",
    "doc_dup_clusters",
]

# Measured host context for interpreting the numbers (see
# BENCH/BASELINE.md "Why raw E is capped on THIS host"): the sandbox's
# DRAM bandwidth sustains only ~2-6 streaming core-equivalents, cycle
# delivery fluctuates minute-to-minute (up to 11% steal), and local
# mode schedules N JVM threads + N Python workers per Arrow stage.
HOST_CONTEXT = {
    "streaming_core_equivalents": "2-6 (calibrated; benchtools/calibrate_bandwidth.py)",
    "max_4_to_16_speedup": 2.63,
    "note": "interleaved A/B medians required; 2.1x run variance observed",
}


def main() -> None:
    from mergeaddressesandbuildings_spark.plans import queries as Q
    from mergeaddressesandbuildings_spark.plans.merge import run_merge
    from mergeaddressesandbuildings_spark.session import get_spark
    from mergeaddressesandbuildings_spark.sources import pages as pg

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench",
                      shuffle_partitions=max(CPUS * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up the Python UDF workers + JIT before the first
    # timed query (excluded from every timing, including the total)
    def _ident(batches):
        for b in batches:
            yield b
    spark.range(100_000).mapInPandas(_ident, schema="id long") \
        .write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    t_all = time.monotonic()
    for name in HEADLINE:
        t0 = time.monotonic()
        df = Q.QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.monotonic() - t0, 3)

    # flagship merge pipeline end-to-end (generation + extract + join +
    # decisions + tiling), counted into the same budget
    t0 = time.monotonic()
    p = pg.pages_df(spark, MERGE_PAGES)
    e = pg.existing_osm_df(spark, MERGE_PAGES)
    res = run_merge(spark, p, e)
    n_assign = res.assignments.count()
    res.tiles.write.format("noop").mode("overwrite").save()
    merge_s = time.monotonic() - t0
    per_query["merge_pipeline"] = round(merge_s, 3)

    total = time.monotonic() - t_all
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    print(json.dumps({
        "metric": "e2e_bench_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "cpus": CPUS,
        "merge_pages": MERGE_PAGES,
        "merge_assignments": n_assign,
        "merge_pages_per_sec": round(MERGE_PAGES / merge_s, 1),
        "host_context": HOST_CONTEXT,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
