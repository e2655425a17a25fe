"""Write the deterministic pages + existing-OSM fixture to parquet once,
so the N vs 4N scaling runs (BASELINE.md protocol) read byte-identical
input instead of re-generating it inside each timed run.

    spark-submit --driver-memory 8g jobs/gen_fixture.py \
        --pages-count 30000 --out /root/repo/_bench/fixture30k
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-count", type=int, default=30_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from mergeaddressesandbuildings_spark.session import get_spark
    from mergeaddressesandbuildings_spark.sources import pages as pg

    spark = get_spark(app_name="gen-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    pg.pages_df(spark, args.pages_count, partitions=args.partitions) \
        .write.mode("overwrite").parquet(os.path.join(args.out, "pages"))
    pg.existing_osm_df(spark, args.pages_count, partitions=args.partitions) \
        .write.mode("overwrite").parquet(os.path.join(args.out, "existing"))
    print(json.dumps({
        "job": "gen_fixture",
        "pages_count": args.pages_count,
        "out": args.out,
        "wall_s": round(time.monotonic() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
