"""Pre-flight the grading driver's correctness gate locally.

Replays what the driver does per round: take the FIRST ``--limit``
entries of the query registry (its execution window), run each query
on Spark at ``--sf-dir``, run the paired oracle SQL in DuckDB over the
same parquet tables, and compare row count, column names, and a
canonical value hash (columns sorted by name, rows sorted, floats
canonicalized via repr of float32-independent Python floats).

Usage:
    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01]
                               [--limit 50] [--only name1,name2]
Prints one status line per query and a final summary; exit code 1 if
any compared query is red.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return json.dumps({k: _canon_cell(x) for k, x in sorted(v.items())})
    return str(v)


def _value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "\x01".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest()


def connect_oracle(sf_dir: str):
    """A DuckDB connection with the driver's table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def run_window(spark, con, names, qs, oracles, sf_dir, report=print):
    """Replay the driver's per-query compare over ``names``; returns the
    list of red query names. Importable so the pytest suite can assert
    full-registry oracle parity (round-3 verdict task 8) with the same
    code path the CLI pre-flight uses."""
    reds = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001 - report and continue
            report(f"RED  {name}: spark error {type(e).__name__}: {e}")
            reds.append(name)
            continue
        sql = oracles.get(name)
        if not sql:
            report(f"---  {name}: no_oracle ({len(srows)} spark rows)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            report(f"RED  {name}: oracle error {type(e).__name__}: {e}")
            reds.append(name)
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            rows_ok and schema_ok
            and _value_hash(scols, srows) == _value_hash(ocols, orows)
        )
        tag = "ok  " if (rows_ok and schema_ok and hash_ok) else "RED "
        report(f"{tag} {name}: rows={len(srows)}/{len(orows)} "
               f"schema={schema_ok} hash={hash_ok}")
        if tag.startswith("RED"):
            reds.append(name)
    return reds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--only", default="")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(args.master)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        # session.get_spark pins UTC; the CLI pre-flight must match or
        # timestamp-rendering queries (warc_ingest_index's date_format)
        # go red on any non-UTC host while the real driver stays green
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = connect_oracle(args.sf_dir)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)[: args.limit]
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    reds = run_window(spark, con, names, qs, oracles, args.sf_dir)
    print(f"\n{len(names) - len(reds)}/{len(names)} green"
          + (f"; RED: {reds}" if reds else ""))
    spark.stop()
    sys.exit(1 if reds else 0)


if __name__ == "__main__":
    main()
