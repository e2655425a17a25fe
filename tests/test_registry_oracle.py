"""Full-registry oracle parity, asserted by the suite itself
(round-3 verdict task 8): every `queries()` entry is run on Spark at
sf0.01 and compared — rows, schema, canonical value hash — against its
`oracle_sql()` in DuckDB, via the SAME compare code the CLI pre-flight
(tools/driver_sim.py) and the grading driver use. The driver only
executes its 50-slot window per round; this test is what guarantees
the other 58 registry entries stay oracle-green between rotations.

Env knobs (the verdict asked for env-skippability — this is the whole
suite's slowest test, ~8-12 min):
  SKIP_REGISTRY_ORACLE=1   skip entirely
  REGISTRY_ORACLE_LIMIT=N  only check the first N registry entries
  REGISTRY_ORACLE_SF_DIR   parquet dir (default /root/testdata/sf0.01)
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import driver_sim  # noqa: E402

SF_DIR = os.environ.get("REGISTRY_ORACLE_SF_DIR", "/root/testdata/sf0.01")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("SKIP_REGISTRY_ORACLE") == "1",
        reason="SKIP_REGISTRY_ORACLE=1"),
    pytest.mark.skipif(
        not os.path.isdir(SF_DIR),
        reason=f"oracle parquet dir {SF_DIR} absent"),
]


def test_full_registry_oracle_parity(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    limit = int(os.environ.get("REGISTRY_ORACLE_LIMIT", "0")) or len(qs)
    names = list(qs)[:limit]

    con = driver_sim.connect_oracle(SF_DIR)
    lines = []
    reds = driver_sim.run_window(
        spark, con, names, qs, oracles, SF_DIR, report=lines.append)

    no_oracle = [ln.split()[1].rstrip(":") for ln in lines
                 if ln.startswith("---")]
    # the registry contract: every query is oracle-paired (the three
    # documented non-SQL-expressible streaming ops run rows-only in the
    # driver but still have oracle strings here)
    assert not no_oracle, f"queries without oracle SQL: {no_oracle}"
    assert not reds, (
        f"{len(reds)}/{len(names)} registry queries oracle-RED: {reds}\n"
        + "\n".join(ln for ln in lines if ln.startswith("RED")))
