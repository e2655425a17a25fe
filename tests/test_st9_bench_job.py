"""jobs/st9_bench.py plumbing: the streaming near-dup probe must keep
running end-to-end (corpus synthesis → microbatch files → stateful
stream → pair fingerprint) and emit a parseable single-line JSON with
its invariants intact, so the recorded scaling pairs can be re-run
verbatim every round."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_st9_bench_smoke_and_invariants():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "st9_bench.py"),
         "--sf-dir", "/root/testdata/sf0.001", "--mult", "4",
         "--batches", "2", "--master", "local[2]"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["job"] == "st9_bench"
    assert d["docs"] == 2000  # 500 sf0.001 docs x mult 4
    assert d["batches"] == 2
    # every original seeds an exact-dup pair and a near-dup: the
    # distinct cross/intra-batch pair set must be non-trivial
    assert d["n_pairs"] >= 500
    assert d["n_match_rows"] >= d["n_pairs"]  # n_bands emits per band
    assert isinstance(d["fingerprint"], int) and d["fingerprint"] != 0
    assert d["wall_s"] > 0 and d["docs_per_sec"] > 0
