"""jobs/lsh_bench.py plumbing: the scale-probe job must keep running
end-to-end (corpus synthesis → signatures → bucket stats → candidates
→ verify → clusters) and emit a parseable single-line JSON whose
invariants hold — so the round-N scaling protocol never bit-rots
between probe runs."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lsh_bench_smoke_and_invariants():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "lsh_bench.py"),
         "--sf-dir", "/root/testdata/sf0.001", "--mult", "4",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["job"] == "lsh_bench"
    assert d["docs"] == 2000  # 500 sf0.001 docs x mult 4
    # every original seeds an exact-dup pair (reps 0,1) and a near-dup
    # (rep 2): verified pairs and clusters must be non-trivial
    assert d["n_pairs"] >= 500
    assert 0 < d["n_clusters"] <= d["n_clustered_docs"]
    assert d["n_candidates"] >= d["n_pairs"]
    # bucket histogram totals must account for every bucket
    assert sum(d["buckets"]["log2_hist"].values()) == d["buckets"]["n"]
    assert d["buckets"]["max"] >= 2
    assert d["datapath_s"] <= d["wall_s"]
    assert isinstance(d["fingerprint"], int) and d["fingerprint"] != 0
