"""Build the spark-submit --py-files archive from the current package
tree (BASELINE.json north_rule: `run via spark-submit --py-files`).

    python tools/build_engine_zip.py [out.zip]

Default output: _bench/engine.zip (the path BENCH/BASELINE.md's
protocol command references). Only package sources go in — tests,
fixtures, and scratch stay out so executors ship a minimal archive.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "mergeaddressesandbuildings_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "_bench", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
                n += 1
    print(f"wrote {out} ({n} files)")


if __name__ == "__main__":
    main()
