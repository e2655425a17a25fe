"""Deterministic, parallelism-invariant element ids (SURVEY.md §2.5 W2,
§8.6).

The reference assigns sequential negative ids to new OSM elements — a
single-machine notion that is partition-order-dependent on a cluster, so
the engine uses keyed hashes instead: ids depend only on (url,
record_idx), never on partitioning, task order, or
``monotonically_increasing_id``. Shared by the engine kernels, the
fixture generator, and the pure-Python oracle so all three agree.
"""

from __future__ import annotations

import hashlib


def stable_id64(kind: str, url: str, record_idx: int) -> int:
    """Signed 64-bit id from sha256(kind|url|idx). Collisions asserted
    zero in tests (§8.6)."""
    digest = hashlib.sha256(f"{kind}|{url}|{record_idx}".encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer — the fixture generator's only
    randomness source (FIXTURES.md: seeded by id, never wall-clock)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)
