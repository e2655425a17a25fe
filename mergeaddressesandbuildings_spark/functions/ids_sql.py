"""JVM-side stable ids (SURVEY.md §2.5 W2, §8.6) — bit-exact column
expression twin of :func:`functions.ids.stable_id64`.

``stable_id64`` is sha256-based, so the JVM variant reuses Spark's
builtin ``sha2`` and converts the first 8 digest bytes to a SIGNED
64-bit value with exact decimal arithmetic (``conv`` yields the
unsigned value as a decimal string; values ≥ 2^63 wrap by subtracting
2^64). Parity with the Python implementation is asserted in
tests/test_ids_sql.py — the extraction path (operators/extract.py)
depends on it for parallelism-invariant ids with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_HALF = "CAST('9223372036854775808' AS DECIMAL(20,0))"  # 2^63
_FULL = "CAST('18446744073709551616' AS DECIMAL(21,0))"  # 2^64


def stable_id64_expr(kind: Column | str, url: Column, record_idx: Column) -> Column:
    """Signed 64-bit id from sha256(kind|url|idx) — identical to
    ids.stable_id64(kind, url, idx) bit for bit."""
    k = F.lit(kind) if isinstance(kind, str) else kind
    s = F.concat(k, F.lit("|"), url, F.lit("|"), record_idx.cast("string"))
    dec = (
        F.conv(F.substring(F.sha2(s.cast("binary"), 256), 1, 16), 16, 10)
        .cast("decimal(20,0)")
    )
    return (
        F.when(dec >= F.expr(_HALF), dec - F.expr(_FULL))
        .otherwise(dec)
        .cast("long")
    )


def sha256_hash60_expr(s: Column, prefix: str | None = None) -> Column:
    """Unsigned 60-bit hash: first 15 hex chars of sha256(prefix||s).

    Chosen because BOTH Spark (``conv(hex,16,10)``) and DuckDB
    (``('0x'||hex)::BIGINT``) can parse it exactly, making hash-keyed
    operators (SimHash, MinHash signatures) oracle-pairable — see
    operators/doc_dedupe.py. 60 bits keeps the value positive in a
    signed BIGINT in every engine.
    """
    v = F.concat(F.lit(prefix), s) if prefix else s
    return F.conv(
        F.substring(F.sha2(v.cast("binary"), 256), 1, 15), 16, 10
    ).cast("long")
