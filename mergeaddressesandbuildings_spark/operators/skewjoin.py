"""Salted equi-join for skewed fact keys (SURVEY.md §2.5 W3's generic
sibling — the spatial join salts hot CELLS in
operators/spatial_join.py:174; this is the same defence for any
fact⋈dim equi-join).

The problem at 10^12 fact rows: a shuffled hash/sort-merge join
routes every fact row with the same key to ONE reducer, so a hot key
(the null-ish user, the default URL, the megacity cell) turns into a
straggler task that dominates the stage. AQE's skew-join splitting
handles sort-merge cases after the fact; salting fixes the routing
itself and also covers shuffled-hash joins and aggregations stacked
on the join key.

Mechanism — exact, not approximate:
- fact side: add ``salt = pmod(xxhash64(salt_col), R)`` — a
  deterministic function of a row-level column, so routing is stable
  across retries (no ``rand()``: a retried task must re-emit the
  same salt or shuffle-file reuse breaks);
- dim side: replicate each row R ways with one explode (dim grows
  R×, which is why this targets the MEDIUM dim: too big to
  broadcast, far smaller than the fact; for a truly small dim,
  ``F.broadcast`` is strictly better — see plans/merge.py:139);
- join on ``(key, salt)``: every output row appears exactly once,
  bit-identical to the unsalted join (asserted in
  tests/test_skewjoin.py and by the DuckDB oracle of
  ``salted_order_join``, which is a plain join — the salt is
  invisible in the result, visible in the shuffle layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_equi_join"]


def salted_equi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                     dim_key: str, salt_col: str,
                     salt_factor: int = 8) -> DataFrame:
    """Inner equi-join ``fact ⋈ dim`` on ``fact_key = dim_key`` with
    the fact side's hot keys spread over ``salt_factor`` reducers.
    Result is exactly the plain inner join; column order is fact
    columns then dim columns (minus the duplicate dim key)."""
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    if salt_col not in fact.columns:
        raise ValueError(f"salt_col {salt_col!r} not in fact columns")
    f_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_factor)).cast("int"))
    d_rep = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"),
                             F.lit(salt_factor - 1).cast("int"))))
    joined = f_salted.join(
        d_rep,
        on=[f_salted[fact_key] == d_rep[dim_key],
            f_salted["__salt"] == d_rep["__salt"]],
        how="inner",
    )
    keep = [f_salted[c] for c in fact.columns] + [
        d_rep[c] for c in dim.columns if c != dim_key]
    return joined.select(*keep)
