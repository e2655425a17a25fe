"""Fuzzy string matching: edit-distance<=1 pair join via SymSpell
deletion neighborhoods — the scalable primitive behind typo-tolerant
address/street matching (the F5/F6 normalization family's fuzzy
sibling) and near-duplicate entity resolution.

Why deletion neighborhoods: a naive edit-distance join is a theta
join (cartesian at scale). SymSpell's observation (Garbe): if
levenshtein(a, b) <= 1 then {a} ∪ del1(a) and {b} ∪ del1(b)
intersect — substitutions share the both-sides deletion, insertions/
deletions share the shorter string itself. So candidate generation
becomes an EQUI-join on a generated variant key, complete by
construction (proven exhaustively against the brute O(n^2) oracle in
tests), with a |s|+1-sized neighborhood per string — linear blowup,
then an exact JVM ``levenshtein`` verify on the candidates only.

Scale shape: explode (bounded by string length) → hash equi-join on
variant → distinct pair → verify. The join key distribution follows
variant-string frequency — hot variants (e.g. very common short
names) are data skew of the same kind the LSH band join handles;
extremely short strings (len <= 1) are the worst case and can be
pre-filtered by callers. All-integer ids + exact integer distance →
driver-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["edit1_pairs"]


def edit1_pairs(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """→ (id_a, id_b, dist INT): all unordered pairs of rows whose
    strings are at edit distance exactly 0 (distinct rows, equal
    strings) or 1. ``id_col`` must be unique per row."""
    base = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(s_col).cast("string").alias("s"))
    # variants = s itself + every single-character deletion
    variants = F.concat(
        F.array(F.col("s")),
        F.transform(
            F.sequence(F.lit(1), F.length("s")),
            lambda i: F.concat(
                F.col("s").substr(F.lit(1), i - 1),
                F.col("s").substr(i + 1, F.length("s")),
            ),
        ),
    )
    ex = base.select("id", "s", F.explode(variants).alias("v"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, "v")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("a.s").alias("sa"),
                F.col("b.id").alias("id_b"), F.col("b.s").alias("sb"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )
