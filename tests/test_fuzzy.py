"""edit1_pairs vs a brute O(n^2) python-Levenshtein oracle — in
particular proving the deletion-neighborhood candidate set is
COMPLETE (no pair with distance <= 1 is ever missed)."""

from __future__ import annotations

import random
import string

import pytest

from mergeaddressesandbuildings_spark.operators.fuzzy import edit1_pairs


def lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute(rows):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, sa), (ib, sb) = rows[i], rows[j]
            d = lev(sa, sb)
            if d <= 1:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


def _check(spark, rows):
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {(r["id_a"], r["id_b"], r["dist"])
           for r in edit1_pairs(df, "id", "s").collect()}
    assert got == brute(rows)


def test_random_typos_complete(spark):
    rng = random.Random(59)
    base = ["".join(rng.choices(string.ascii_lowercase, k=rng.randrange(3, 9)))
            for _ in range(40)]
    rows, nid = [], 0
    for s in base:
        for variant in (s,
                        s[1:],                           # delete first
                        s + "x",                         # append
                        "q" + s[1:] if s else "q",       # substitute first
                        s[: len(s) // 2] + "z" + s[len(s) // 2:]):  # insert
            rows.append((nid, variant))
            nid += 1
    _check(spark, rows)


def test_edge_strings(spark):
    rows = [(1, ""), (2, "a"), (3, "b"), (4, "ab"), (5, "ba"),
            (6, "aa"), (7, "a"), (8, "abc")]
    _check(spark, rows)


def test_duplicate_strings_distance_zero(spark):
    rows = [(1, "main st"), (2, "main st"), (3, "maine st")]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {(r["id_a"], r["id_b"], r["dist"])
           for r in edit1_pairs(df, "id", "s").collect()}
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}


def test_no_false_positives_beyond_one(spark):
    rows = [(1, "abcdef"), (2, "abzzef"), (3, "uvwxyz")]
    df = spark.createDataFrame(rows, ["id", "s"])
    assert edit1_pairs(df, "id", "s").count() == 0


def test_parallelism_invariant(spark):
    rng = random.Random(61)
    rows = [(i, "".join(rng.choices("abc", k=rng.randrange(1, 6))))
            for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "s"])
    a = sorted(map(tuple, edit1_pairs(df.coalesce(1), "id", "s").collect()))
    b = sorted(map(tuple, edit1_pairs(df.repartition(8), "id", "s").collect()))
    assert a == b
