"""salted_equi_join == plain inner join, bit for bit, including on a
deliberately skewed key; salt routing really spreads the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators.skewjoin import (
    salted_equi_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one key — the classic straggler shape
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else (i % 7) + 2, f"p{i}") for i in range(4000)],
        ["row_id", "k", "payload"])
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 10)], ["dk", "attr"])
    return fact, dim


def test_equals_plain_join(spark, skewed):
    fact, dim = skewed
    got = sorted(map(tuple, salted_equi_join(
        fact, dim, "k", "dk", salt_col="row_id", salt_factor=8).collect()))
    want = sorted(map(tuple, fact.join(
        dim, on=fact["k"] == dim["dk"]).drop("dk").collect()))
    assert got == want and len(got) == 4000


def test_salt_spreads_hot_key(spark, skewed):
    fact, _ = skewed
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int"))
    # hot key k==1 (i % 10 != 0): 3600 of 4000 rows
    per_salt = (salted.filter(F.col("k") == 1)
                .groupBy("__salt").count().collect())
    counts = [r["count"] for r in per_salt]
    assert len(counts) == 8                      # every salt bucket hit
    assert max(counts) < 2 * min(counts)         # roughly even spread


def test_parallelism_invariant(spark, skewed):
    fact, dim = skewed
    a = sorted(map(tuple, salted_equi_join(
        fact.coalesce(1), dim, "k", "dk", "row_id", 4).collect()))
    b = sorted(map(tuple, salted_equi_join(
        fact.repartition(16), dim, "k", "dk", "row_id", 4).collect()))
    assert a == b


def test_guards(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_equi_join(fact, dim, "k", "dk", "row_id", 0)
    with pytest.raises(ValueError):
        salted_equi_join(fact, dim, "k", "dk", "nope", 4)
