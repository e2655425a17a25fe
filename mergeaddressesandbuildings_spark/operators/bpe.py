"""Distributed BPE tokenizer-merge training (SURVEY.md §2 webpipe
family: the tokenizer-training step of an LLM data pipeline).

Classic byte-pair encoding (Sennrich et al. 2016): start from
characters, repeatedly count adjacent symbol pairs across the corpus
(weighted by word frequency) and merge the most frequent pair,
left-to-right non-overlapping within each word. The learned artifact
is the ordered merge list — tiny, integer-frequency-exact, and
therefore driver-hashable even though the algorithm is iterative
(same contract as graph.py / clustering.py: every branch-relevant
quantity is an exact integer or a binary-collated string, so the
result is engine/parallelism/retry-invariant).

Scale shape (the 10^12-document path):
- ONE corpus-sized shuffle total: the word-frequency table (explode +
  map-side-combinable hash agg). Everything after runs on the VOCAB,
  which is orders of magnitude smaller than the corpus — the standard
  trick that makes BPE training tractable at all.
- per merge round: one split+explode+hash agg over the vocab, a
  bounded 1-row collect for the winning pair (ORDER BY freq DESC then
  lexicographic (a, b) — TakeOrderedAndProject, no global sort), and
  a narrow map applying the merge. Rounds are localCheckpoint-
  barriered so round r's plan does not replay rounds 0..r-1.
- merge application is pure JVM string replace on a sentinel-wrapped
  symbol string: each symbol rendered as SEP+sym+SEP, so the pair
  (a,b) occurs iff SEP+a+SEP+SEP+b+SEP occurs, and the engine's
  non-overlapping left-to-right replace IS the classic BPE greedy
  merge (consecutive occurrences do not share a boundary character —
  the double-SEP wrapping exists exactly so [b,a,b,a] merges to
  [ba,ba], not [ba,b,a]). DuckDB's replace has identical semantics,
  which is what makes the full iterative training oracle-pairable
  (plans/queries.py bpe_merges unrolls the same rounds in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F

__all__ = ["SEP", "bpe_train"]

SEP = "\x01"  # sentinel: never appears in [a-z]+ words


def _wrap_chars(word) -> F.Column:
    """'abc' -> SEP+a+SEP + SEP+b+SEP + SEP+c+SEP."""
    return F.array_join(
        F.transform(F.split(word, ""),
                    lambda c: F.concat(F.lit(SEP), c, F.lit(SEP))),
        "",
    )


def bpe_train(docs: DataFrame, n_merges: int = 6,
              text_col: str = "text",
              word_pattern: str = "^[a-z]+$") -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus's words matching
    ``word_pattern`` (a safe single-byte alphabet keeps char-split
    semantics identical across engines). → (rank, lhs, rhs, merged,
    freq): rank 1-based merge order, freq the exact pair count that
    won the round. Ties break on lexicographic (lhs, rhs) — binary
    collation in both Spark and DuckDB."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w").rlike(word_pattern))
        .groupBy("w").agg(F.count("*").alias("cnt"))
        .select(_wrap_chars(F.col("w")).alias("s"), "cnt")
        .localCheckpoint(eager=True)  # vocab-sized; cap lineage
    )
    merges = []
    for rank in range(1, n_merges + 1):
        toks = F.filter(F.split("s", SEP), lambda t: t != "")
        pairs = (
            words.select(toks.alias("t"), "cnt")
            .filter(F.size("t") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.struct(
                            F.element_at("t", i).alias("a"),
                            F.element_at("t", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b").agg(F.sum("cnt").alias("freq"))
        )
        top = pairs.orderBy(F.desc("freq"), "a", "b").limit(1).collect()
        if not top:
            break  # no adjacent pairs left anywhere
        a, b, freq = top[0]["a"], top[0]["b"], top[0]["freq"]
        merges.append(Row(rank=rank, lhs=a, rhs=b,
                          merged=a + b, freq=int(freq)))
        words = words.select(
            F.replace(
                "s",
                F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                F.lit(f"{SEP}{a}{b}{SEP}"),
            ).alias("s"),
            "cnt",
        ).localCheckpoint(eager=True)
    schema = ("rank int, lhs string, rhs string, "
              "merged string, freq bigint")
    return spark.createDataFrame(merges, schema=schema)
