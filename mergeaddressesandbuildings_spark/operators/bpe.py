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

__all__ = ["SEP", "MAX_INLINE_MERGES", "bpe_train", "bpe_encode"]

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


MAX_INLINE_MERGES = 256  # expression-tree depth guard for mode="expr"


def bpe_encode(docs: DataFrame, merges: DataFrame,
               text_col: str = "text",
               word_pattern: str = "^[a-z]+$",
               mode: str = "expr") -> DataFrame:
    """Apply a trained merge list (the ``bpe_train`` artifact) to the
    corpus — the ENCODE half of the tokenizer pipeline. → (doc_id,
    tokens array<string>, n_tokens bigint).

    Words matching ``word_pattern`` are BPE-split; every other
    whitespace token passes through whole (the classic byte-fallback
    stance, minus bytes — the fixture alphabet is single-byte). Merges
    apply in rank order with left-to-right non-overlapping replacement,
    which IS exact greedy BPE: a merge at rank r can only create
    adjacencies involving its new symbol, and every merge consuming
    that symbol has rank > r, so one pass per rank in ascending order
    reproduces the min-rank-first loop (see tests/test_bpe.py's
    encode-vs-brute oracle).

    Two physical modes, same semantics (parity-tested):

    - ``mode="expr"`` — the merge list (a vocab-sized ARTIFACT, never
      data-sized) is collected and unrolled into a chain of JVM
      ``F.replace`` calls inside one whole-stage-codegen projection:
      zero Python in the hot path, and the oracle (DuckDB, identical
      replace semantics) can hash-check it. Capped at
      ``MAX_INLINE_MERGES`` — beyond that the codegen'd expression
      tree stops paying for itself.
    - ``mode="arrow"`` — the 50k-merge production path: a
      ``mapInPandas`` batch UDF holding the rank table as a dict,
      encoding each DISTINCT word in the batch once via the standard
      min-rank merge loop and broadcasting the result through a
      word→tokens cache (the cache trick every production tokenizer
      uses — corpora are Zipfian, so the per-batch distinct-word count
      is tiny relative to rows). Map-side only: no shuffle in either
      mode at any scale.
    """
    rows = [(r["lhs"], r["rhs"]) for r in
            merges.orderBy("rank").select("lhs", "rhs").collect()]
    if mode == "expr":
        if len(rows) > MAX_INLINE_MERGES:
            raise ValueError(
                f"mode='expr' unrolls one replace per merge and is "
                f"capped at {MAX_INLINE_MERGES} (got {len(rows)}); "
                f"use mode='arrow' for production-sized merge lists")

        def encode_word(w):
            s = _wrap_chars(w)
            for a, b in rows:
                s = F.replace(s, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                              F.lit(f"{SEP}{a}{b}{SEP}"))
            return F.filter(F.split(s, SEP), lambda t: t != "")

        ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        toks = F.flatten(F.transform(
            ws,
            lambda w: F.when(w.rlike(word_pattern),
                             encode_word(w)).otherwise(F.array(w)),
        ))
        return docs.select(
            "doc_id", toks.alias("tokens"),
            F.size(toks).cast("long").alias("n_tokens"))
    if mode != "arrow":
        raise ValueError(f"unknown mode {mode!r}")

    import re

    import pandas as pd  # noqa: F401  (mapInPandas contract)

    rank_of = {pair: i for i, pair in enumerate(rows)}
    pat = re.compile(word_pattern)
    out_schema = ("doc_id bigint, tokens array<string>, "
                  "n_tokens bigint")
    id_field = "doc_id"

    def _encode_one(w: str) -> list:
        syms = list(w)
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = rank_of.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            a, b = best
            merged, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        return syms

    def _batches(it):
        cache: dict = {}
        for pdf in it:
            toks_col, n_col = [], []
            for text in pdf[text_col].astype(str):
                toks: list = []
                for w in text.split(" "):
                    if not w:
                        continue
                    if pat.search(w):
                        got = cache.get(w)
                        if got is None:
                            got = _encode_one(w)
                            cache[w] = got
                        toks.extend(got)
                    else:
                        toks.append(w)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pdf[[id_field]].assign(tokens=toks_col,
                                         n_tokens=n_col)

    return docs.select(id_field, text_col).mapInPandas(
        _batches, schema=out_schema)
